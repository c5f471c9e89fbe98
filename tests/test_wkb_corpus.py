"""WKB/WKT codec parity against the reference's own wkb_wkt corpus
(autotest/ogr/data/wkb_wkt — the exact pairs ogr_wkbwkt_geom.py
feeds through OGR's importFromWkb/exportToWkt)."""

import os

import numpy as np
import pytest

from lib_gdal_ray.geom import wkb as wkb_mod
from lib_gdal_ray.geom.wkt import wkb_to_wkt, wkt_to_wkb

D = "/root/reference/autotest/ogr/data/wkb_wkt"

_CASES = sorted(n[:-4] for n in os.listdir(D) if n.endswith(".wkb"))
_GOOD = [c for c in _CASES if "broken" not in c]
_BROKEN = [c for c in _CASES if "broken" in c]


def _coord_set(buf: bytes) -> np.ndarray:
    kind, payload = wkb_mod.parse_wkb(buf)
    pts = wkb_mod._all_coords(kind, payload)
    return kind, np.sort(np.asarray(pts, dtype=np.float64), axis=0)


@pytest.mark.parametrize("case", _GOOD)
def test_wkb_vs_wkt_pair(case):
    """The .wkb (big-endian!) and .wkt files describe the same
    geometry — parsed through our two codecs they must agree."""
    with open(f"{D}/{case}.wkb", "rb") as f:
        wkb_buf = f.read()
    with open(f"{D}/{case}.wkt") as f:
        wkt_txt = f.read().strip()
    k1, c1 = _coord_set(wkb_buf)
    k2, c2 = _coord_set(wkt_to_wkb(wkt_txt))
    assert k1 == k2
    np.testing.assert_allclose(c1, c2, rtol=1e-13, atol=1e-13)

    # our wkt render of the wkb re-parses to the same geometry
    k3, c3 = _coord_set(wkt_to_wkb(wkb_to_wkt(wkb_buf)))
    assert k3 == k1
    np.testing.assert_allclose(c3, c1, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("case", _BROKEN)
def test_broken_wkb_rejected(case):
    """The corpus's intentionally-corrupt blobs must raise, not
    crash or return garbage silently."""
    with open(f"{D}/{case}.wkb", "rb") as f:
        buf = f.read()
    with pytest.raises(Exception):
        kind, payload = wkb_mod.parse_wkb(buf)
        # a parse that "succeeds" must at least expose coords
        wkb_mod._all_coords(kind, payload)
