"""JPEG 2000 Ray source — tile-parallel decode.

The codec (`codecs/jp2k.py`) is the registry-contract whole-file
decoder; this module is the SCALE path: the driver scans the
codestream's SOT spans once (metadata only, no tile decode), then one
Ray task per tile rebuilds a minimal codestream (main header + its own
tile-parts) and decodes just its tile — memory per task is bounded by
the tile, and a satellite granule with a tile grid decodes across the
cluster. Single-tile files degrade to one task (parallelize per file
at the archive level instead)."""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import pyarrow as pa
import ray.data


def _codestream_span(buf: bytes):
    from ..codecs.jp2k import _iter_boxes

    if buf[:2] == b"\xff\x4f":
        return 0, len(buf)
    for typ, a, e in _iter_boxes(buf, 0, len(buf)):
        if typ == b"jp2c":
            return a, e
    raise ValueError("no codestream in JP2")


def read_jp2_pixels(path: str, band: int = 1, drop_zero: bool = False,
                    reduce: int = 0) -> ray.data.Dataset:
    """.jp2/.j2k -> Dataset of pixel rows (y, x, value), one decode
    task per TILE."""
    from ..codecs.jp2k import parse_j2k_structure

    with open(path, "rb") as f:
        buf = f.read()
    a, e = _codestream_span(buf)
    mh, spans = parse_j2k_structure(buf[a:e])
    items = [{"t": t} for t in sorted(spans)]
    cs_off = a

    def decode(batch: pa.Table) -> pa.Table:
        from ..codecs.jp2k import decode_j2k_tile

        with open(path, "rb") as f:
            raw = f.read()
        cs = raw[cs_off:e]
        ys, xs, vs = [], [], []
        for t in batch["t"].to_pylist():
            tb = b"".join(cs[s0:s1] for s0, s1 in spans[t])
            tiles, _siz = decode_j2k_tile(mh, tb, int(t), reduce)
            arr, x0, y0 = tiles[band - 1]
            if drop_zero:
                yy, xx = np.nonzero(arr)
                vals = arr[yy, xx]
            else:
                yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                yy, xx = yy.ravel(), xx.ravel()
                vals = arr.ravel()
            ys.append((yy + y0).astype(np.int32))
            xs.append((xx + x0).astype(np.int32))
            vs.append(vals.astype(np.float64))
        cat = np.concatenate
        return pa.table({"y": pa.array(cat(ys) if ys else
                                       np.empty(0, np.int32)),
                         "x": pa.array(cat(xs) if xs else
                                       np.empty(0, np.int32)),
                         "value": pa.array(cat(vs) if vs else
                                           np.empty(0, np.float64))})

    return ray.data.from_items(
        items, override_num_blocks=min(64, max(1, len(items)))
    ).map_batches(decode, batch_format="pyarrow", batch_size=1)
