"""Coordinate reprojection stage — stateless ``map_batches``.

Semantics of ``ogr2ogr -t_srs`` / ``OGRCoordinateTransformation``
(`ogr/ogrct.cpp:2263,2332` array transform; per-thread cached
transformers `ogr/ogr_proj_p.cpp` → here a module-level Transformer
registry, built once per worker process). Operates on lon/lat columns
or directly on point-WKB columns (the reference's in-place WKB
transform idea, `ogr/ogr_wkb.h:88`).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data

from ..geom import proj, wkb


def reproject(ds: ray.data.Dataset, src_epsg: int = None, dst_epsg: int = None,
              x_col: str = "lon", y_col: str = "lat",
              out_x: str = "x", out_y: str = "y",
              wkb_in: Optional[str] = None, wkb_out: Optional[str] = None,
              round_to: Optional[int] = None,
              transformer=None) -> ray.data.Dataset:
    """Add transformed coordinate columns (and optionally re-encoded WKB).

    transformer: any object with ``.transform(x, y)`` — an EPSG pair via
    `proj.Transformer.get`, or a GCP polynomial / TPS / RPC transformer
    (`geom/gcp.py`, the gdaltransformer chain analog). Fitted
    transformers are broadcast to workers via closure capture (fit once,
    evaluate per batch).

    round_to: optional decimal rounding applied to the output columns —
    used when results must hash-match a SQL oracle computed with a
    different libm (see BASELINE.md parity notes).
    """

    def tx(batch: pa.Table) -> pa.Table:
        t = (transformer if transformer is not None
             else proj.Transformer.get(src_epsg, dst_epsg))
        if wkb_in is not None:
            x, y = wkb.wkb_to_points(batch[wkb_in].to_numpy(zero_copy_only=False))
        else:
            x = batch[x_col].to_numpy(zero_copy_only=False)
            y = batch[y_col].to_numpy(zero_copy_only=False)
        nx, ny = t.transform(x, y)
        if round_to is not None:
            nx = nx.round(round_to)
            ny = ny.round(round_to)
        batch = batch.append_column(out_x, pa.array(nx))
        batch = batch.append_column(out_y, pa.array(ny))
        if wkb_out is not None:
            batch = batch.append_column(wkb_out, pa.array(wkb.points_to_wkb(nx, ny)))
        return batch

    return ds.map_batches(tx, batch_format="pyarrow")
