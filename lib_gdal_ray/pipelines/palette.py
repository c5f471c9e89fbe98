"""Color quantization: median-cut palette + Floyd–Steinberg dither.

Reference: `alg/gdalmediancut.cpp` (24-bit → palette via median cut
over the global color histogram) and `alg/gdaldither.cpp`
(Floyd–Steinberg error diffusion; GDAL diffuses per scanline and
accepts strip seams under parallelism — we diffuse per tile, same
trade, documented).

Distributed shape: (1) global color histogram = one vectorized
`groupby(packed rgb)` count; (2) median cut runs driver-side over the
UNIQUE colors (≪ pixels — the classic two-phase); (3) palette is
broadcast and applied per batch (vectorized nearest-index); optional
per-tile dither densifies one tile in a `map_groups`.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pack_rgb(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (r.astype(np.uint32) << 16) | (g.astype(np.uint32) << 8) | b.astype(np.uint32)


def unpack_rgb(c: np.ndarray):
    c = c.astype(np.uint32)
    return (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF


def color_histogram(rgb: ray.data.Dataset) -> pd.DataFrame:
    """Dataset with r/g/b uint8 columns → unique-color counts (driver
    table; unique colors ≤ 2^24)."""

    def partial(batch: pa.Table) -> pa.Table:
        c = pack_rgb(batch["r"].to_numpy(zero_copy_only=False),
                     batch["g"].to_numpy(zero_copy_only=False),
                     batch["b"].to_numpy(zero_copy_only=False))
        t = pa.table({"c": pa.array(c), "n": pa.array(np.ones(len(c), dtype=np.int64))})
        out = t.group_by(["c"]).aggregate([("n", "sum")])
        return out.rename_columns(["c", "n"])

    from ray.data.aggregate import Sum

    return (rgb.map_batches(partial, batch_format="pyarrow")
            .groupby("c").aggregate(Sum("n", alias_name="n")).to_pandas())


def median_cut(hist: pd.DataFrame, n_colors: int) -> np.ndarray:
    """Unique-color histogram → (n_colors, 3) palette (count-weighted
    means of median-cut boxes; split widest channel at the weighted
    median — gdalmediancut.cpp semantics)."""
    r, g, b = unpack_rgb(hist["c"].to_numpy())
    w = hist["n"].to_numpy(dtype=np.float64)
    cols = np.stack([r, g, b], axis=1).astype(np.float64)
    boxes = [np.arange(len(cols))]
    while len(boxes) < n_colors:
        # split the box with the largest (weighted) extent
        best, best_ext, best_ch = None, -1, 0
        for bi, idx in enumerate(boxes):
            if len(idx) < 2:
                continue
            ext = cols[idx].max(axis=0) - cols[idx].min(axis=0)
            ch = int(np.argmax(ext))
            if ext[ch] > best_ext:
                best, best_ext, best_ch = bi, ext[ch], ch
        if best is None:
            break
        idx = boxes.pop(best)
        order = idx[np.argsort(cols[idx, best_ch], kind="stable")]
        cum = np.cumsum(w[order])
        split = int(np.searchsorted(cum, cum[-1] / 2.0)) + 1
        split = min(max(split, 1), len(order) - 1)
        boxes.append(order[:split])
        boxes.append(order[split:])
    pal = np.asarray([
        np.average(cols[idx], axis=0, weights=w[idx]) for idx in boxes])
    return np.round(pal).astype(np.uint8)


class _ApplyPalette:
    def __init__(self, wrapped):
        self.pal = ray.get(wrapped["ref"]).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rgb = np.stack([batch[c].to_numpy(zero_copy_only=False) for c in "rgb"],
                       axis=1).astype(np.float64)
        d2 = ((rgb[:, None, :] - self.pal[None, :, :]) ** 2).sum(axis=2)
        idx = np.argmin(d2, axis=1).astype(np.int32)
        return batch.append_column("palette_idx", pa.array(idx))


def quantize(rgb: ray.data.Dataset, n_colors: int = 16,
             concurrency: Tuple[int, int] = (1, 8)):
    """-> (dataset with palette_idx column, palette (n,3) uint8)."""
    hist = color_histogram(rgb)
    pal = median_cut(hist, n_colors)
    ref = ray.put(pal)
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _ApplyPalette({"ref": ref}))
        return j(batch)

    out = rgb.map_batches(stage, batch_format="pyarrow")
    return out, pal


def dither_tile(rgb_tile: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd–Steinberg error diffusion of one dense (H, W, 3) tile →
    (H, W) palette indices (sequential within the tile — gdaldither.cpp
    row scan; per-tile seams accepted as GDAL accepts per-strip)."""
    h, w, _ = rgb_tile.shape
    work = rgb_tile.astype(np.float64).copy()
    pal = palette.astype(np.float64)
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            px = work[y, x]
            i = int(np.argmin(((pal - px) ** 2).sum(axis=1)))
            out[y, x] = i
            err = px - pal[i]
            if x + 1 < w:
                work[y, x + 1] += err * (7 / 16)
            if y + 1 < h:
                if x > 0:
                    work[y + 1, x - 1] += err * (3 / 16)
                work[y + 1, x] += err * (5 / 16)
                if x + 1 < w:
                    work[y + 1, x + 1] += err * (1 / 16)
    return out
