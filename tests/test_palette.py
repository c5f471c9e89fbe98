import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.palette import (dither_tile, median_cut, quantize)


def rgb_ds(colors, counts):
    r = np.concatenate([np.full(n, c[0], dtype=np.uint8) for c, n in zip(colors, counts)])
    g = np.concatenate([np.full(n, c[1], dtype=np.uint8) for c, n in zip(colors, counts)])
    b = np.concatenate([np.full(n, c[2], dtype=np.uint8) for c, n in zip(colors, counts)])
    return ray.data.from_arrow(pa.table({"r": pa.array(r), "g": pa.array(g),
                                         "b": pa.array(b)})).repartition(4)


def test_distinct_colors_preserved():
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    ds = rgb_ds(colors, [100, 100, 100, 100])
    out, pal = quantize(ds, n_colors=4)
    assert len(pal) == 4
    got = set(map(tuple, pal.tolist()))
    assert got == set(colors)  # exact: each box holds one color
    df = out.to_pandas()
    # mapping is consistent: same rgb -> same palette index, and the
    # palette entry equals the color
    for _, row in df.head(50).iterrows():
        assert tuple(pal[row["palette_idx"]]) == (row["r"], row["g"], row["b"])


def test_reduction_weighted():
    # two clusters: dark reds and bright blues; 2-color palette lands
    # near the weighted means
    rng = np.random.default_rng(3)
    reds = [(200 + int(v), 0, 0) for v in rng.integers(0, 40, 50)]
    blues = [(0, 0, 150 + int(v)) for v in rng.integers(0, 40, 50)]
    ds = rgb_ds(reds + blues, [10] * 100)
    out, pal = quantize(ds, n_colors=2)
    pr = sorted(map(tuple, pal.tolist()))
    assert pr[0][2] > 140 and pr[0][0] == 0   # blue-ish entry
    assert pr[1][0] > 190 and pr[1][2] == 0   # red-ish entry


def test_dither_mean_preserved():
    # dithering a constant 50%-gray with a black/white palette yields
    # ~half black, half white
    tile = np.full((16, 16, 3), 128, dtype=np.uint8)
    pal = np.asarray([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = dither_tile(tile, pal)
    frac_white = (idx == 1).mean()
    assert 0.4 < frac_white < 0.6
