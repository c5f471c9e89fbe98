"""Polygonize: distributed CC vs brute-force BFS oracle."""

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines.polygonize import polygonize
from lib_gdal_ray.pipelines.rasterize import pack_pixel


def brute_regions(gpx, gpy, val, connectivity=4):
    """Pure-python BFS CC; -> sorted list of
    (value, n_pixels, xmin, ymin, xmax, ymax)."""
    nbrs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    if connectivity == 8:
        nbrs += ((1, 1), (1, -1), (-1, 1), (-1, -1))
    cells = {(int(x), int(y)): v for x, y, v in zip(gpx, gpy, val)}
    seen = set()
    out = []
    for start in cells:
        if start in seen:
            continue
        v = cells[start]
        q = deque([start])
        seen.add(start)
        comp = []
        while q:
            x, y = q.popleft()
            comp.append((x, y))
            for dx, dy in nbrs:
                nb = (x + dx, y + dy)
                if nb not in seen and cells.get(nb) == v:
                    seen.add(nb)
                    q.append(nb)
        xs = [c[0] for c in comp]
        ys = [c[1] for c in comp]
        out.append((float(v), len(comp), min(xs), min(ys), max(xs), max(ys)))
    return sorted(out)


def make_pixels(seed, n=600, extent=60, z=2, tile_size=16, n_vals=2):
    rng = np.random.default_rng(seed)
    pts = set()
    while len(pts) < n:
        pts.add((int(rng.integers(0, extent)), int(rng.integers(0, extent))))
    gpx = np.asarray([p[0] for p in pts], dtype=np.int64)
    gpy = np.asarray([p[1] for p in pts], dtype=np.int64)
    val = rng.integers(1, n_vals + 1, len(pts)).astype(np.float64)
    pix = pack_pixel(z, gpx, gpy)
    t = pa.table({"pix_id": pa.array(pix), "burn": pa.array(val)})
    return t, gpx, gpy, val


@pytest.mark.parametrize("seed", [1, 7, 13])
def test_vs_bfs(seed):
    t, gpx, gpy, val = make_pixels(seed)
    ds = ray.data.from_arrow(t).repartition(4)
    out = polygonize(ds, tile_size=16).to_pandas()
    got = sorted(
        (float(r["value"]), int(r["n_pixels"]), int(r["gpx_min"]), int(r["gpy_min"]),
         int(r["gpx_max"]), int(r["gpy_max"]))
        for _, r in out.iterrows()
    )
    assert got == brute_regions(gpx, gpy, val)


def test_single_region_spanning_tiles():
    # a horizontal line crossing 3 tiles must be ONE region
    gpx = np.arange(0, 48, dtype=np.int64)
    gpy = np.full(48, 10, dtype=np.int64)
    val = np.ones(48)
    t = pa.table({"pix_id": pa.array(pack_pixel(2, gpx, gpy)), "burn": pa.array(val)})
    out = polygonize(ray.data.from_arrow(t).repartition(3), tile_size=16).to_pandas()
    assert len(out) == 1
    assert out["n_pixels"].iloc[0] == 48
    assert out["gpx_max"].iloc[0] == 47


def test_values_split_regions():
    # same shape, alternating values -> every pixel its own region
    gpx = np.arange(0, 20, dtype=np.int64)
    gpy = np.zeros(20, dtype=np.int64)
    val = (np.arange(20) % 2).astype(np.float64) + 1
    t = pa.table({"pix_id": pa.array(pack_pixel(2, gpx, gpy)), "burn": pa.array(val)})
    out = polygonize(ray.data.from_arrow(t), tile_size=16).to_pandas()
    assert len(out) == 20


@pytest.mark.parametrize("seed", [2, 9])
def test_8connected_vs_bfs(seed):
    t, gpx, gpy, val = make_pixels(seed, n=700)
    ds = ray.data.from_arrow(t).repartition(4)
    out = polygonize(ds, connectivity=8, tile_size=16).to_pandas()
    got = sorted(
        (float(r["value"]), int(r["n_pixels"]), int(r["gpx_min"]), int(r["gpy_min"]),
         int(r["gpx_max"]), int(r["gpy_max"]))
        for _, r in out.iterrows()
    )
    assert got == brute_regions(gpx, gpy, val, connectivity=8)


def test_8connected_diagonal_across_tiles():
    # a diagonal staircase crossing tile corners is ONE region under
    # 8-connectivity, n distinct regions under 4
    gpx = np.arange(0, 40, dtype=np.int64)
    gpy = np.arange(0, 40, dtype=np.int64)
    val = np.ones(40)
    t = pa.table({"pix_id": pa.array(pack_pixel(2, gpx, gpy)), "burn": pa.array(val)})
    out8 = polygonize(ray.data.from_arrow(t).repartition(3), connectivity=8,
                      tile_size=16).to_pandas()
    assert len(out8) == 1 and out8["n_pixels"].iloc[0] == 40
    out4 = polygonize(ray.data.from_arrow(t).repartition(3), connectivity=4,
                      tile_size=16).to_pandas()
    assert len(out4) == 40


def test_bad_connectivity():
    t, *_ = make_pixels(3, n=10)
    with pytest.raises(ValueError):
        polygonize(ray.data.from_arrow(t), connectivity=6)


def test_labelprop_equals_task_uf():
    """Distributed min-label-propagation CC produces the same components
    as the task union-find on a multi-tile snake + separate blob."""
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.pipelines.polygonize import label_connected_components
    from lib_gdal_ray.pipelines.rasterize import pack_pixel

    pts = [(x, 7) for x in range(3, 20)]
    pts += [(19, y) for y in range(7, 18)]
    pts += [(x, y) for x in range(30, 34) for y in range(30, 33)]
    gx = np.array([p[0] for p in pts])
    gy = np.array([p[1] for p in pts])
    ds = ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pack_pixel(6, gx, gy)),
        "burn": pa.array(np.ones(len(gx)))}))

    def comps(df):
        return set(df.groupby("region_id").apply(
            lambda s: frozenset(zip(s.gpx, s.gpy)), include_groups=False))

    a = label_connected_components(ds, 4, tile_size=8, cc_mode="task").to_pandas()
    b = label_connected_components(ds, 4, tile_size=8, cc_mode="labelprop").to_pandas()
    assert comps(a) == comps(b)
    assert len(comps(a)) == 2


class TestGdalPolygonizeCli:
    def test_regions_with_hole(self, tmp_path):
        import json as _json
        import os
        import subprocess
        import sys as _sys

        import numpy as np

        from lib_gdal_ray.codecs.tiff import encode_geotiff

        arr = np.zeros((20, 20), dtype=np.uint8)
        arr[2:6, 2:6] = 7
        arr[10:18, 10:18] = 3
        arr[13:15, 13:15] = 0  # hole
        src = str(tmp_path / "c.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(100.0, 0.5, 0.0, 60.0,
                                                   0.0, -0.5), epsg=4326))
        dst = str(tmp_path / "c.geojsonl")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdal_polygonize.py")
        out = subprocess.run(
            [_sys.executable, cli, src, dst, "--skip-zero",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        lines = []
        if os.path.isdir(dst):
            for f in os.listdir(dst):
                lines += open(os.path.join(dst, f)).read().splitlines()
        else:
            lines = open(dst).read().splitlines()
        feats = [_json.loads(ln) for ln in lines if ln.strip()]
        by_val = {ft["properties"]["value"]: ft for ft in feats}
        assert set(by_val) == {7.0, 3.0}
        assert by_val[7.0]["properties"]["n_pixels"] == 16
        assert by_val[3.0]["properties"]["n_pixels"] == 60
        assert len(by_val[3.0]["geometry"]["coordinates"]) == 2  # hole
        # georeferenced corner: pixel (2,2) -> (101.0, 59.0)
        ring7 = by_val[7.0]["geometry"]["coordinates"][0]
        xs = [p[0] for p in ring7]
        ys = [p[1] for p in ring7]
        assert min(xs) == 101.0 and max(xs) == 103.0
        assert max(ys) == 59.0 and min(ys) == 57.0
