import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.geom.delaunay import _incircle, delaunay


def _hull_area(px, py):
    pts = sorted(zip(px, py))

    def half(p):
        h = []
        for q in p:
            while len(h) >= 2 and ((h[-1][0] - h[-2][0]) * (q[1] - h[-2][1])
                                   - (h[-1][1] - h[-2][1]) * (q[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(q)
        return h

    hull = half(pts)[:-1] + half(pts[::-1])[:-1]
    return abs(sum(hull[i][0] * hull[(i + 1) % len(hull)][1]
                   - hull[(i + 1) % len(hull)][0] * hull[i][1]
                   for i in range(len(hull)))) / 2


def test_empty_circumcircle_and_coverage():
    rng = np.random.default_rng(11)
    px, py = rng.uniform(0, 50, 120), rng.uniform(0, 50, 120)
    tri = delaunay(px, py)
    assert len(tri) > 0
    tot = 0.0
    for a, b, c in tri:
        ax, ay, bx, by, cx, cy = px[a], py[a], px[b], py[b], px[c], py[c]
        if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) < 0:
            bx, by, cx, cy = cx, cy, bx, by
        v = _incircle(ax, ay, bx, by, cx, cy, px, py)
        inside = v > 1e-6 * np.abs(v).max()
        inside[[a, b, c]] = False
        assert not inside.any(), f"non-Delaunay face {(a, b, c)}"
        tot += abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2
    np.testing.assert_allclose(tot, _hull_area(px, py), rtol=1e-9)
    # deterministic
    assert np.array_equal(tri, delaunay(px, py))


def test_grid_linear_reproduces_linear_field():
    """Barycentric interpolation over ANY triangulation reproduces an
    affine field exactly (within fp) — strong end-to-end pin."""
    from lib_gdal_ray.pipelines.gridding import grid_linear

    rng = np.random.default_rng(12)
    sx, sy = rng.uniform(0, 40, 60), rng.uniform(0, 40, 60)
    sv = 3.0 * sx - 2.0 * sy + 7.0
    qx, qy = rng.uniform(2, 38, 500), rng.uniform(2, 38, 500)
    q = ray.data.from_arrow(pa.table({"x": pa.array(qx), "y": pa.array(qy)}))
    out = grid_linear(q, sx, sy, sv, cell=8.0).to_pandas()
    assert len(out) > 400  # nearly all inside hull
    want = 3.0 * out["x"].to_numpy() - 2.0 * out["y"].to_numpy() + 7.0
    np.testing.assert_allclose(out["v"].to_numpy(), want, rtol=1e-9, atol=1e-7)


def test_grid_linear_drops_outside_hull():
    from lib_gdal_ray.pipelines.gridding import grid_linear

    sx = np.array([0.0, 10.0, 0.0])
    sy = np.array([0.0, 0.0, 10.0])
    sv = np.array([1.0, 2.0, 3.0])
    q = ray.data.from_arrow(pa.table({
        "x": pa.array([1.0, 50.0]), "y": pa.array([1.0, 50.0])}))
    out = grid_linear(q, sx, sy, sv, cell=8.0).to_pandas()
    assert len(out) == 1 and out["x"].iloc[0] == 1.0
