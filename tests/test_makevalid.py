"""MakeValid (planar-arrangement even-odd repair) tests."""

import numpy as np

from lib_gdal_ray.geom import wkb as wkb_mod
from lib_gdal_ray.geom.makevalid import make_valid_wkb
from lib_gdal_ray.geom.triangulate import _signed_area


def poly_area(polys):
    a = 0.0
    for rings in polys:
        a += abs(_signed_area(rings[0]))
        for h in rings[1:]:
            a -= abs(_signed_area(h))
    return a


def test_bowtie_splits_into_two_triangles():
    # figure-eight: (0,0)-(4,4)-(4,0)-(0,4) crosses itself at (2,2)
    ring = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], dtype=np.float64)
    out = make_valid_wkb(wkb_mod.polygon_to_wkb([ring]))
    k, polys = wkb_mod.parse_wkb(out)
    assert k == "multipolygon"
    assert len(polys) == 2
    # each lobe is a triangle of area 4 (base 4, height 2)
    np.testing.assert_allclose(poly_area(polys), 8.0, rtol=1e-6)


def test_valid_polygon_roundtrips():
    ring = np.array([[0, 0], [10, 0], [10, 6], [0, 6], [0, 0]], dtype=np.float64)
    out = make_valid_wkb(wkb_mod.polygon_to_wkb([ring]))
    _k, polys = wkb_mod.parse_wkb(out)
    assert len(polys) == 1
    np.testing.assert_allclose(poly_area(polys), 60.0, rtol=1e-9)


def test_self_overlap_even_odd_hole():
    # outer square with a spike folding back over itself creating an
    # even-odd hole: ring covering [0,6]^2 plus an inner loop traversed
    # so the middle is covered twice -> even parity -> excluded
    ring = np.array([
        [0, 0], [6, 0], [6, 6], [0, 6], [0, 0],
    ], dtype=np.float64)
    inner = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=np.float64)
    out = make_valid_wkb(wkb_mod.polygon_to_wkb([ring, inner]))
    _k, polys = wkb_mod.parse_wkb(out)
    # even-odd: the inner square is a hole
    np.testing.assert_allclose(poly_area(polys), 36.0 - 4.0, rtol=1e-6)


def test_overlapping_multipolygon_members_xor():
    # two overlapping squares as one (invalid) multipolygon: even-odd
    # removes the double-covered intersection
    a = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)]
    b = [np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], dtype=np.float64)]
    out = make_valid_wkb(wkb_mod.multipolygon_to_wkb([a, b]))
    _k, polys = wkb_mod.parse_wkb(out)
    np.testing.assert_allclose(poly_area(polys), 16 + 16 - 2 * 4, rtol=1e-6)


def test_degenerate_returns_none():
    line_ring = np.array([[0, 0], [5, 0], [0, 0]], dtype=np.float64)
    assert make_valid_wkb(wkb_mod.polygon_to_wkb([line_ring])) is None


def test_random_star_polygons_match_monte_carlo():
    from lib_gdal_ray.geom.pip import points_in_ring

    rng = np.random.default_rng(5)
    for trial in range(4):
        k = int(rng.integers(5, 9))
        ang = rng.uniform(0, 2 * np.pi, k)  # UNSORTED -> self-intersecting
        r = rng.uniform(2, 10, k)
        ring = np.stack([10 + r * np.cos(ang), 10 + r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        out = make_valid_wkb(wkb_mod.polygon_to_wkb([ring]))
        if out is None:
            continue
        _k, polys = wkb_mod.parse_wkb(out)
        got = poly_area(polys)
        # Monte-Carlo even-odd area of the ORIGINAL ring
        n = 200_000
        px = rng.uniform(-1, 21, n)
        py = rng.uniform(-1, 21, n)
        mc = points_in_ring(px, py, ring).mean() * 22 * 22
        np.testing.assert_allclose(got, mc, rtol=0.03,
                                   err_msg=f"trial {trial}")


def test_stage_wrapper():
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.stages.geom_ops import make_valid_geometry, wkb_centroid_area

    bowtie = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({
        "geometry": pa.array([wkb_mod.polygon_to_wkb([bowtie])], type=pa.binary())}))
    out = make_valid_geometry(ds).to_pandas()
    assert len(out) == 1
    np.testing.assert_allclose(wkb_centroid_area(out["geometry"][0])[2], 8.0,
                               rtol=1e-6)


class TestCheckGeometry:
    def test_flags(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.geom import wkb as W
        from lib_gdal_ray.stages.geom_ops import check_geometry

        ok = W.polygon_to_wkb([np.array([[0, 0], [4, 0], [4, 4], [0, 0]], float)])
        bowtie = W.polygon_to_wkb([np.array(
            [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)])
        unclosed = W.polygon_to_wkb([np.array(
            [[0, 0], [4, 0], [4, 4], [1, 1]], float)])
        pt = W.points_to_wkb(np.array([1.0]), np.array([2.0]))[0]
        ds = ray.data.from_arrow(pa.table({
            "fid": pa.array([0, 1, 2, 3, 4]),
            "geometry": pa.array([ok, bowtie, unclosed, pt, None],
                                 type=pa.binary())}))
        out = check_geometry(ds).to_pandas().sort_values("fid")
        assert list(out["is_valid"]) == [True, False, False, True, False]
        assert out["invalid_reason"].iloc[1] == "ring self-intersection"
        assert out["invalid_reason"].iloc[2] == "unclosed ring"
        assert out["invalid_reason"].iloc[4] == "null geometry"
