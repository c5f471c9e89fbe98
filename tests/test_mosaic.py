"""Mosaic overlay, warp resample, select() helper."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines.mosaic import mosaic, warp_nearest
from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel
from lib_gdal_ray.pipelines.relational import select
from lib_gdal_ray.sources import tables


def px_ds(coords_vals, z=3):
    gx = np.asarray([c[0] for c in coords_vals], dtype=np.int64)
    gy = np.asarray([c[1] for c in coords_vals], dtype=np.int64)
    v = np.asarray([c[2] for c in coords_vals], dtype=np.float64)
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pack_pixel(z, gx, gy)), "burn": pa.array(v)}))


def to_dict(ds):
    df = ds.to_pandas()
    z, gx, gy = unpack_pixel(df["pix_id"].to_numpy().astype(np.uint64))
    return {(int(x), int(y)): v for x, y, v in zip(gx, gy, df["burn"])}


class TestMosaic:
    def test_last_wins(self):
        a = px_ds([(0, 0, 1.0), (1, 0, 1.0), (2, 0, 1.0)])
        b = px_ds([(1, 0, 2.0), (3, 0, 2.0)])
        c = px_ds([(2, 0, 3.0)])
        got = to_dict(mosaic([a, b, c]))
        assert got == {(0, 0): 1.0, (1, 0): 2.0, (2, 0): 3.0, (3, 0): 2.0}

    def test_single(self):
        a = px_ds([(5, 5, 9.0)])
        assert to_dict(mosaic([a])) == {(5, 5): 9.0}


class TestWarp:
    def test_downzoom_mean(self):
        # 4 pixels in one 2x2 block at z3 -> one pixel at z2, mean
        a = px_ds([(4, 4, 1.0), (5, 4, 2.0), (4, 5, 3.0), (5, 5, 4.0), (8, 8, 10.0)])
        got = to_dict(warp_nearest(a, 2, merge="mean"))
        assert got == {(2, 2): 2.5, (4, 4): 10.0}

    def test_downzoom_sum_max(self):
        a = px_ds([(4, 4, 1.0), (5, 5, 4.0)])
        assert to_dict(warp_nearest(a, 2, merge="sum")) == {(2, 2): 5.0}
        assert to_dict(warp_nearest(a, 2, merge="max")) == {(2, 2): 4.0}

    def test_upzoom_center(self):
        a = px_ds([(2, 2, 7.0)], z=2)
        got = to_dict(warp_nearest(a, 3, merge="mean"))
        assert got == {(5, 5): 7.0}  # center replication: (2*2+1, 2*2+1)


class TestSelect:
    def test_full_chain_vs_duckdb(self, sf_med):
        ds = tables.read_table(sf_med, "orders",
                               columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
        out = select(ds, columns=["o_orderkey", "o_totalprice"],
                     where="o_totalprice > 100000 AND o_orderstatus = 'O'",
                     order_by=[("o_totalprice", True), ("o_orderkey", False)],
                     limit=20).to_pandas()
        want = duckdb.sql(f"""
            SELECT o_orderkey, o_totalprice FROM read_parquet('{sf_med}/orders.parquet')
            WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""").df()
        np.testing.assert_array_equal(out["o_orderkey"].to_numpy(),
                                      want["o_orderkey"].to_numpy())


class TestWarpBilinear:
    def test_linear_surface_exact(self):
        # bilinear up-zoom of an affine surface reproduces the surface at
        # the destination pixel centers exactly (interior pixels)
        coords = [(x, y, 3.0 * x + 2.0 * y) for x in range(10, 20) for y in range(10, 20)]
        src = px_ds(coords, z=2)
        from lib_gdal_ray.pipelines.mosaic import warp_bilinear

        out = to_dict(warp_bilinear(src, 3))
        for (dgx, dgy), v in out.items():
            fx = (dgx + 0.5) / 2 - 0.5
            fy = (dgy + 0.5) / 2 - 0.5
            if 10 <= fx <= 18.9 and 10 <= fy <= 18.9:  # full 4-corner support
                np.testing.assert_allclose(v, 3.0 * fx + 2.0 * fy, rtol=1e-12)

    def test_downzoom_rejected(self):
        from lib_gdal_ray.pipelines.mosaic import warp_bilinear

        src = px_ds([(4, 4, 1.0)], z=3)
        with pytest.raises(Exception):
            warp_bilinear(src, 2).to_pandas()


class TestPansharpen:
    def test_brovey(self):
        from lib_gdal_ray.pipelines.mosaic import pansharpen

        b0 = px_ds([(0, 0, 2.0), (1, 0, 4.0)])
        b1 = px_ds([(0, 0, 6.0), (1, 0, 4.0)])
        pan = px_ds([(0, 0, 8.0), (1, 0, 2.0)])
        out = pansharpen(pan, [b0, b1]).to_pandas()
        from lib_gdal_ray.pipelines.rasterize import unpack_pixel

        z, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        got = {(int(x), int(b)): v for x, b, v in zip(gx, out["band"], out["burn"])}
        # pixel (0,0): mean=4, ratio=2 -> b0=4, b1=12; pixel (1,0): mean=4, ratio=0.5
        assert got[(0, 0)] == 4.0 and got[(0, 1)] == 12.0
        assert got[(1, 0)] == 2.0 and got[(1, 1)] == 2.0


from lib_gdal_ray.pipelines import mosaic as mosaic_mod


class TestWarpCubic:
    def _dense(self, z, n0, n1, vals):
        import pyarrow as pa

        import ray.data as rd
        gx, gy = np.meshgrid(np.arange(n0, n1), np.arange(n0, n1), indexing="ij")
        return rd.from_arrow(pa.table({
            "pix_id": pa.array(mosaic_mod.pack_pixel(z, gx.ravel(), gy.ravel())),
            "burn": pa.array(vals.ravel().astype(np.float64)),
        }))

    def test_constant_field_stays_constant(self):
        # partition of unity: interior dst pixels with all 16 taps present
        vals = np.full((8, 8), 7.5)
        out = mosaic_mod.warp_cubic(self._dense(3, 0, 8, vals), 4).to_pandas()
        z, gx, gy = mosaic_mod.unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        interior = (gx >= 4) & (gx < 12) & (gy >= 4) & (gy < 12)
        np.testing.assert_allclose(out["burn"].to_numpy()[interior], 7.5,
                                   rtol=1e-12)

    def test_vs_brute_cubic(self):
        rng = np.random.default_rng(6)
        vals = rng.uniform(0, 100, (8, 8))
        out = mosaic_mod.warp_cubic(self._dense(3, 0, 8, vals), 4).to_pandas()
        z, gx, gy = mosaic_mod.unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        got = {(int(a), int(b)): v for a, b, v in zip(gx, gy, out["burn"])}
        # brute: for a few dst pixels compute the renormalized 4x4 sum
        for dgx, dgy in [(6, 6), (8, 9), (3, 3), (0, 0), (15, 15)]:
            fx = (dgx + 0.5) / 2 - 0.5
            fy = (dgy + 0.5) / 2 - 0.5
            x0, y0 = int(np.floor(fx)), int(np.floor(fy))
            wsum, vsum = 0.0, 0.0
            for dx in (-1, 0, 1, 2):
                for dy in (-1, 0, 1, 2):
                    sx, sy = x0 + dx, y0 + dy
                    if not (0 <= sx < 8 and 0 <= sy < 8):
                        continue
                    w = float(mosaic_mod.cubic_weight(np.asarray([fx - sx]))[0]
                              * mosaic_mod.cubic_weight(np.asarray([fy - sy]))[0])
                    wsum += w
                    vsum += w * vals[sx, sy]
            want = vsum / wsum
            np.testing.assert_allclose(got[(dgx, dgy)], want, rtol=1e-10)

    def test_cubic_weight_reference_values(self):
        # CubicKernel spot values (alg/gdalresamplingkernels.h)
        assert mosaic_mod.cubic_weight(np.asarray([0.0]))[0] == 1.0
        assert mosaic_mod.cubic_weight(np.asarray([1.0]))[0] == 0.0
        assert mosaic_mod.cubic_weight(np.asarray([2.0]))[0] == 0.0
        np.testing.assert_allclose(mosaic_mod.cubic_weight(np.asarray([0.5]))[0], 0.5625)
        np.testing.assert_allclose(mosaic_mod.cubic_weight(np.asarray([1.5]))[0], -0.0625)
        # partition of unity at any phase
        for t in (0.0, 0.25, 0.37, 0.5, 0.99):
            s = mosaic_mod.cubic_weight(np.asarray([t + 1, t, t - 1, t - 2])).sum()
            np.testing.assert_allclose(s, 1.0, rtol=1e-12)


class TestWarpLanczos:
    def test_weight_reference_values(self):
        w = mosaic_mod.lanczos_weight
        assert w(np.asarray([0.0]))[0] == 1.0
        np.testing.assert_allclose(w(np.asarray([1.0]))[0], 0.0, atol=1e-15)
        np.testing.assert_allclose(w(np.asarray([2.0]))[0], 0.0, atol=1e-15)
        assert w(np.asarray([3.0]))[0] == 0.0
        assert w(np.asarray([3.5]))[0] == 0.0
        # classic lanczos3 value at 0.5: sinc(0.5)*sinc(1/6)
        want = (np.sin(np.pi * 0.5) / (np.pi * 0.5)) * \
               (np.sin(np.pi / 6) / (np.pi / 6))
        np.testing.assert_allclose(w(np.asarray([0.5]))[0], want, rtol=1e-12)

    def test_constant_field_interior(self):
        import pyarrow as pa
        import ray.data as rd

        gx, gy = np.meshgrid(np.arange(0, 12), np.arange(0, 12), indexing="ij")
        ds = rd.from_arrow(pa.table({
            "pix_id": pa.array(mosaic_mod.pack_pixel(3, gx.ravel(), gy.ravel())),
            "burn": pa.array(np.full(gx.size, 4.25))}))
        out = mosaic_mod.warp_lanczos(ds, 4).to_pandas()
        z, ox, oy = mosaic_mod.unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        interior = (ox >= 8) & (ox < 16) & (oy >= 8) & (oy < 16)
        np.testing.assert_allclose(out["burn"].to_numpy()[interior], 4.25,
                                   rtol=1e-9)
