"""Raster algebra + focal kernels + histogram vs dense numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines import raster_calc as rc
from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel


def pixels_from_grid(grid: np.ndarray, z=2):
    """Dense grid -> sparse pixel Dataset (nonzero only)."""
    gy, gx = np.nonzero(grid)
    pix = pack_pixel(z, gx.astype(np.int64), gy.astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pix), "burn": pa.array(grid[gy, gx].astype(np.float64))}))


def grid_from_pixels(ds, shape, z=2):
    df = ds.to_pandas()
    arr = np.zeros(shape, dtype=np.float64)
    zz, gx, gy = unpack_pixel(df["pix_id"].to_numpy().astype(np.uint64))
    arr[gy, gx] = df["burn"].to_numpy()
    return arr


class TestPixelCalc:
    def _grids(self, seed=0):
        rng = np.random.default_rng(seed)
        a = np.where(rng.random((40, 40)) < 0.5, rng.integers(1, 9, (40, 40)), 0).astype(float)
        b = np.where(rng.random((40, 40)) < 0.5, rng.integers(1, 9, (40, 40)), 0).astype(float)
        return a, b

    @pytest.mark.parametrize("op,npop", [
        ("add", np.add), ("sub", np.subtract), ("mul", np.multiply),
        ("min", np.minimum), ("max", np.maximum),
    ])
    def test_ops_vs_dense(self, op, npop):
        a, b = self._grids()
        got = grid_from_pixels(rc.pixel_calc(pixels_from_grid(a), pixels_from_grid(b), op),
                               (40, 40))
        np.testing.assert_array_equal(got, npop(a, b))

    def test_div_zero_safe(self):
        a, b = self._grids(3)
        got = grid_from_pixels(rc.pixel_calc(pixels_from_grid(a), pixels_from_grid(b), "div"),
                               (40, 40))
        want = np.divide(a, b, out=np.zeros_like(a), where=b != 0)
        np.testing.assert_allclose(got, want)

    def test_scale_reclassify(self):
        a, _ = self._grids(5)
        scaled = grid_from_pixels(rc.pixel_scale(pixels_from_grid(a), 2.0, 0.0), (40, 40))
        np.testing.assert_array_equal(scaled, a * 2.0)
        rec = grid_from_pixels(
            rc.reclassify(pixels_from_grid(a), [0, 3, 6, 100], [10, 20, 30]), (40, 40))
        mask = a > 0
        want = np.zeros_like(a)
        want[mask & (a < 3)] = 10
        want[mask & (a >= 3) & (a < 6)] = 20
        want[mask & (a >= 6)] = 30
        np.testing.assert_array_equal(rec, want)


class TestFocal:
    def _dem(self, seed=1, n=32):
        rng = np.random.default_rng(seed)
        # smooth-ish positive surface, fully dense so stencils are complete
        x, y = np.meshgrid(np.arange(n), np.arange(n))
        dem = 100 + 5 * np.sin(x / 5) + 7 * np.cos(y / 7) + rng.random((n, n))
        return dem

    def dense_oracle(self, dem, kernel, cellsize=1.0):
        n = dem.shape[0]
        out = np.full((n, n), np.nan)
        for yy in range(1, n - 1):
            for xx in range(1, n - 1):
                w = dem[yy - 1:yy + 2, xx - 1:xx + 2]
                s = w.ravel()  # s0..s8 row-major, row -1 first
                dzdx = ((s[2] + 2 * s[5] + s[8]) - (s[0] + 2 * s[3] + s[6])) / (8 * cellsize)
                dzdy = ((s[6] + 2 * s[7] + s[8]) - (s[0] + 2 * s[1] + s[2])) / (8 * cellsize)
                if kernel == "slope":
                    out[yy, xx] = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
                elif kernel == "tri":
                    out[yy, xx] = np.abs(w - dem[yy, xx]).sum() / 8.0
                elif kernel == "tpi":
                    out[yy, xx] = dem[yy, xx] - (w.sum() - dem[yy, xx]) / 8.0
                elif kernel == "roughness":
                    out[yy, xx] = w.max() - w.min()
                elif kernel == "mean":
                    out[yy, xx] = w.mean()
        return out

    @pytest.mark.parametrize("kernel", ["slope", "tri", "tpi", "roughness", "mean"])
    def test_kernels_vs_dense(self, kernel):
        dem = self._dem()
        got = rc.focal(pixels_from_grid(dem), kernel).to_pandas()
        zz, gx, gy = unpack_pixel(got["pix_id"].to_numpy().astype(np.uint64))
        want = self.dense_oracle(dem, kernel)
        # interior pixels only (full stencil)
        interior = (gx >= 1) & (gx <= 30) & (gy >= 1) & (gy <= 30)
        assert interior.sum() == 30 * 30
        for xx, yy, v in zip(gx[interior], gy[interior], got["burn"].to_numpy()[interior]):
            np.testing.assert_allclose(v, want[yy, xx], rtol=1e-12, atol=1e-9)

    def test_hillshade_range(self):
        dem = self._dem(4)
        got = rc.focal(pixels_from_grid(dem), "hillshade").to_pandas()
        v = got["burn"].to_numpy()
        assert v.min() >= 1.0 and v.max() <= 255.0
        assert np.all(v == np.round(v))


class TestHistogramStats:
    def test_histogram_vs_numpy(self):
        rng = np.random.default_rng(9)
        grid = np.where(rng.random((50, 50)) < 0.7, rng.uniform(0, 10, (50, 50)), 0)
        ds = pixels_from_grid(grid)
        hist = rc.pixel_histogram(ds, 0.0, 10.0, 5).to_pandas().set_index("bin")["n"]
        vals = grid[grid != 0]
        want = np.bincount(np.clip((vals / 2.0).astype(int), 0, 4), minlength=5)
        for b in range(5):
            assert hist.get(b, 0) == want[b]

    def test_stats(self):
        grid = np.zeros((10, 10))
        grid[0, 0], grid[1, 1], grid[2, 2] = 2.0, 4.0, 6.0
        st = rc.pixel_stats(pixels_from_grid(grid)).to_pandas()
        assert st["n"].iloc[0] == 3
        assert st["min_v"].iloc[0] == 2.0 and st["max_v"].iloc[0] == 6.0
        np.testing.assert_allclose(st["mean_v"].iloc[0], 4.0)


class TestFocalNxN:
    @pytest.mark.parametrize("op,radius", [("mean", 1), ("sum", 2), ("min", 1), ("max", 2)])
    def test_vs_dense(self, op, radius):
        rng = np.random.default_rng(7)
        grid = rng.uniform(1, 9, (20, 20))
        out = rc.focal_nxn(pixels_from_grid(grid), radius=radius, op=op,
                           full_only=True).to_pandas()
        zz, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        side = 2 * radius + 1
        fn = {"mean": np.mean, "sum": np.sum, "min": np.min, "max": np.max}[op]
        for x, y, v in zip(gx, gy, out["burn"]):
            assert radius <= x < 20 - radius and radius <= y < 20 - radius
            w = grid[y - radius:y + radius + 1, x - radius:x + radius + 1]
            np.testing.assert_allclose(v, fn(w), rtol=1e-12)


class TestZorder:
    def test_interleave_locality(self):
        from lib_gdal_ray.geom.cells import zorder_key

        k = zorder_key(np.asarray([0, 1, 0, 1]), np.asarray([0, 0, 1, 1]))
        assert list(k) == [0, 1, 2, 3]
        # monotone blocks: keys of a 2x2 block are contiguous
        k2 = zorder_key(np.asarray([2, 3, 2, 3]), np.asarray([2, 2, 3, 3]))
        assert sorted(k2) == list(range(12, 16))


class TestNearblack:
    def test_collar_vs_interior_black(self):
        # image 20x20: black frame 2px wide (collar), black 3x3 blob in the
        # middle (NOT collar), gray elsewhere
        grid = np.full((20, 20), 5.0)
        grid[:2, :] = 0.0
        grid[-2:, :] = 0.0
        grid[:, :2] = 0.0
        grid[:, -2:] = 0.0
        grid[9:12, 9:12] = 0.0
        # encode zeros explicitly (sparse rep drops zeros -> use value 0 kept
        # via pixels_from_grid on grid+1 trick): shift values by +1
        ds = pixels_from_grid(grid + 1.0)
        out = rc.nearblack_collar(ds, (0, 0, 20, 20), tolerance=1.0).to_pandas()
        zz, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        got = {(int(x), int(y)) for x, y in zip(gx, gy)}
        want = {(x, y) for x in range(20) for y in range(20)
                if x < 2 or x >= 18 or y < 2 or y >= 18}
        assert got == want  # frame yes, interior blob no

    def test_no_collar(self):
        grid = np.full((10, 10), 7.0)
        out = rc.nearblack_collar(pixels_from_grid(grid), (0, 0, 10, 10),
                                  tolerance=0.5).to_pandas()
        assert len(out) == 0


class TestColorRelief:
    RAMP = [(0, 0, 0, 255), (10, 100, 255, 0), (20, 255, 50, 30)]

    def test_vs_np_interp(self):
        rng = np.random.default_rng(3)
        grid = rng.integers(1, 25, (16, 16)).astype(float)
        out = rc.color_relief(pixels_from_grid(grid), self.RAMP).to_pandas()
        zz, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        v = grid[gy, gx]
        xs = np.array([r[0] for r in self.RAMP], dtype=float)
        for i, c in enumerate("rgb"):
            ys = np.array([r[i + 1] for r in self.RAMP], dtype=float)
            want = np.floor(np.interp(v, xs, ys) + 0.5).astype(np.int32)
            np.testing.assert_array_equal(out[c].to_numpy(), want)

    def test_clamps_at_ends(self):
        ds = ray.data.from_arrow(pa.table({
            "pix_id": pa.array(pack_pixel(2, np.array([0, 1]), np.array([0, 0]))),
            "burn": pa.array([-5.0, 99.0])}))
        out = rc.color_relief(ds, self.RAMP).to_pandas().sort_values("burn")
        assert list(out["r"]) == [0, 255]
        assert list(out["b"]) == [255, 30]


class TestBlend:
    def test_overlap_and_passthrough(self):
        a = np.zeros((8, 8)); a[:4, :] = 100.0          # top half only
        b = np.zeros((8, 8)); b[2:6, :] = 60.0          # middle band
        out = rc.blend(pixels_from_grid(a), pixels_from_grid(b), 96)
        got = grid_from_pixels(out, (8, 8))
        want = np.zeros((8, 8))
        want[:2, :] = 100.0                              # a only: passthrough
        want[2:4, :] = (100 * 96 + 60 * 159 + 127) // 255  # both: composite
        want[4:6, :] = 60.0                              # b only: passthrough
        np.testing.assert_array_equal(got, want)

    def test_alpha_extremes(self):
        a = np.full((4, 4), 9.0)
        b = np.full((4, 4), 3.0)
        full = grid_from_pixels(rc.blend(pixels_from_grid(a), pixels_from_grid(b), 255), (4, 4))
        none = grid_from_pixels(rc.blend(pixels_from_grid(a), pixels_from_grid(b), 0), (4, 4))
        np.testing.assert_array_equal(full, a)
        np.testing.assert_array_equal(none, b)

    def test_alpha_range_check(self):
        with pytest.raises(ValueError):
            rc.blend(pixels_from_grid(np.ones((2, 2))), pixels_from_grid(np.ones((2, 2))), 300)


class TestFocalVariants:
    def _dem(self, n=24, seed=5):
        rng = np.random.default_rng(seed)
        return rng.uniform(50, 150, (n, n))

    def test_zevenbergen_slope_vs_dense(self):
        grid = self._dem()
        out = rc.focal(pixels_from_grid(grid), "slope", alg="zevenbergen").to_pandas()
        zz, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        dzdx = (grid[gy, gx + 1] - grid[gy, gx - 1]) / 2.0
        dzdy = (grid[gy + 1, gx] - grid[gy - 1, gx]) / 2.0
        want = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
        np.testing.assert_allclose(out["burn"].to_numpy(), want, rtol=1e-12)

    def test_bad_alg(self):
        with pytest.raises(ValueError):
            rc.focal(pixels_from_grid(self._dem()), "slope", alg="nope")

    def test_multidirectional_flat_is_sin_alt(self):
        grid = np.full((8, 8), 77.0)
        out = rc.focal(pixels_from_grid(grid), "hillshade_md", altitude=30.0).to_pandas()
        want = np.round(254.0 * np.sin(np.radians(30.0))) + 1.0
        assert (out["burn"] == want).all()

    def test_multidirectional_vs_reference_formula(self):
        grid = self._dem(seed=9)
        out = rc.focal(pixels_from_grid(grid), "hillshade_md").to_pandas()
        zz, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
        # independent dense re-derivation straight from USGS OFR 92-422
        # / apps/gdaldem_lib.cpp:1238-1295 (explicit sin² weights)
        w = grid
        dzdx = ((w[gy-1, gx+1] + 2*w[gy, gx+1] + w[gy+1, gx+1])
                - (w[gy-1, gx-1] + 2*w[gy, gx-1] + w[gy+1, gx-1])) / 8.0
        dzdy = ((w[gy+1, gx-1] + 2*w[gy+1, gx] + w[gy+1, gx+1])
                - (w[gy-1, gx-1] + 2*w[gy-1, gx] + w[gy-1, gx+1])) / 8.0
        slope = np.arctan(np.hypot(dzdx, dzdy))
        aspect = np.arctan2(-dzdy, -dzdx)
        zen = np.radians(45.0)
        acc = np.zeros_like(slope)
        for az in (225.0, 270.0, 315.0, 360.0):
            sh = np.maximum(0.0, np.cos(zen)*np.cos(slope)
                            + np.sin(zen)*np.sin(slope)
                            * np.cos(np.radians(az) - np.pi/2 - aspect))
            # weight aspect is GDAL's atan2(y, x) gradient convention
            # (both components sign-flipped vs the shading aspect)
            wt = np.sin(np.arctan2(-dzdy, -dzdx) - np.radians(az)) ** 2
            acc += wt * sh
        want = np.clip(np.round(254.0 * 0.5 * acc) + 1.0, 1.0, 255.0)
        np.testing.assert_array_equal(out["burn"].to_numpy(), want)

    def test_multidirectional_brightest_for_nw_facing(self):
        # plane dipping to the SE: NW-facing slope should be brighter
        # than the SE-facing mirror (dominant 315° azimuth)
        n = 12
        ix = np.arange(n)
        nw = pixels_from_grid(np.add.outer(ix, ix) * 2.0 + 1.0)       # high at SE
        se = pixels_from_grid((np.add.outer(-ix, -ix) + 2 * n) * 2.0 + 1.0)
        bnw = rc.focal(nw, "hillshade_md").to_pandas()["burn"].mean()
        bse = rc.focal(se, "hillshade_md").to_pandas()["burn"].mean()
        assert bnw > bse + 50

    def test_combined_attenuates_flat_to_254(self):
        # flat surface: slope 0 -> comp = 1 -> 254*1 + 1 = 255
        grid = np.full((6, 6), 10.0)
        out = rc.focal(pixels_from_grid(grid), "hillshade_combined").to_pandas()
        assert (out["burn"] == 255.0).all()

    def test_combined_range(self):
        rng = np.random.default_rng(11)
        grid = rng.uniform(0, 400, (16, 16))
        v = rc.focal(pixels_from_grid(grid), "hillshade_combined").to_pandas()["burn"]
        assert v.min() >= 1.0 and v.max() <= 255.0

    def test_igor_flat_is_255_and_direction(self):
        grid = np.full((6, 6), 42.0)
        out = rc.focal(pixels_from_grid(grid), "hillshade_igor").to_pandas()
        assert (out["burn"] == 255.0).all()
        # NE-facing vs SW-facing plane under 315-az light differ
        n = 10
        ix = np.arange(n)
        a = rc.focal(pixels_from_grid(np.add.outer(ix, ix) * 3.0 + 1),
                     "hillshade_igor").to_pandas()["burn"].mean()
        b = rc.focal(pixels_from_grid((np.add.outer(-ix, -ix) + 2 * n) * 3.0 + 1),
                     "hillshade_igor").to_pandas()["burn"].mean()
        assert abs(a - b) > 20


class TestRasterCompare:
    def test_report(self):
        a = np.zeros((8, 8)); a[:4, :] = 3.0; a[0, 0] = 9.0
        b = np.zeros((8, 8)); b[2:6, :] = 3.0; b[2, 0] = 4.0
        out = rc.raster_compare(pixels_from_grid(a), pixels_from_grid(b)).to_pandas()
        r = out.iloc[0]
        # a rows 0-1 only (16 px), b rows 4-5 only (16 px), common rows 2-3
        assert r["n_only_a"] == 16 and r["n_only_b"] == 16
        assert r["n_common"] == 16
        assert r["n_differ"] == 1            # (2,0): 3 vs 4
        assert r["max_abs_diff"] == 1.0

    def test_identical(self):
        g = np.arange(36, dtype=float).reshape(6, 6) + 1
        out = rc.raster_compare(pixels_from_grid(g), pixels_from_grid(g)).to_pandas()
        r = out.iloc[0]
        assert r["n_only_a"] == 0 and r["n_only_b"] == 0 and r["n_differ"] == 0


class TestPixelCalcMulti:
    """VRT derived-band pixel functions (pixelfunctions.cpp registry)."""

    def _bands(self, arrays, z=3):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.rasterize import pack_pixel

        out = []
        for a in arrays:
            a = np.asarray(a, dtype=np.float64)
            idx = np.flatnonzero(a)
            pix = pack_pixel(z, idx.astype(np.int64),
                             np.zeros(len(idx), dtype=np.int64))
            out.append(ray.data.from_arrow(pa.table({
                "pix_id": pa.array(pix),
                "burn": pa.array(a[idx])})))
        return out

    def _vals(self, ds, n, z=3):
        from lib_gdal_ray.pipelines.rasterize import unpack_pixel

        df = ds.to_pandas()
        got = np.zeros(n)
        _z, gx, _gy = unpack_pixel(df["pix_id"].to_numpy().astype(np.uint64))
        got[gx] = df["burn"].to_numpy()
        return got

    def test_kernels(self, ray_session):
        from lib_gdal_ray.pipelines.raster_calc import pixel_calc_multi

        a = [0, 1, 2, 3, 4]
        b = [5, 0, 2, 1, 4]
        c = [1, 1, 1, 9, 4]
        bands = self._bands([a, b, c])
        cases = {
            ("sum", None): np.array(a) + np.array(b) + np.array(c),
            ("mean", None): (np.array(a) + b + np.array(c)) / 3.0,
            ("median", None): np.median(np.stack([a, b, c]), axis=0),
            ("min", None): np.minimum.reduce([a, b, c]),
            ("max", None): np.maximum.reduce([a, b, c]),
        }
        for (fn, args), want in cases.items():
            got = self._vals(pixel_calc_multi(bands, fn, args), 5)
            np.testing.assert_allclose(got, want, err_msg=fn)

    def test_two_band_and_args(self, ray_session):
        from lib_gdal_ray.pipelines.raster_calc import pixel_calc_multi

        a, b = [0.0, 4.0, 9.0, 1.0], [2.0, 4.0, 3.0, 0.0]
        bands = self._bands([a, b])
        nd = self._vals(pixel_calc_multi(bands, "norm_diff",
                                         keep_empty=True), 4)
        want = (np.array(a) - b) / (np.array(a) + b)
        np.testing.assert_allclose(nd, want)
        pw = self._vals(pixel_calc_multi(bands[:1], "pow",
                                         {"power": 2.0}), 4)
        np.testing.assert_allclose(pw, np.array(a) ** 2)
        db = self._vals(pixel_calc_multi(bands[1:], "dB",
                                         {"fact": 10.0}), 4)
        mask = np.array(b) != 0
        np.testing.assert_allclose(db[mask],
                                   10 * np.log10(np.array(b)[mask]))

    def test_interpolate(self, ray_session):
        from lib_gdal_ray.pipelines.raster_calc import pixel_calc_multi

        y0, y1 = [2.0, 4.0, 8.0], [6.0, 8.0, 2.0]
        bands = self._bands([y0, y1])
        lin = self._vals(pixel_calc_multi(
            bands, "interpolate_linear",
            {"t0": 0.0, "dt": 4.0, "t": 1.0}, keep_empty=True), 3)
        np.testing.assert_allclose(
            lin, np.array(y0) + (np.array(y1) - y0) / 4.0)
        ex = self._vals(pixel_calc_multi(
            bands, "interpolate_exp",
            {"t0": 0.0, "dt": 1.0, "t": 0.5}, keep_empty=True), 3)
        np.testing.assert_allclose(
            ex, np.array(y0) * np.sqrt(np.array(y1) / y0))

    def test_mode(self, ray_session):
        from lib_gdal_ray.pipelines.raster_calc import pixel_calc_multi

        rows = [[3, 1, 7], [3, 2, 7], [5, 2, 4]]
        bands = self._bands(rows)
        got = self._vals(pixel_calc_multi(bands, "mode"), 3)
        # per pixel: [3,3,5]->3, [1,2,2]->2, [7,7,4]->7
        np.testing.assert_array_equal(got, [3, 2, 7])

    def test_complex_family(self, ray_session):
        from lib_gdal_ray.pipelines.raster_calc import (complex_merge,
                                                        complex_op)

        re, im = [3.0, 0.0, 1.0], [4.0, 2.0, 0.0]
        bands = self._bands([re, im])
        c = complex_merge(bands[0], bands[1])
        mod = self._vals(complex_op(c, "mod"), 3)
        np.testing.assert_allclose(mod, np.hypot(re, im))
        inten = self._vals(complex_op(complex_op(c, "conj"),
                                      "intensity"), 3)
        np.testing.assert_allclose(
            inten, np.array(re) ** 2 + np.array(im) ** 2)
        ph = complex_op(c, "phase").to_pandas()
        assert len(ph) == 3


class TestPixelExpression:
    def test_infix_band_math(self, ray_session):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.raster_calc import pixel_expression
        from lib_gdal_ray.pipelines.rasterize import (pack_pixel,
                                                      unpack_pixel)

        def band(vals):
            a = np.asarray(vals, dtype=np.float64)
            idx = np.flatnonzero(a)
            pix = pack_pixel(3, idx.astype(np.int64),
                             np.zeros(len(idx), dtype=np.int64))
            return ray.data.from_arrow(pa.table({
                "pix_id": pa.array(pix), "burn": pa.array(a[idx])}))

        A = [2.0, 4.0, 0.0, 10.0]
        B = [1.0, 0.0, 3.0, 5.0]
        out = pixel_expression({"A": band(A), "B": band(B)},
                               "(A - B) / (A + B) + A * 2",
                               keep_empty=True).to_pandas()
        got = np.zeros(4)
        _z, gx, _gy = unpack_pixel(out["pix_id"].to_numpy()
                                   .astype(np.uint64))
        got[gx] = out["burn"].to_numpy()
        a, b = np.array(A), np.array(B)
        want = (a - b) / (a + b) + a * 2
        np.testing.assert_allclose(got, want)

    def test_functions_and_mod(self, ray_session):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.raster_calc import pixel_expression
        from lib_gdal_ray.pipelines.rasterize import pack_pixel

        a = np.array([7.0, 9.0, 12.0])
        pix = pack_pixel(3, np.arange(3, dtype=np.int64),
                         np.zeros(3, dtype=np.int64))
        b = ray.data.from_arrow(pa.table({
            "pix_id": pa.array(pix), "burn": pa.array(a)}))
        out = pixel_expression({"X": b}, "X % 5 + 1",
                               keep_empty=True).to_pandas()
        np.testing.assert_allclose(sorted(out["burn"]),
                                   sorted(a % 5 + 1))


class TestFusedPixelApply:
    """pixel_apply / pixel_expression_cols (zero-shuffle fused path)
    pin identical results to the union+groupby pixel_calc_multi /
    pixel_expression over the same bands."""

    def _bands(self):
        rng = np.random.default_rng(5)
        pix = np.arange(500, dtype=np.int64)
        a = rng.integers(1, 50, 500).astype(np.float64)
        b = rng.integers(1, 50, 500).astype(np.float64)
        ds_a = ray.data.from_arrow(pa.table({"pix_id": pix, "burn": a}))
        ds_b = ray.data.from_arrow(pa.table({"pix_id": pix, "burn": b}))
        fused = ray.data.from_arrow(pa.table({"pix_id": pix,
                                              "A": a, "B": b}))
        return ds_a, ds_b, fused

    def test_pixel_apply_matches_calc_multi(self, ray_session):
        ds_a, ds_b, fused = self._bands()
        want = rc.pixel_calc_multi([ds_a, ds_b], "norm_diff",
                                   keep_empty=True).to_pandas()
        got = rc.pixel_apply(fused, "norm_diff",
                             cols=["A", "B"]).to_pandas()
        w = want.sort_values("pix_id").reset_index(drop=True)
        g = got.sort_values("pix_id").reset_index(drop=True)
        np.testing.assert_allclose(g["burn"], w["burn"], rtol=0)

    def test_expression_cols_matches_expression(self, ray_session):
        ds_a, ds_b, fused = self._bands()
        expr = "(A - B) / (A + B) + A * 2"
        want = rc.pixel_expression({"A": ds_a, "B": ds_b}, expr,
                                   keep_empty=True).to_pandas()
        got = rc.pixel_expression_cols(fused, expr).to_pandas()
        w = want.sort_values("pix_id").reset_index(drop=True)
        g = got.sort_values("pix_id").reset_index(drop=True)
        np.testing.assert_allclose(g["burn"], w["burn"], rtol=0)
