"""N-D chunked array model vs numpy oracles."""

import numpy as np
import pytest

from lib_gdal_ray.sources import multidim as md


# lambda: cloudpickled by value (a module-level def would be pickled by
# reference, which Ray workers can't import from the tests dir)
fn3 = lambda i, j, k: i * 10000.0 + j * 100.0 + k  # noqa: E731


SHAPE = (13, 10, 7)          # deliberately non-multiples of chunk shape
CHUNKS = (5, 4, 3)


def dense_oracle():
    ii, jj, kk = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    return fn3(ii, jj, kk).astype(float)


def test_roundtrip():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    got = md.to_numpy(ds, SHAPE, CHUNKS)
    np.testing.assert_array_equal(got, dense_oracle())


def test_slice_view():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    ranges = [(2, 11), (3, 9), (1, 6)]
    view = md.slice_view(ds, SHAPE, CHUNKS, ranges)
    # reassemble the view via offsets
    want = dense_oracle()[2:11, 3:9, 1:6]
    got = np.full(want.shape, np.nan)
    for b in view.iter_batches(batch_format="pyarrow"):
        for r in range(len(b["chunk_id"])):
            o = [b[f"o{d}"][r].as_py() for d in range(3)]
            data = np.frombuffer(b["data"][r].as_py(), dtype="<f8")
            # infer block dims from chunk extent ∩ range
            key = np.asarray([b["chunk_id"][r].as_py()], dtype=np.uint64)
            ci = md.unpack_chunks(key, 3)[0]
            dims = []
            for d in range(3):
                lo = ci[d] * CHUNKS[d]
                hi = min(lo + CHUNKS[d], SHAPE[d])
                s0, s1 = max(lo, ranges[d][0]), min(hi, ranges[d][1])
                dims.append(s1 - s0)
            block = data.reshape(dims)
            sl = tuple(slice(o[d] - ranges[d][0], o[d] - ranges[d][0] + dims[d])
                       for d in range(3))
            got[sl] = block
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("axis,op", [(0, "sum"), (1, "sum"), (2, "max"),
                                     (1, "min"), (2, "mean"), (0, "mean")])
def test_reduce_dim(axis, op):
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    red = md.reduce_dim(ds, SHAPE, CHUNKS, axis, op)
    new_shape = tuple(s for d, s in enumerate(SHAPE) if d != axis)
    new_chunks = tuple(c for d, c in enumerate(CHUNKS) if d != axis)
    got = md.to_numpy(red, new_shape, new_chunks)
    o = dense_oracle()
    want = {"sum": np.sum, "max": np.max, "min": np.min,
            "mean": np.mean}[op](o, axis=axis)
    np.testing.assert_allclose(got, want)


def test_statistics():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    out = ds_to_pandas(md.statistics(ds))
    o = dense_oracle()
    assert out["n"].iloc[0] == o.size
    np.testing.assert_allclose(out["vmin"].iloc[0], o.min())
    np.testing.assert_allclose(out["vmax"].iloc[0], o.max())
    np.testing.assert_allclose(out["mean"].iloc[0], o.mean())
    np.testing.assert_allclose(out["std_pop"].iloc[0], o.std(), rtol=1e-12)


def ds_to_pandas(ds):
    return ds.to_pandas()


def test_as_classic():
    from lib_gdal_ray.pipelines.rasterize import unpack_pixel

    ds = md.from_function(SHAPE, CHUNKS, fn3)
    red = md.reduce_dim(ds, SHAPE, CHUNKS, axis=2, op="mean")
    shape2, chunk2 = SHAPE[:2], CHUNKS[:2]
    pix = md.as_classic(red, shape2, chunk2, z=6).to_pandas()
    assert len(pix) == shape2[0] * shape2[1]
    z, gpx, gpy = unpack_pixel(pix["pix_id"].to_numpy().astype(np.uint64))
    want = dense_oracle().mean(axis=2)
    np.testing.assert_allclose(pix["burn"].to_numpy(),
                               want[gpy, gpx])
    assert (z == 6).all()


def test_as_classic_rejects_3d():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    with pytest.raises(ValueError):
        md.as_classic(ds, SHAPE, CHUNKS, z=6)


@pytest.mark.parametrize("axes", [(2, 0, 1), (1, 0, 2), (2, 1, 0)])
def test_transpose(axes):
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    out = md.transpose(ds, SHAPE, CHUNKS, axes)
    new_shape = tuple(SHAPE[a] for a in axes)
    new_chunks = tuple(CHUNKS[a] for a in axes)
    got = md.to_numpy(out, new_shape, new_chunks)
    np.testing.assert_array_equal(got, np.transpose(dense_oracle(), axes))


def test_transpose_bad_axes():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    with pytest.raises(ValueError):
        md.transpose(ds, SHAPE, CHUNKS, (0, 0, 1))


def test_unscale():
    ds = md.from_function(SHAPE, CHUNKS, fn3)
    got = md.to_numpy(md.unscale(ds, scale=2.5, offset=-3.0), SHAPE, CHUNKS)
    np.testing.assert_allclose(got, dense_oracle() * 2.5 - 3.0)
