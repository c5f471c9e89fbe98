"""Media span plumbing: explode, fetch stub, decode stub, schemas."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.sources.synth import interleaved_docs, span_signature
from lib_gdal_ray.stages.media import (FEATURE_DIM, MediaDecodeStage,
                                       MediaFetchStage, explode_media_spans,
                                       media_features)


def test_explode_only_media_spans():
    docs = interleaved_docs(200)
    rows = explode_media_spans(docs).to_pandas()
    assert set(rows.columns) == {"doc_id", "span_idx", "kind", "media_ref"}
    assert (rows["media_ref"] != "").all()
    assert set(rows["kind"]) <= {"image", "audio", "video"}
    # count matches span signatures
    sigs = span_signature(docs.to_pandas()["spans"])
    want = sum(1 for sig in sigs for s in sig if s[2] != "")
    assert len(rows) == want


def test_features_deterministic_and_typed():
    docs = interleaved_docs(100)
    out1 = media_features(docs, batch_size=64).to_pandas()
    out2 = media_features(interleaved_docs(100), batch_size=64).to_pandas()
    assert len(out1) > 0
    f1 = np.stack([np.asarray(f) for f in out1.sort_values(["doc_id", "span_idx"])["feature"]])
    f2 = np.stack([np.asarray(f) for f in out2.sort_values(["doc_id", "span_idx"])["feature"]])
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape[1] == FEATURE_DIM
    assert f1.dtype == np.float32
    np.testing.assert_allclose(f1.sum(axis=1), 1.0, atol=1e-5)


def test_real_mode_seams():
    # remote-filesystem fetch is still the documented seam
    t = pa.table({"media_ref": pa.array(["s3://x/y.bin"])})
    with pytest.raises(NotImplementedError):
        MediaFetchStage(real=True)(t)
    # real decode now RUNS (codecs are real); unknown magic is an error
    t2 = pa.table({"payload": pa.array([b"abc"], type=pa.binary())})
    with pytest.raises(ValueError):
        MediaDecodeStage(real=True)(t2)


def test_resize_stage_plumbing():
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.stages.media import MediaFetchStage, MediaResizeStage

    t = pa.table({"media_ref": pa.array([f"img://{i}" for i in range(6)])})
    ds = ray.data.from_arrow(t).map_batches(MediaFetchStage(payload_size=4096),
                                            batch_format="pyarrow")
    out = ds.map_batches(MediaResizeStage(64, 64), batch_format="pyarrow").to_pandas()
    assert set(out.columns) >= {"payload", "width", "height"}
    assert (out["width"] == 64).all()
    assert all(len(p) <= 4096 for p in out["payload"])
    # deterministic across runs
    out2 = (ray.data.from_arrow(t)
            .map_batches(MediaFetchStage(payload_size=4096), batch_format="pyarrow")
            .map_batches(MediaResizeStage(64, 64), batch_format="pyarrow").to_pandas())
    assert list(out["payload"]) == list(out2["payload"])


def test_frame_sample_stage_plumbing():
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.stages.media import FrameSampleStage, MediaFetchStage

    t = pa.table({"media_ref": pa.array(["vid://a", "vid://b"])})
    ds = ray.data.from_arrow(t).map_batches(MediaFetchStage(payload_size=2048),
                                            batch_format="pyarrow")
    out = ds.map_batches(FrameSampleStage(frame_bytes=256, every_n=2),
                         batch_format="pyarrow").to_pandas()
    # 2048/256 = 8 frames, every 2nd -> 4 rows per video
    assert len(out) == 8
    assert set(out["frame_idx"]) == {0, 2, 4, 6}
    assert all(len(f) == 256 for f in out["frame"])
