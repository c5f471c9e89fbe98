"""Multimodal span processing: media fetch / decode / featurize stages.

Media travels as opaque refs (and binary payloads) inside the
interleaved `spans` column (BASELINE.json input_hint). The decode step
is STUBBED — this container has no image/audio codecs (PIL/ffmpeg) —
but the Ray-side plumbing is real and tested: span explode is a
vectorized Arrow list flatten, fetch/decode are actor-pool
`map_batches` stages with per-actor init, small batch sizes for large
binary payloads, and typed output schemas (`fixed-size feature
list<float32>`).

`real=True` raises NotImplementedError at the exact seam where a codec
(PIL.Image.open / soundfile / av) would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 16


def explode_media_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One row per media span: (doc_id, span_idx, kind, media_ref).

    Vectorized Arrow list flatten — no Python per row."""

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        flat = spans.flatten()
        n_spans = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_spans)
        span_idx = np.concatenate([np.arange(k, dtype=np.int32) for k in n_spans]) \
            if len(n_spans) else np.empty(0, np.int32)
        t = pa.table({
            "doc_id": batch["doc_id"].take(pa.array(doc_idx)),
            "span_idx": pa.array(span_idx),
            "kind": flat.field("kind"),
            "media_ref": flat.field("media_ref"),
        })
        mask = pc_not_empty(t["media_ref"])
        return t.filter(mask)

    import pyarrow.compute as pc

    def pc_not_empty(col):
        return pc.and_(pc.is_valid(col), pc.not_equal(col, ""))

    return docs.map_batches(explode, batch_format="pyarrow")


class MediaFetchStage:
    """Actor stage: resolve media_ref → payload bytes.

    Production: a pyarrow.fs.S3FileSystem opened once in __init__
    (GDAL analog: /vsis3 VSI handles, port/cpl_vsil_s3.cpp). Sandbox:
    a deterministic payload generator keyed by the ref hash."""

    def __init__(self, payload_size: int = 1024, real: bool = False):
        self.payload_size = payload_size
        self.real = real
        # real=True would open the filesystem handle here, once per actor

    def _fake_payload(self, ref: str) -> bytes:
        seed = hashlib.blake2b(ref.encode(), digest_size=8).digest()
        rng = np.random.default_rng(np.frombuffer(seed, dtype=np.uint64)[0])
        return rng.integers(0, 256, self.payload_size, dtype=np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("no object store in sandbox; plug "
                                      "pyarrow.fs here")
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        payloads = [self._fake_payload(r) for r in refs]
        return batch.append_column("payload", pa.array(payloads, type=pa.binary()))


class MediaDecodeStage:
    """Actor stage: payload bytes → FEATURE_DIM float32 feature vector.

    Production: PIL/soundfile/av decode + model featurize loaded ONCE in
    __init__. Sandbox featurize: 16-bin byte histogram, L1-normalized —
    deterministic, type-correct, same shape contract as a real encoder."""

    def __init__(self, real: bool = False):
        self.real = real
        self.bins = np.linspace(0, 256, FEATURE_DIM + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("image/audio codecs not present in "
                                      "sandbox; plug PIL/av decode here")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        # vectorized across the whole batch: one concatenated byte view,
        # bin index = byte // bin_width (identical to np.histogram with
        # the equal-width self.bins), one bincount over row*DIM+bin
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        width = 256 // FEATURE_DIM
        idx = (flat // width).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.bincount(rows * FEATURE_DIM + idx,
                             minlength=n * FEATURE_DIM).reshape(n, FEATURE_DIM)
        feats = counts.astype(np.float32)
        feats /= np.maximum(1.0, feats.sum(axis=1, keepdims=True))
        out = batch.drop_columns(["payload"])  # big binary stays out of downstream
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), FEATURE_DIM))


def media_features(docs: ray.data.Dataset,
                   fetch_concurrency: Union[int, Tuple[int, int]] = (1, 8),
                   decode_concurrency: Union[int, Tuple[int, int]] = (1, 8),
                   batch_size: int = 256) -> ray.data.Dataset:
    """docs (with spans) → per-media-span feature rows.

    batch_size is small because payload bytes dominate block memory
    (SURVEY.md 'large binary payloads need small batches')."""
    spans = explode_media_spans(docs)
    # sandbox fetch/decode are stateless fakes -> plain task pools (no
    # actor spin-up); production (real=True) should pass the CLASS with
    # concurrency so the fs handle / model loads once per actor
    fetched = spans.map_batches(MediaFetchStage(), batch_format="pyarrow",
                                batch_size=batch_size)
    return fetched.map_batches(MediaDecodeStage(), batch_format="pyarrow",
                               batch_size=batch_size)


class MediaResizeStage:
    """Actor/task stage: image payload -> resized payload.

    Production: PIL decode + resize + re-encode, model-ready shapes.
    Sandbox: deterministic stub — byte payload is strided down to the
    target byte budget (same schema/flow contract as a real resize:
    binary in, smaller binary out, width/height metadata columns)."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 real: bool = False):
        self.target_w, self.target_h = target_w, target_h
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("PIL not present in sandbox; plug "
                                      "Image.open/resize here")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        budget = self.target_w * self.target_h // 64  # stub byte budget
        out = []
        for p in payloads:
            b = np.frombuffer(p, dtype=np.uint8)
            stride = max(1, len(b) // max(1, budget))
            out.append(b[::stride].tobytes())
        batch = batch.drop_columns(["payload"]).append_column(
            "payload", pa.array(out, type=pa.binary()))
        batch = batch.append_column(
            "width", pa.array(np.full(len(batch), self.target_w, dtype=np.int32)))
        return batch.append_column(
            "height", pa.array(np.full(len(batch), self.target_h, dtype=np.int32)))


class FrameSampleStage:
    """Actor/task stage: video payload -> one row per sampled frame.

    Production: av/ffmpeg keyframe iteration loaded once per actor.
    Sandbox: the payload is treated as `n_frames` fixed-size chunks and
    every `every_n`-th chunk becomes a frame row (real explode shape:
    row multiplication, frame_idx column, bounded batch sizes)."""

    def __init__(self, frame_bytes: int = 256, every_n: int = 4,
                 real: bool = False):
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("av/ffmpeg not present in sandbox")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        rows, frames, fidx = [], [], []
        for i, p in enumerate(payloads):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                rows.append(i)
                fidx.append(f)
                frames.append(p[f * self.frame_bytes:(f + 1) * self.frame_bytes])
        out = batch.drop_columns(["payload"]).take(
            pa.array(np.asarray(rows, dtype=np.int64)))
        out = out.append_column("frame_idx",
                                pa.array(np.asarray(fidx, dtype=np.int32)))
        return out.append_column("frame", pa.array(frames, type=pa.binary()))
