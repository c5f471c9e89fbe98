"""Multimodal span processing: media fetch / decode / featurize stages.

Media travels as opaque refs (and binary payloads) inside the
interleaved `spans` column (BASELINE.json input_hint). Round 3 gives
the decode path REAL codecs — PNG / BMP / WAV / RWV frame container
implemented from their public specs in pure numpy + stdlib zlib
(`lib_gdal_ray.codecs`; GDAL analog `frmts/png/pngdataset.cpp`,
`frmts/bmp/bmpdataset.cpp`) — so fetch → decode → featurize/resize/
frame-sample runs on genuine encoded bytes end-to-end. The Ray-side
plumbing is unchanged: span explode is a vectorized Arrow list flatten,
fetch/decode are actor-pool `map_batches` stages with per-actor init,
small batch sizes for large binary payloads, typed output schemas.

`real=True` on the fetch stage still marks the remote-filesystem seam
(no object store in the sandbox); `codec=True` generates real encoded
payloads deterministically from the media_ref, which the downstream
`real=True` decode/resize/frame stages decode with the real codecs.
Formats needing external libs (JPEG/H.264) remain out; unknown magics
raise ValueError at the sniff.
"""

from __future__ import annotations

import hashlib
from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..codecs import decode_media
from ..codecs.container import encode_frames
from ..codecs.png import decode_png, encode_png
from ..codecs.wav import encode_wav

FEATURE_DIM = 16


def _parse_ref_ids(refs: np.ndarray):
    """media_ref 's3://media/{kind}/{pad}/{d}_{s}.bin' -> (d, s) int64.

    Vectorized string slicing via numpy char ops on the basename."""
    base = np.char.rpartition(refs.astype(str), "/")[:, 2]      # '{d}_{s}.bin'
    stem = np.char.partition(base, ".")[:, 0]                   # '{d}_{s}'
    parts = np.char.partition(stem, "_")
    return parts[:, 0].astype(np.int64), parts[:, 2].astype(np.int64)


def synth_image(d: int, s: int) -> np.ndarray:
    """Deterministic gray image for span (d, s): closed-form pixels so a
    SQL oracle can mirror the decoded values (BASELINE parity scheme)."""
    w = 8 + d % 8
    h = 8 + (d + s) % 5
    y, x = np.mgrid[0:h, 0:w]
    return ((x + 3 * y + d + 7 * s) % 256).astype(np.uint8)


def synth_audio(d: int, s: int) -> np.ndarray:
    """Deterministic int16 PCM samples for span (d, s), closed form."""
    n = 64 + (d % 16) * 8
    i = np.arange(n, dtype=np.int64)
    return (((i * (1 + d % 13) + 5 * s) % 509) - 254).astype(np.int16)


def synth_video_frames(d: int, s: int):
    """Deterministic 8x8 gray frames for span (d, s), closed form."""
    nf = 2 + d % 4
    y, x = np.mgrid[0:8, 0:8]
    return [((x + 3 * y + d + 7 * s + 11 * f) % 256).astype(np.uint8)
            for f in range(nf)]


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

    def __init__(self, payload_size: int = 1024, real: bool = False,
                 codec: bool = False):
        self.payload_size = payload_size
        self.real = real
        self.codec = codec
        # real=True would open the filesystem handle here, once per actor

    def _fake_payload(self, ref: str) -> bytes:
        seed = hashlib.blake2b(ref.encode(), digest_size=8).digest()
        rng = np.random.default_rng(np.frombuffer(seed, dtype=np.uint64)[0])
        return rng.integers(0, 256, self.payload_size, dtype=np.uint8).tobytes()

    def _codec_payload(self, kind: str, d: int, s: int) -> bytes:
        """A REAL encoded file (PNG/BMP/WAV/RWV) with closed-form
        content. Every third image span is a BMP — decode stats are
        content-based, so the SQL oracle pins BOTH image codecs."""
        if kind == "image":
            if d % 3 == 0:
                from ..codecs.bmp import encode_bmp

                return encode_bmp(synth_image(d, s))
            return encode_png(synth_image(d, s), filter_type="adaptive")
        if kind == "audio":
            return encode_wav(synth_audio(d, s), sample_rate=16000)
        if kind == "video":
            return encode_frames(synth_video_frames(d, s))
        raise ValueError(f"non-media span kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("no object store in sandbox; plug "
                                      "pyarrow.fs here")
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        if self.codec:
            kinds = batch["kind"].to_numpy(zero_copy_only=False)
            ds, ss = _parse_ref_ids(np.asarray(refs)) if len(refs) else \
                (np.empty(0, np.int64), np.empty(0, np.int64))
            payloads = [self._codec_payload(k, int(d), int(s))
                        for k, d, s in zip(kinds, ds, ss)]
        else:
            payloads = [self._fake_payload(r) for r in refs]
        return batch.append_column("payload", pa.array(payloads, type=pa.binary()))


class MediaDecodeStage:
    """Actor stage: payload bytes → FEATURE_DIM float32 feature vector.

    real=True decodes genuinely (PNG/BMP/WAV/RWV via `codecs`, sniffed
    by magic bytes) and emits per-span value statistics
    (n_values/val_sum/val_min/val_max over decoded pixels or samples)
    plus a 16-bin histogram feature over the decoded byte view. A model
    featurizer would load ONCE here in __init__ (actor-pool contract).
    real=False keeps the round-2 byte-histogram fake for payloads that
    are not encoded files."""

    def __init__(self, real: bool = False):
        self.real = real
        self.bins = np.linspace(0, 256, FEATURE_DIM + 1)

    def _decode_batch(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        nv = np.empty(n, np.int64)
        vsum = np.empty(n, np.int64)
        vmin = np.empty(n, np.int32)
        vmax = np.empty(n, np.int32)
        feats = np.zeros((n, FEATURE_DIM), np.float32)
        width = 256 // FEATURE_DIM
        for i, p in enumerate(payloads):
            kind, arr, _meta = decode_media(p)
            if kind == "video":
                arr = np.stack(arr)
            vals = arr.astype(np.int64).ravel()
            nv[i] = vals.size
            vsum[i] = vals.sum()
            vmin[i] = vals.min() if vals.size else 0
            vmax[i] = vals.max() if vals.size else 0
            bytes_view = np.frombuffer(np.ascontiguousarray(arr).tobytes(),
                                       dtype=np.uint8)
            h = np.bincount(bytes_view // width, minlength=FEATURE_DIM)
            feats[i] = h / max(1, bytes_view.size)
        out = batch.drop_columns(["payload"])
        out = out.append_column("n_values", pa.array(nv))
        out = out.append_column("val_sum", pa.array(vsum))
        out = out.append_column("val_min", pa.array(vmin))
        out = out.append_column("val_max", pa.array(vmax))
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), FEATURE_DIM))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            return self._decode_batch(batch)
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


def media_decode_stats(docs: ray.data.Dataset,
                       batch_size: int = 256) -> ray.data.Dataset:
    """Real-codec pipeline: explode media spans → fetch REAL encoded
    payloads (PNG/WAV/RWV) → decode with the real codecs → per-span
    value statistics. Every stage streams; payload bytes never cross a
    stage boundary past the decode."""
    spans = explode_media_spans(docs)
    fetched = spans.map_batches(MediaFetchStage(codec=True),
                                batch_format="pyarrow", batch_size=batch_size)
    return fetched.map_batches(MediaDecodeStage(real=True),
                               batch_format="pyarrow", batch_size=batch_size)


def media_resize_stats(docs: ray.data.Dataset, target_w: int = 4,
                       target_h: int = 4, method: str = "nearest",
                       batch_size: int = 256) -> ray.data.Dataset:
    """Real-codec image path: image spans → real PNG fetch → decode +
    resize + PNG re-encode → second real decode of the RESIZED payload
    → stats. Round-trips the PNG encoder twice per span."""
    import pyarrow.compute as pc

    spans = explode_media_spans(docs)
    images = spans.filter(expr="kind == 'image'")
    fetched = images.map_batches(MediaFetchStage(codec=True),
                                 batch_format="pyarrow", batch_size=batch_size)
    resized = fetched.map_batches(
        MediaResizeStage(target_w=target_w, target_h=target_h, real=True,
                         method=method),
        batch_format="pyarrow", batch_size=batch_size)
    return resized.map_batches(MediaDecodeStage(real=True),
                               batch_format="pyarrow", batch_size=batch_size)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Pixel-center nearest-neighbor resize (GDAL GRA_NearestNeighbour
    convention: src = floor((t+0.5)*scale)). Pure fancy indexing."""
    h, w = arr.shape[:2]
    sx = np.minimum((np.floor((np.arange(tw) + 0.5) * w / tw)).astype(np.int64), w - 1)
    sy = np.minimum((np.floor((np.arange(th) + 0.5) * h / th)).astype(np.int64), h - 1)
    return arr[sy[:, None], sx[None, :]]


def resize_bilinear(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Pixel-center bilinear resize, edge-clamped (GRA_Bilinear
    convention), vectorized over the full target grid."""
    h, w = arr.shape[:2]
    fx = (np.arange(tw) + 0.5) * w / tw - 0.5
    fy = (np.arange(th) + 0.5) * h / th - 0.5
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    ax = np.clip(fx - x0, 0.0, 1.0)
    ay = np.clip(fy - y0, 0.0, 1.0)
    a = arr.astype(np.float64)
    if a.ndim == 3:
        ax = ax[:, None]
        ay = ay[:, None]
    top = a[y0[:, None], x0[None, :]] * (1 - ax) + a[y0[:, None], x1[None, :]] * ax
    bot = a[y1[:, None], x0[None, :]] * (1 - ax) + a[y1[:, None], x1[None, :]] * ax
    out = top * (1 - ay[:, None] if a.ndim == 2 else ay[:, None, :]) \
        + bot * (ay[:, None] if a.ndim == 2 else ay[:, None, :])
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class MediaResizeStage:
    """Actor/task stage: image payload -> resized payload.

    real=True: genuine decode (PNG/BMP) → nearest or bilinear resize
    (vectorized numpy, GDAL pixel-center conventions) → PNG re-encode.
    real=False keeps the round-2 byte-stride stub for non-file payloads."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 real: bool = False, method: str = "nearest"):
        self.target_w, self.target_h = target_w, target_h
        self.real = real
        self.method = method

    def _resize_batch(self, batch: pa.Table) -> pa.Table:
        kernel = resize_nearest if self.method == "nearest" else resize_bilinear
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        out = []
        for p in payloads:
            kind, arr, _meta = decode_media(p)  # sniffing: PNG or BMP
            if kind != "image":
                raise ValueError(f"MediaResizeStage got {kind} payload")
            out.append(encode_png(kernel(arr, self.target_w, self.target_h)))
        batch = batch.drop_columns(["payload"]).append_column(
            "payload", pa.array(out, type=pa.binary()))
        batch = batch.append_column(
            "width", pa.array(np.full(len(batch), self.target_w, dtype=np.int32)))
        return batch.append_column(
            "height", pa.array(np.full(len(batch), self.target_h, dtype=np.int32)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            return self._resize_batch(batch)
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

    real=True: genuine RWV-container parse, every `every_n`-th frame
    decoded (real PNG path) and re-emitted as an encoded PNG `frame`
    column — the av/ffmpeg keyframe-iteration contract with a real
    per-frame decode. real=False keeps the fixed-size byte-chunk stub."""

    def __init__(self, frame_bytes: int = 256, every_n: int = 4,
                 real: bool = False):
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        self.real = real

    def _sample_real(self, batch: pa.Table) -> pa.Table:
        from ..codecs.container import decode_frames
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        rows, frames, fidx, fsum = [], [], [], []
        for i, p in enumerate(payloads):
            decoded = decode_frames(p)
            for f in range(0, len(decoded), self.every_n):
                rows.append(i)
                fidx.append(f)
                frames.append(encode_png(decoded[f]))
                fsum.append(int(decoded[f].astype(np.int64).sum()))
        out = batch.drop_columns(["payload"]).take(
            pa.array(np.asarray(rows, dtype=np.int64)))
        out = out.append_column("frame_idx",
                                pa.array(np.asarray(fidx, dtype=np.int32)))
        out = out.append_column("frame_sum",
                                pa.array(np.asarray(fsum, dtype=np.int64)))
        return out.append_column("frame", pa.array(frames, type=pa.binary()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            return self._sample_real(batch)
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


class AudioFeatureStage:
    """Actor/task stage: decoded-audio DSP features per span.

    Real signal processing on really-decoded WAV samples: integer-exact
    energy (sum of squares) and zero-crossing count (SQL-mirrorable),
    plus spectral centroid over an rfft magnitude spectrum (pytest-
    pinned vs a direct numpy reference). The FFT is one vectorized
    np.fft.rfft per span — no Python inner loops."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        energy = np.zeros(n, np.int64)
        zcr = np.zeros(n, np.int64)
        centroid = np.zeros(n, np.float64)
        for i, p in enumerate(payloads):
            kind, samples, _meta = decode_media(p)
            if kind != "audio":
                raise ValueError(f"AudioFeatureStage got {kind} payload")
            s = samples.astype(np.int64).ravel()
            energy[i] = int((s * s).sum())
            # sign-change count, zeros treated as positive (matches the
            # SQL mirror: sign = CASE WHEN v >= 0 THEN 1 ELSE -1 END)
            sign = np.where(s >= 0, 1, -1)
            zcr[i] = int((sign[1:] != sign[:-1]).sum())
            mag = np.abs(np.fft.rfft(s.astype(np.float64)))
            denom = mag.sum()
            freqs = np.arange(len(mag), dtype=np.float64)
            centroid[i] = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
        out = batch.drop_columns(["payload"])
        out = out.append_column("energy", pa.array(energy))
        out = out.append_column("zero_crossings", pa.array(zcr))
        return out.append_column("spectral_centroid", pa.array(centroid))


class ImageFeatureStage:
    """Actor/task stage: decoded-image statistics per span.

    Integer-exact pixel moments (sum, sum of squares) and a horizontal
    edge count (|v[x+1]-v[x]| > threshold) — all SQL-mirrorable over
    the closed-form synthetic images; gradient magnitude via Sobel is
    pytest-pinned. Vectorized numpy per image."""

    def __init__(self, edge_threshold: int = 32):
        self.edge_threshold = edge_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        psum = np.zeros(n, np.int64)
        psq = np.zeros(n, np.int64)
        edges = np.zeros(n, np.int64)
        grad = np.zeros(n, np.float64)
        for i, p in enumerate(payloads):
            kind, arr, _meta = decode_media(p)
            if kind != "image":
                raise ValueError(f"ImageFeatureStage got {kind} payload")
            v = arr.astype(np.int64)
            if v.ndim == 3:
                v = v.sum(axis=2) // v.shape[2]  # integer luma
            psum[i] = int(v.sum())
            psq[i] = int((v * v).sum())
            dx = np.abs(np.diff(v, axis=1))
            edges[i] = int((dx > self.edge_threshold).sum())
            # Sobel magnitude (mean) on the interior
            if v.shape[0] >= 3 and v.shape[1] >= 3:
                f = v.astype(np.float64)
                gx = (f[:-2, 2:] + 2 * f[1:-1, 2:] + f[2:, 2:]
                      - f[:-2, :-2] - 2 * f[1:-1, :-2] - f[2:, :-2])
                gy = (f[2:, :-2] + 2 * f[2:, 1:-1] + f[2:, 2:]
                      - f[:-2, :-2] - 2 * f[:-2, 1:-1] - f[:-2, 2:])
                grad[i] = float(np.sqrt(gx * gx + gy * gy).mean())
        out = batch.drop_columns(["payload"])
        out = out.append_column("pixel_sum", pa.array(psum))
        out = out.append_column("pixel_sq_sum", pa.array(psq))
        out = out.append_column("edge_count", pa.array(edges))
        return out.append_column("sobel_mean", pa.array(grad))


def media_dsp_features(docs: ray.data.Dataset, kind: str,
                       batch_size: int = 256) -> ray.data.Dataset:
    """Real-codec DSP pipeline: media spans of one kind → real encoded
    payloads → decode + per-span audio/image features."""
    spans = explode_media_spans(docs)
    sel = spans.filter(expr=f"kind == '{kind}'")
    fetched = sel.map_batches(MediaFetchStage(codec=True),
                              batch_format="pyarrow", batch_size=batch_size)
    stage = AudioFeatureStage() if kind == "audio" else ImageFeatureStage()
    return fetched.map_batches(stage, batch_format="pyarrow",
                               batch_size=batch_size)
