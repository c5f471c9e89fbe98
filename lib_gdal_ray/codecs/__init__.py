"""Pure-numpy + stdlib media codecs (no PIL/ffmpeg needed).

The sandbox has no image/audio libraries, but several real formats are
fully implementable from their public specs with numpy + the stdlib
(`zlib`, `struct`): PNG (RFC 2083 / W3C PNG spec), BMP (BITMAPINFOHEADER),
WAV (RIFF PCM), and a trivial multi-frame container (`RWV0`) whose
frames are real PNGs. These replace the round-2 `NotImplementedError`
seams in `stages/media.py` with working codecs — the GDAL analog is the
frmts/png + frmts/bmp + generic RasterIO contract (reference
`frmts/png/pngdataset.cpp`, `frmts/bmp/bmpdataset.cpp`), re-expressed
as batch codec kernels behind Ray Data actor-pool stages.

`sniff(payload)` dispatches on magic bytes; `decode_media` returns a
(kind, array, meta) triple uniform across formats.
"""

from .png import encode_png, decode_png
from .bmp import encode_bmp, decode_bmp
from .wav import encode_wav, decode_wav
from .jpeg import encode_jpeg, decode_jpeg
from .container import encode_frames, decode_frames
from .gif import encode_gif, decode_gif

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
WAV_MAGIC = b"RIFF"
RWV_MAGIC = b"RWV0"
JPEG_MAGIC = b"\xff\xd8\xff"
GIF_MAGIC = b"GIF8"


def sniff(payload: bytes) -> str:
    """Magic-byte format sniff:
    'png' | 'jpeg' | 'bmp' | 'gif' | 'wav' | 'rwv' | 'unknown'."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:3] == JPEG_MAGIC:
        return "jpeg"
    if payload[:4] == GIF_MAGIC and payload[4:6] in (b"7a", b"9a"):
        return "gif"
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == RWV_MAGIC:
        return "rwv"
    return "unknown"


def decode_media(payload: bytes):
    """Decode any supported payload.

    Returns (kind, array, meta):
      image  -> (H, W) or (H, W, C) uint8 pixels, meta {width, height, channels}
      audio  -> (n,) or (n, ch) int16 samples, meta {sample_rate, channels}
      video  -> list of (H, W[, C]) uint8 frames, meta {n_frames, width, height}
    Raises ValueError for unknown magics (the caller decides whether to
    skip or fail the row).
    """
    fmt = sniff(payload)
    if fmt in ("png", "jpeg"):
        arr = decode_png(payload) if fmt == "png" else decode_jpeg(payload)
        h, w = arr.shape[:2]
        c = 1 if arr.ndim == 2 else arr.shape[2]
        return "image", arr, {"width": w, "height": h, "channels": c}
    if fmt in ("bmp", "gif"):
        arr = decode_bmp(payload) if fmt == "bmp" else decode_gif(payload)[0]
        h, w = arr.shape[:2]
        c = 1 if arr.ndim == 2 else arr.shape[2]
        return "image", arr, {"width": w, "height": h, "channels": c}
    if fmt == "wav":
        samples, rate = decode_wav(payload)
        ch = 1 if samples.ndim == 1 else samples.shape[1]
        return "audio", samples, {"sample_rate": rate, "channels": ch}
    if fmt == "rwv":
        frames = decode_frames(payload)
        h, w = frames[0].shape[:2] if frames else (0, 0)
        return "video", frames, {"n_frames": len(frames), "width": w, "height": h}
    raise ValueError(f"unknown media payload (first bytes {payload[:8]!r})")
