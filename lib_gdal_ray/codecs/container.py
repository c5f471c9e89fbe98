"""Minimal multi-frame container: 'RWV0' + frame index + PNG frames.

Stands in for a video container the way GDAL's subdataset model stands
in for multi-band/TILED formats: a length-indexed sequence of fully
real PNG frames. Layout:

    b'RWV0' | uint32 n_frames | uint32 lengths[n_frames] | frame bytes...

Frame decode is the real PNG path (`codecs.png`), so frame-sampling
stages exercise a genuine per-frame decode, not a byte-slice stub.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

from .png import decode_png, encode_png

MAGIC = b"RWV0"


def encode_frames(frames: Sequence[np.ndarray], filter_type=0) -> bytes:
    blobs = [encode_png(f, filter_type=filter_type) for f in frames]
    head = MAGIC + struct.pack("<I", len(blobs))
    head += struct.pack(f"<{len(blobs)}I", *(len(b) for b in blobs)) if blobs else b""
    return head + b"".join(blobs)


def decode_frames(buf: bytes) -> List[np.ndarray]:
    if buf[:4] != MAGIC:
        raise ValueError("not an RWV container")
    (n,) = struct.unpack_from("<I", buf, 4)
    lengths = struct.unpack_from(f"<{n}I", buf, 8) if n else ()
    pos = 8 + 4 * n
    out = []
    for ln in lengths:
        out.append(decode_png(buf[pos:pos + ln]))
        pos += ln
    return out
