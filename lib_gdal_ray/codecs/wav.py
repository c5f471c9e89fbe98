"""WAV (RIFF PCM) codec in pure numpy + struct.

Real subset: PCM integer 8-bit (unsigned) and 16-bit (signed LE),
mono/stereo, standard 'fmt '+'data' chunk walk tolerating extra chunks
(LIST/fact). Vectorized via np.frombuffer both directions.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 | uint8 -> WAV bytes."""
    samples = np.asarray(samples)
    if samples.dtype == np.int16:
        bits = 16
    elif samples.dtype == np.uint8:
        bits = 8
    else:
        raise ValueError("WAV encode supports int16 or uint8 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    block = ch * bits // 8
    data = np.ascontiguousarray(samples.astype("<i2" if bits == 16 else "u1")).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes):
    """WAV bytes -> ((n,) or (n, ch) samples, sample_rate).

    int16 for 16-bit PCM, uint8 for 8-bit PCM.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (length,) = struct.unpack_from("<I", buf, pos + 4)
        chunk = buf[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format {audio_fmt} (PCM only)")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int16)
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).copy()
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if ch > 1:
        samples = samples[: len(samples) // ch * ch].reshape(-1, ch)
    return samples, rate
