"""Baseline JPEG codec in pure numpy (ITU-T T.81 / JFIF 1.02).

Spec re-derivation of the baseline sequential DCT process — the GDAL
JPEG driver's engine-facing contract (`frmts/jpeg/jpgdataset.cpp`)
without libjpeg: Annex K quantization + Huffman tables (quality-scaled
with the IJG formula), 8x8 FDCT/IDCT as orthonormal matrix products
(vectorized over all blocks), DPCM DC + run-length AC entropy coding,
byte stuffing, restart markers, JFIF APP0.

Encode: grayscale or RGB 4:4:4 (BT.601 YCbCr), optional restart
interval. Decode: baseline SOF0 with arbitrary sampling factors
(4:4:4, 4:2:0, 4:2:2 — nearest-neighbor chroma upsample), RSTn
resync, APPn/COM skip. Progressive (SOF2) and arithmetic coding are
rejected with clear errors.

JPEG is lossy: roundtrip parity is bounded-error (pinned in tests),
unlike the bit-exact PNG/BMP/WAV/GeoTIFF codecs in this package.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# (bits counts per code length 1..16, symbol values) — Annex K.3
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8x8 DCT-II basis
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (jcparam.c formula — public libjpeg API
    semantics, re-derived)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _build_huffman(counts: List[int], symbols: List[int]):
    """Canonical Huffman: -> {symbol: (code, length)} and the decode
    structures (min/max code per length + symbol offsets)."""
    codes = {}
    code = 0
    k = 0
    decode = []  # (length, first_code, {code-first: symbol})
    for length in range(1, 17):
        n = counts[length - 1]
        first = code
        for _ in range(n):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        decode.append((first, code))  # valid range [first, code)
        code <<= 1
    return codes, decode, symbols


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def pad(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> Tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial -> DCT coefficients, JPEG scaling (x4 of the
    orthonormal transform is already folded into the basis usage)."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coefs, _C)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), \
        rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _encode_block(bw_: _BitWriter, block: np.ndarray, pred: int,
                  dct: dict, act: dict) -> int:
    diff = int(block[0]) - pred
    pred = int(block[0])
    size, bits = _magnitude(diff)
    code, ln = dct[size]
    bw_.write(code, ln)
    if size:
        bw_.write(bits, size)
    run = 0
    nz = np.nonzero(block[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            bw_.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = act[(run << 4) | size]
        bw_.write(code, ln)
        bw_.write(bits, size)
        run = 0
    if last < 63:
        code, ln = act[0x00]  # EOB
        bw_.write(code, ln)
    return pred


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                restart_interval: int = 0,
                subsample: str = "444") -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    subsample: "444" (full-resolution chroma) or "420" (2x2 luma MCU,
    box-averaged chroma — the common camera/web layout)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if not gray and arr.shape[2] != 3:
        raise ValueError("JPEG encode supports gray or RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")

    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)
    dc_l, _, _ = _build_huffman(*_DC_LUMA)
    ac_l, _, _ = _build_huffman(*_AC_LUMA)
    dc_c, _, _ = _build_huffman(*_DC_CHROMA)
    ac_c, _, _ = _build_huffman(*_AC_CHROMA)

    if gray:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    elif subsample == "444":
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
        factors = [(1, 1), (1, 1), (1, 1)]
    else:  # 420: box-average chroma over even-padded dims
        ycc = _rgb_to_ycbcr(arr)
        he, we = h + (h & 1), w + (w & 1)
        pad = np.empty((he, we, 3))
        pad[:h, :w] = ycc
        pad[h:, :w] = ycc[-1:, :]
        pad[:, w:] = pad[:, w - 1:w]
        cb = pad[..., 1].reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = pad[..., 2].reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        planes = [ycc[..., 0], cb, cr]
        factors = [(2, 2), (1, 1), (1, 1)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    comp_zz, comp_grid = [], []
    for ci, plane in enumerate(planes):
        fx, fy = factors[ci]
        bw2, bh2 = mcus_x * fx, mcus_y * fy
        ph, pw = plane.shape
        padded = np.empty((bh2 * 8, bw2 * 8))
        padded[:ph, :pw] = plane - 128.0
        padded[ph:, :pw] = padded[ph - 1:ph, :pw]
        padded[:, pw:] = padded[:, pw - 1:pw]
        blocks = padded.reshape(bh2, 8, bw2, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        coefs = _fdct_blocks(blocks)
        q = qluma if ci == 0 else qchroma
        zz = np.round(coefs / q).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG]
        comp_zz.append(zz)
        comp_grid.append((bw2, bh2))

    bw_ = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw_.pad()
                bw_.buf += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                pred = [0] * len(planes)
            for ci, zz in enumerate(comp_zz):
                fx, fy = factors[ci]
                gw, _gh = comp_grid[ci]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(fy):
                    for bx in range(fx):
                        idx = (my * fy + by) * gw + (mx * fx + bx)
                        pred[ci] = _encode_block(bw_, zz[idx], pred[ci],
                                                 dct, act)
            mcu_count += 1
    bw_.pad()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 aspect, no thumb

    def dqt(tid, table):
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + \
            bytes(int(v) for v in table.reshape(64)[_ZIGZAG])

    out += dqt(0, qluma)
    if not gray:
        out += dqt(1, qchroma)

    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        fx, fy = factors[ci]
        sof += bytes([ci + 1, (fx << 4) | fy, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + sof

    def dht(cls, tid, spec):
        counts, syms = spec
        return b"\xff\xc4" + struct.pack(">HB", 19 + len(syms),
                                         (cls << 4) | tid) + \
            bytes(counts) + bytes(syms)

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos        # byte position
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # marker: stop feeding real bits
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Drop partial byte and any stuffing up to the next marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                return
            self.pos += 1


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huffman(br: _BitReader, decode, symbols) -> int:
    code = 0
    offset = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        first, end = decode[length - 1]
        if first <= code < end:
            return symbols[offset + (code - first)]
        offset += end - first
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W) uint8 gray or (H, W, 3) uint8 RGB."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                prec_id = seg[sp]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.frombuffer(seg, dtype=np.uint8, count=64,
                                  offset=sp + 1).astype(np.int32)
                qtables[prec_id & 0xF] = t[_UNZIGZAG].reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls_id = seg[sp]
                counts = list(seg[sp + 1:sp + 17])
                nsym = sum(counts)
                syms = list(seg[sp + 17:sp + 17 + nsym])
                _codes, decode, symbols = _build_huffman(counts, syms)
                htables[(cls_id >> 4, cls_id & 0xF)] = (decode, symbols)
                sp += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker {marker:#x})")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tbl = seg[1 + 2 * i:3 + 2 * i]
                scan_comps.append({"id": cid, "dc": tbl >> 4, "ac": tbl & 0xF})
            pos += seglen
            break
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h

    for c in comps:
        sc = next(s for s in scan_comps if s["id"] == c["id"])
        c["dct"] = htables[(0, sc["dc"])]
        c["act"] = htables[(1, sc["ac"])]
        c["qt"] = qtables[c["q"]]
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["zz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    br = _BitReader(buf, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_to_marker()
                if br.pos + 1 < len(buf) and buf[br.pos] == 0xFF and \
                        0xD0 <= buf[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        size = _decode_huffman(br, *c["dct"])
                        diff = _extend(br.receive(size), size) if size else 0
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(br, *c["act"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["zz"][row * c["bw"] + col] = blk
            mcu_count += 1

    planes = []
    for c in comps:
        coefs = c["zz"][:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        coefs *= c["qt"]
        spatial = _idct_blocks(coefs) + 128.0
        bh, bw2 = c["bh"], c["bw"]
        plane = spatial.reshape(bh, bw2, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw2 * 8)
        # upsample to full resolution (nearest)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
    if len(planes) == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported JPEG component count {len(planes)}")
