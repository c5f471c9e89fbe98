"""NITF (National Imagery Transmission Format) reader — uncompressed
image segments.

Re-derivation of the reference's nitflib (frmts/nitf/):
* file header: FHDR version, HL at offset 354 (NITF02.10/NSIF01.00)
  or 394 (NITF01. / FSDWNG == 999998), then segment tables "IM"
  NUMI(3) + per-segment LISH(6)/LI(10) with data packed after the
  header (nitffile.cpp:118-135, NITFCollectSegmentInfo);
* image subheader (nitfimage.c:137-230): NROWS/NCOLS @333 after the
  42-byte ISORCE @291 (2.0 files with ISDEVT shift by 40), PVTYPE/
  IREP/ICAT/ABPP/PJUST, ICORDS + optional IGEOLO(60), comments,
  IC(2) (+COMRAT for compressed), NBANDS/XBANDS with per-band
  IREPBAND/ISUBCAT/LUTs, then ISYNC IMODE NBPR NBPC NPPBH NPPBV
  NBPP;
* block layout per IMODE B/P/R/S exactly as
  nitfimage.c:774-807 (pixel/line/band/block strides) with tightly
  packed blocks from the segment start; 1-bit data is MSB-first
  bit-packed rows; multi-byte samples are big-endian.

Supports IC in (NC, NM); compressed codecs are out of scope for the
engine's interchange path (GeoTIFF/COG is the write side)."""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np


def identify_nitf(buf: bytes) -> bool:
    return buf[:4] == b"NITF" or buf[:4] == b"NSIF"


def _field(buf: bytes, off: int, n: int) -> str:
    return buf[off:off + n].decode("latin-1", "replace")


def _num(buf: bytes, off: int, n: int) -> int:
    s = _field(buf, off, n).strip()
    return int(s) if s else 0


def decode_nitf(buf: bytes) -> Tuple[np.ndarray, Dict]:
    version = _field(buf, 0, 9)
    if version.startswith("NITF01.") or buf[280:286] == b"999998":
        hl_off = 394
    else:
        hl_off = 354
    header_len = _num(buf, hl_off, 6)

    # IM segment table
    off = hl_off + 6
    numi = _num(buf, off, 3)
    off += 3
    segs = []
    data_pos = header_len
    for _ in range(numi):
        lish = _num(buf, off, 6)
        li = _num(buf, off + 6, 10)
        segs.append((data_pos, lish, li))
        data_pos += lish + li
        off += 16
    if not segs:
        raise ValueError("NITF: no image segments")
    seg_start, seg_hlen, seg_dlen = segs[0]
    sh = buf[seg_start:seg_start + seg_hlen]
    data_start = seg_start + seg_hlen

    is20 = version.startswith(("NITF01.", "NITF02.0"))
    if is20:
        shift = 40 if _field(sh, 284, 6) == "999998" else 0
    else:
        shift = 0
    nrows = _num(sh, 333 + shift, 8)
    ncols = _num(sh, 341 + shift, 8)
    pvtype = _field(sh, 349 + shift, 3).strip()
    icords = _field(sh, 371 + shift, 1)
    off = 372 + shift
    has_igeolo = (icords not in (" ", "")) if not is20 \
        else (icords != "N")
    igeolo = None
    if has_igeolo:
        igeolo = _field(sh, off, 60)
        off += 60
    nicom = _num(sh, off, 1)
    off += 1 + 80 * nicom
    ic = _field(sh, off, 2)
    off += 2
    if ic not in ("NC", "NM"):
        raise NotImplementedError(f"NITF: compressed IC={ic!r}")
    nbands = _num(sh, off, 1)
    off += 1
    if nbands == 0:
        nbands = _num(sh, off, 5)
        off += 5
    luts: List[np.ndarray] = []
    for _ in range(nbands):
        off += 2 + 6 + 4  # IREPBAND ISUBCAT IFC+IMFLT
        nluts = _num(sh, off, 1)
        off += 1
        if nluts > 0:
            nelut = _num(sh, off, 5)
            off += 5
            lut = np.frombuffer(sh, np.uint8, count=nluts * nelut,
                                offset=off)
            luts.append(lut.reshape(nluts, nelut))
            off += nluts * nelut
        else:
            luts.append(None)
    # ISYNC(1) IMODE(1) NBPR(4) NBPC(4) NPPBH(4) NPPBV(4) NBPP(2)
    imode = _field(sh, off + 1, 1)
    nbpr = _num(sh, off + 2, 4)
    nbpc = _num(sh, off + 6, 4)
    nppbh = _num(sh, off + 10, 4)
    nppbv = _num(sh, off + 14, 4)
    nbpp = _num(sh, off + 18, 2)
    if nppbh == 0:
        nppbh = ncols
    if nppbv == 0:
        nppbv = nrows

    word = 1 if nbpp <= 8 else 2 if nbpp <= 16 else 4
    if pvtype == "SI":
        base = "i"
    elif pvtype == "R":
        base = "f"
    else:
        base = "u"
    dt = np.dtype(f">{base}{word}") if word > 1 else np.dtype(f"{base}1")

    line_bits = nppbh * nbpp
    if imode == "S":
        line_off = line_bits // 8
        block_off = line_off * nppbv
        band_off = block_off * nbpr * nbpc
        pix_stride = 1
    elif imode == "P":
        line_off = (line_bits * nbands) // 8
        band_off = word
        block_off = line_off * nppbv
        pix_stride = nbands
    elif imode == "R":
        band_off = line_bits // 8
        line_off = band_off * nbands
        block_off = line_off * nppbv
        pix_stride = 1
    else:  # B
        line_off = line_bits // 8
        band_off = nppbv * line_off
        block_off = band_off * nbands
        pix_stride = 1

    # IC=NM: a mask header precedes the data (nitfimage.c:885-960) —
    # IMDATOFF u32 + BMRLNTH/TMRLNTH/TPXCDLNTH u16s (+ pad pixel),
    # then optional per-block u32 offsets (0xFFFFFFFF = blank block)
    mask_offsets = None
    if ic == "NM":
        import struct as _st

        imdatoff, bmrlnth, _tmrlnth, tpxcdlnth = _st.unpack_from(
            ">IHHH", buf, data_start)
        mp = data_start + 10 + (tpxcdlnth + 7) // 8
        if bmrlnth == 4:
            n_entries = nbpr * nbpc * (1 if imode == "P" else nbands)
            mask_offsets = list(_st.unpack_from(
                f">{n_entries}I", buf, mp))
        data_start += imdatoff

    def block_start(bx, by, b):
        if mask_offsets is not None:
            idx = bx + by * nbpr
            if imode != "P":
                idx += b * nbpr * nbpc
                o = mask_offsets[idx]
                return None if o == 0xFFFFFFFF else data_start + o
            o = mask_offsets[idx]
            return None if o == 0xFFFFFFFF else data_start + o \
                + b * band_off
        return data_start + (bx + by * nbpr) * block_off + b * band_off

    out = np.zeros((nrows, ncols, nbands), dt.newbyteorder("="))
    for by in range(nbpc):
        for bx in range(nbpr):
            for b in range(nbands):
                start = block_start(bx, by, b)
                if start is None:
                    continue
                if nbpp == 1:
                    bits = np.unpackbits(np.frombuffer(
                        buf, np.uint8, count=(nppbh * nppbv + 7) // 8,
                        offset=start))
                    tile = bits[:nppbh * nppbv].reshape(nppbv, nppbh)
                elif imode == "P":
                    rowbytes = np.frombuffer(
                        buf, np.uint8, count=block_off, offset=start
                        - b * band_off).reshape(nppbv, line_off)
                    flat = np.frombuffer(rowbytes.tobytes(), dt)
                    tile = flat.reshape(nppbv, nppbh, nbands)[:, :, b]
                else:
                    rows = np.frombuffer(
                        buf, np.uint8,
                        count=nppbv * line_off if imode != "R"
                        else nppbv * line_off,
                        offset=start if imode != "R"
                        else data_start + (bx + by * nbpr) * block_off)
                    if imode == "R":
                        rows = rows.reshape(nppbv, nbands, band_off)
                        tile = np.frombuffer(
                            rows[:, b, :].tobytes(), dt).reshape(
                            nppbv, nppbh)
                    else:
                        tile = np.frombuffer(
                            buf, dt, count=nppbv * nppbh,
                            offset=start).reshape(nppbv, nppbh)
                y0, x0 = by * nppbv, bx * nppbh
                ny = min(nppbv, nrows - y0)
                nx = min(nppbh, ncols - x0)
                out[y0:y0 + ny, x0:x0 + nx, b] = tile[:ny, :nx]

    meta: Dict = {"version": version.strip(), "icords": icords,
                  "imode": imode, "ic": ic}
    if igeolo:
        meta["igeolo"] = igeolo
    if any(l is not None for l in luts):
        meta["luts"] = luts
    arr = out[:, :, 0] if nbands == 1 else out
    return arr, meta
