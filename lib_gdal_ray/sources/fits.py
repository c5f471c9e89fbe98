"""FITS reader/writer in pure numpy (no cfitsio).

Parity target: frmts/fits/fitsdataset.cpp over the public FITS 4.0
standard: 2880-byte header blocks of 80-char "KEY     = value" cards,
BITPIX 8/16/32/64/-32/-64, big-endian data, rows stored bottom-up
(GDAL flips), BZERO/BSCALE as offset/scale (with the unsigned-integer
convention BZERO=2^(bits-1) mapping to UInt16/UInt32 like GDAL does),
BLANK as nodata, multiple HDUs (the first IMAGE HDU with NAXIS>=2
wins, like GDAL's subdataset-less open), and non-standard cards
surfacing as metadata.
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

BLOCK = 2880

_BITPIX_DTYPE = {8: np.uint8, 16: ">i2", 32: ">i4", 64: ">i8",
                 -32: ">f4", -64: ">f8"}

_STANDARD = {"SIMPLE", "BITPIX", "EXTEND", "END", "XTENSION", "PCOUNT",
             "GCOUNT", "COMMENT", "HISTORY", "BZERO", "BSCALE", "BLANK"}


def identify_fits(buf: bytes) -> bool:
    return buf[:9] == b"SIMPLE  ="


def _parse_header(buf: bytes, pos: int) -> Tuple[Dict[str, str], int]:
    """Cards from one header unit -> (dict, next position)."""
    cards: Dict[str, str] = {}
    while pos < len(buf):
        block = buf[pos:pos + BLOCK]
        pos += BLOCK
        done = False
        for i in range(0, BLOCK, 80):
            card = block[i:i + 80].decode("latin-1", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or "=" not in card[8:10]:
                continue
            val = card[10:]
            if "/" in val and not val.lstrip().startswith("'"):
                val = val.split("/")[0]
            elif val.lstrip().startswith("'"):
                q = val.find("'", val.find("'") + 1)
                val = val[:q + 1] if q > 0 else val
            cards[key] = val.strip().strip("'").strip()
        if done:
            break
    return cards, pos


def decode_fits(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_fits(buf):
        raise ValueError("not a FITS file")
    pos = 0
    first = True
    while pos < len(buf):
        cards, pos = _parse_header(buf, pos)
        if not first and cards.get("XTENSION", "").upper() not in (
                "IMAGE",):
            # skip a non-image extension's data
            naxis = int(cards.get("NAXIS", 0) or 0)
            bitpix = abs(int(cards.get("BITPIX", 8) or 8))
            n = 1
            for i in range(1, naxis + 1):
                n *= int(cards.get(f"NAXIS{i}", 0) or 0)
            n *= bitpix // 8
            n += int(cards.get("PCOUNT", 0) or 0)
            pos += ((n + BLOCK - 1) // BLOCK) * BLOCK
            first = False
            continue
        first = False
        naxis = int(cards.get("NAXIS", 0) or 0)
        if naxis < 2:
            # empty primary HDU: skip (no data when NAXIS=0)
            n = 1 if naxis else 0
            for i in range(1, naxis + 1):
                n *= int(cards.get(f"NAXIS{i}", 0) or 0)
            n *= abs(int(cards.get("BITPIX", 8))) // 8
            pos += ((n + BLOCK - 1) // BLOCK) * BLOCK if n else 0
            continue
        bitpix = int(cards["BITPIX"])
        w = int(cards["NAXIS1"])
        h = int(cards["NAXIS2"])
        nbands = int(cards.get("NAXIS3", 1) or 1) if naxis >= 3 else 1
        dt = _BITPIX_DTYPE[bitpix]
        count = w * h * nbands
        arr = np.frombuffer(buf, dt, count, pos).astype(
            {8: np.uint8, 16: np.int16, 32: np.int32, 64: np.int64,
             -32: np.float32, -64: np.float64}[bitpix])
        if nbands > 1:
            arr = arr.reshape(nbands, h, w)[:, ::-1]
            arr = np.moveaxis(arr, 0, -1)  # registry channel-last
        else:
            arr = arr.reshape(h, w)[::-1]  # FITS rows are bottom-up
        meta: dict = {}
        bzero = float(cards.get("BZERO", 0) or 0)
        bscale = float(cards.get("BSCALE", 1) or 1)
        # GDAL maps the unsigned conventions onto unsigned types
        if bscale == 1 and bitpix == 16 and bzero == 32768:
            arr = (arr.astype(np.int32) + 32768).astype(np.uint16)
        elif bscale == 1 and bitpix == 32 and bzero == 2147483648:
            arr = (arr.astype(np.int64) + 2147483648).astype(np.uint32)
        elif bzero != 0 or bscale != 1:
            meta["offset"] = bzero
            meta["scale"] = bscale
        if "BLANK" in cards:
            meta["nodata"] = float(cards["BLANK"])
        # georef (fitsdataset.cpp:3396 LoadGeoreferencing): angular WCS
        # with planet radius — gt = CD matrix × (DEG2RAD × A_RADIUS)
        if "LN" in cards.get("CTYPE1", "") and "A_RADIUS" in cards \
                and all(k in cards for k in ("CRPIX1", "CRVAL1",
                                             "CRPIX2", "CRVAL2")):
            a_radius = float(cards["A_RADIUS"])
            if "CDELT1" in cards and "PC1_1" in cards:
                cdelt1 = float(cards["CDELT1"])
                cdelt2 = float(cards["CDELT2"])
                cd = (cdelt1 * float(cards["PC1_1"]),
                      cdelt1 * float(cards["PC1_2"]),
                      cdelt2 * float(cards["PC2_1"]),
                      cdelt2 * float(cards["PC2_2"]))
            elif "CDELT1" in cards:
                cd = (float(cards["CDELT1"]), 0.0,
                      0.0, float(cards["CDELT2"]))
            else:
                cd = tuple(float(cards.get(f"CD{i}_{j}", 0))
                           for i in (1, 2) for j in (1, 2))
            radfac = math.pi / 180.0 * a_radius
            gt1 = cd[0] * radfac
            gt2 = cd[1] * radfac
            gt4 = cd[2] * radfac
            gt5 = -cd[3] * radfac
            crval1 = float(cards["CRVAL1"])
            if crval1 > 180.0:
                crval1 -= 180.0
            gt0 = crval1 * radfac - gt1 * (float(cards["CRPIX1"]) - 0.5)
            gt3 = -gt5 * (float(cards["CRPIX2"]) - 0.5)
            meta["transform"] = (gt0, gt1, gt2, gt3, gt4, gt5)
        meta["metadata"] = {k: v for k, v in cards.items()
                            if k not in _STANDARD
                            and not k.startswith(("NAXIS", "CRPIX",
                                                  "CRVAL", "CDELT",
                                                  "CTYPE", "CUNIT"))}
        return arr, meta
    raise ValueError("FITS: no image HDU found")


def encode_fits(arr: np.ndarray, metadata: Optional[dict] = None,
                nodata: Optional[float] = None,
                offset: float = 0.0, scale: float = 1.0) -> bytes:
    """(H, W[, C]) array -> single-HDU FITS bytes."""
    if arr.ndim == 3:
        planes = np.moveaxis(arr, -1, 0)
    else:
        planes = arr[None]
    nb, h, w = planes.shape
    dt = arr.dtype
    bzero = 0.0
    if dt == np.uint8:
        bitpix, cast = 8, np.uint8
    elif dt == np.int16:
        bitpix, cast = 16, ">i2"
    elif dt == np.uint16:
        bitpix, cast, bzero = 16, ">i2", 32768
    elif dt == np.int32:
        bitpix, cast = 32, ">i4"
    elif dt == np.uint32:
        bitpix, cast, bzero = 32, ">i4", 2147483648
    elif dt == np.int64:
        bitpix, cast = 64, ">i8"
    elif dt == np.float32:
        bitpix, cast = -32, ">f4"
    else:
        bitpix, cast = -64, ">f8"
    cards: List[str] = [
        "SIMPLE  =                    T / conforms to FITS standard",
        f"BITPIX  = {bitpix:>20d} / array data type",
        f"NAXIS   = {(3 if nb > 1 else 2):>20d} / number of array dimensions",
        f"NAXIS1  = {w:>20d}",
        f"NAXIS2  = {h:>20d}",
    ]
    if nb > 1:
        cards.append(f"NAXIS3  = {nb:>20d}")
    if bzero:
        cards.append(f"BZERO   = {bzero:>20.1f}")
    if offset != 0.0 or scale != 1.0:
        cards.append(f"BZERO   = {offset!r:>20}".replace("'", " "))
        cards.append(f"BSCALE  = {scale!r:>20}".replace("'", " "))
    if nodata is not None and bitpix > 0:
        cards.append(f"BLANK   = {int(nodata):>20d}")
    for k, v in (metadata or {}).items():
        cards.append(f"{str(k)[:8]:<8}= '{v}'")
    cards.append("END")
    header = "".join(c.ljust(80)[:80] for c in cards).encode("latin-1")
    header += b" " * (-len(header) % BLOCK)
    if bzero:
        data = (planes[:, ::-1].astype(np.int64)
                - int(bzero)).astype(cast).tobytes()
    else:
        data = planes[:, ::-1].astype(cast).tobytes()
    data += b"\x00" * (-len(data) % BLOCK)
    return header + data
