"""VICAR (JPL/MIPL) image reader.

Reference frmts/vicar/vicardataset.cpp: a space-separated
`KEY=VALUE` text label of LBLSIZE bytes (first token), data at
LBLSIZE + NLB×RECSIZE with NBB binary-prefix bytes per record,
FORMAT ∈ {BYTE, HALF, FULL, REAL, DOUB, COMP}, ORG ∈ {BSQ, BIL,
BIP}, INTFMT LOW/HIGH and REALFMT RIEEE/IEEE/VAX — VAX F/D floats
converted by word-swap + exponent re-bias (the MIL-STD-1753 layout
the reference's vicar conversion implements)."""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def parse_vicar_label(buf: bytes) -> Dict[str, str]:
    m = re.match(rb"LBLSIZE\s*=\s*(\d+)", buf)
    if not m:
        raise ValueError("not a VICAR label")
    lblsize = int(m.group(1))
    text = buf[:lblsize].decode("latin-1", "replace")
    out: Dict[str, str] = {}
    for km in re.finditer(
            r"(\w+)\s*=\s*('(?:[^']*)'|\([^)]*\)|[^\s]+)", text):
        k, v = km.group(1), km.group(2)
        if k not in out:  # first (system) occurrence wins
            out[k] = v.strip("'")
    return out


def identify_vicar(buf: bytes) -> bool:
    return bool(re.match(rb"LBLSIZE\s*=\s*\d+", buf[:64]))


def _vax_f_to_ieee(raw: np.ndarray) -> np.ndarray:
    """VAX F-float (word-swapped, bias 128, hidden 0.1f) -> float64."""
    u = raw.view(np.uint32)
    sw = ((u & 0xFFFF) << 16) | (u >> 16)
    s = (sw >> 31) & 1
    e = (sw >> 23) & 0xFF
    f = sw & 0x7FFFFF
    val = (0.5 + f.astype(np.float64) / (1 << 24)) * \
        np.exp2(e.astype(np.float64) - 128.0)
    val = np.where(e == 0, 0.0, val)
    return np.where(s == 1, -val, val)


def _vax_d_to_ieee(raw: np.ndarray) -> np.ndarray:
    """VAX D-float: four word-swapped 16-bit words, bias 128,
    55-bit mantissa."""
    u = raw.view(np.uint64)
    w0 = u & 0xFFFF
    w1 = (u >> 16) & 0xFFFF
    w2 = (u >> 32) & 0xFFFF
    w3 = (u >> 48) & 0xFFFF
    sw = (w0 << 48) | (w1 << 32) | (w2 << 16) | w3
    s = (sw >> 63) & 1
    e = (sw >> 55) & 0xFF
    f = sw & ((np.uint64(1) << np.uint64(55)) - np.uint64(1))
    val = (0.5 + f.astype(np.float64) / float(1 << 56)) * \
        np.exp2(e.astype(np.float64) - 128.0)
    val = np.where(e == 0, 0.0, val)
    return np.where(s == 1, -val, val)


def decode_vicar(buf: bytes) -> Tuple[np.ndarray, Dict]:
    lbl = parse_vicar_label(buf)
    lblsize = int(lbl["LBLSIZE"])
    nl = int(lbl.get("NL", "0"))
    ns = int(lbl.get("NS", "0"))
    nb = int(lbl.get("NB", "1"))
    nbb = int(lbl.get("NBB", "0"))
    nlb = int(lbl.get("NLB", "0"))
    recsize = int(lbl.get("RECSIZE", "0"))
    fmt = lbl.get("FORMAT", "BYTE").upper()
    org = lbl.get("ORG", "BSQ").upper()
    intfmt = lbl.get("INTFMT", "LOW").upper()
    realfmt = lbl.get("REALFMT", "RIEEE").upper()

    iorder = "<" if intfmt == "LOW" else ">"
    rorder = "<" if realfmt == "RIEEE" else ">"
    vax = realfmt == "VAX"
    spec = {"BYTE": ("u1", 1), "HALF": (iorder + "i2", 2),
            "FULL": (iorder + "i4", 4), "REAL": (rorder + "f4", 4),
            "DOUB": (rorder + "f8", 8), "COMP": (rorder + "c8", 8)}[fmt]
    dt = np.dtype(spec[0])
    isz = spec[1]

    start = lblsize + nlb * recsize
    n_recs = {"BSQ": nl * nb, "BIL": nl * nb, "BIP": nl}[org]
    rec_data = ns * isz * (nb if org == "BIP" else 1)
    rows = np.frombuffer(buf, np.uint8, count=n_recs * (nbb + rec_data),
                         offset=start).reshape(n_recs, nbb + rec_data)
    payload = rows[:, nbb:].tobytes()

    if vax:
        if fmt == "REAL":
            flat = _vax_f_to_ieee(
                np.frombuffer(payload, "<u4")).astype(np.float32)
        elif fmt == "DOUB":
            flat = _vax_d_to_ieee(np.frombuffer(payload, "<u8"))
        elif fmt == "COMP":
            parts = _vax_f_to_ieee(
                np.frombuffer(payload, "<u4")).astype(np.float32)
            flat = parts[0::2] + 1j * parts[1::2]
            flat = flat.astype(np.complex64)
        else:
            flat = np.frombuffer(payload, dt)
    else:
        flat = np.frombuffer(payload, dt)
    flat = flat.astype(flat.dtype.newbyteorder("="))

    if org == "BSQ":
        arr = flat.reshape(nb, nl, ns).transpose(1, 2, 0)
    elif org == "BIL":
        arr = flat.reshape(nl, nb, ns).transpose(0, 2, 1)
    else:  # BIP
        arr = flat.reshape(nl, ns, nb)
    arr = np.ascontiguousarray(arr)
    if nb == 1:
        arr = arr[:, :, 0]

    meta: Dict = {"label": lbl}
    # MAP property georeferencing (vicar keyword set)
    if "MAP_SCALE" in lbl or "MAP_RESOLUTION" in lbl:
        meta["projection"] = lbl.get("MAP_PROJECTION_TYPE")
    return arr, meta
