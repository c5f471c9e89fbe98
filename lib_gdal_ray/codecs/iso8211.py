"""ISO/IEC 8211 (DDF) parser — the container under S-57 ENC cells.

Re-derivation of frmts/iso8211/ (ddfmodule.cpp leader/entry-map
handling, ddffielddefn.cpp array-descriptor + format-control
expansion, ddfrecord.cpp leader-'R' header reuse) from the public
ISO/IEC 8211:1994 layout:

- 24-byte leader: [0:5] record length, [5] interchange level,
  [6] leader id ('L' DDR, 'D' data, 'R' data w/ reused header),
  [12:17] field-area base, [20:24] entry map (size-of-length,
  size-of-position, reserved, size-of-tag).
- directory: (tag, length, position) triplets until FT (0x1e).
- DDR field definition: controls, name, array descriptor
  ("A!B!C", leading '*' = repeating group), format controls
  ("(b11,2b14,A(8),B(40),I,R)").
- subfield types: A/I/R ascii (fixed width or UT/FT-delimited),
  B(bits) raw bitstring, b1w/b2w little-endian unsigned/signed
  binary of w bytes, b4w IEEE float of w bytes.

Pure driver-side parsing; S-57 cells are small (KB..MB) so a cell
is one Ray work unit (sources/s57.py fans out per cell file).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

UT = 0x1F
FT = 0x1E


class DDFFieldDefn:
    __slots__ = ("tag", "name", "labels", "repeating", "formats")

    def __init__(self, tag: str, name: str, labels: List[str],
                 repeating: bool, formats: List[Tuple[str, Optional[int]]]):
        self.tag = tag
        self.name = name
        self.labels = labels
        self.repeating = repeating
        # one (kind, width) per label; kind in A I R B bu bs f
        self.formats = formats


def _expand_formats(fmt: str) -> List[Tuple[str, Optional[int]]]:
    """'(b11,2b14,A(8),3(A,I))' -> flat [(kind, width), ...]."""
    s = fmt.strip()
    if s.startswith("(") and s.endswith(")"):
        s = s[1:-1]
    out: List[Tuple[str, Optional[int]]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == ",":
            i += 1
            continue
        rep = 0
        while i < n and s[i].isdigit():
            rep = rep * 10 + int(s[i])
            i += 1
        rep = rep or 1
        if i >= n:
            break
        c = s[i]
        if c == "(":  # parenthesized group
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            inner = _expand_formats(s[i:j])
            out.extend(inner * rep)
            i = j
            continue
        if c == "b":  # binary: b<type digit><width digit(s)>
            t = s[i + 1]
            j = i + 2
            w = 0
            while j < n and s[j].isdigit():
                w = w * 10 + int(s[j])
                j += 1
            kind = {"1": "bu", "2": "bs", "4": "f", "5": "f"}.get(t, "bu")
            out.extend([(kind, w)] * rep)
            i = j
            continue
        # ascii types A/I/R/S/C or bitstring B, optional (width)
        kind = c
        i += 1
        width: Optional[int] = None
        if i < n and s[i] == "(":
            j = s.index(")", i)
            arg = s[i + 1:j]
            width = int(arg) if arg.isdigit() else None
            i = j + 1
        if kind == "B" and width is not None:
            width = (width + 7) // 8  # bits -> bytes
        out.extend([(kind, width)] * rep)
    return out


def _parse_leader(buf: bytes, off: int):
    # SRP/ASRP writers fill unknown lengths with '^' — extent is then
    # computed from the directory (the DDFModule tolerance)
    raw_len = buf[off:off + 5]
    reclen = 0 if not raw_len.strip().isdigit() else int(raw_len)
    leader_id = chr(buf[off + 6])
    raw_base = buf[off + 12:off + 17]
    if raw_base.strip().isdigit():
        base = int(raw_base)
        szlen = int(buf[off + 20:off + 21])
        szpos = int(buf[off + 21:off + 22])
        sztag = int(buf[off + 23:off + 24])
    else:
        # fully '^'-filled leader (SRP/ADRG data records): reuse the
        # PREVIOUS record's directory geometry — signalled to the
        # caller with base < 0 (iter_records resolves it)
        base, szlen, szpos, sztag = -1, 0, 0, 0
    return reclen, leader_id, base, szlen, szpos, sztag


def _parse_directory(buf: bytes, off: int, szlen: int, szpos: int,
                     sztag: int) -> Tuple[List[Tuple[str, int, int]], int]:
    ents: List[Tuple[str, int, int]] = []
    step = sztag + szlen + szpos
    i = off
    cum = 0  # ISO 8211 variant C.1.5.1: size-only entries (szpos == 0),
    while buf[i] != FT:  # field positions are the running length sum
        tag = buf[i:i + sztag].decode("ascii")
        ln = int(buf[i + sztag:i + sztag + szlen])
        pos = int(buf[i + sztag + szlen:i + step]) if szpos else cum
        cum += ln
        ents.append((tag, ln, pos))
        i += step
    return ents, i + 1


def parse_ddr(buf: bytes) -> Tuple[Dict[str, DDFFieldDefn], int]:
    reclen, lid, base, szlen, szpos, sztag = _parse_leader(buf, 0)
    if lid != "L":
        raise ValueError("not an ISO 8211 file (no DDR leader)")
    ents, _ = _parse_directory(buf, 24, szlen, szpos, sztag)
    defns: Dict[str, DDFFieldDefn] = {}
    for tag, ln, pos in ents:
        data = buf[base + pos:base + pos + ln]
        parts = data.rstrip(bytes([FT])).split(bytes([UT]))
        # parts: controls+name, array descriptor, format controls
        name = parts[0][9:].decode("latin-1") if len(parts[0]) > 9 else ""
        labels: List[str] = []
        repeating = False
        formats: List[Tuple[str, Optional[int]]] = []
        if len(parts) >= 2 and parts[1]:
            desc = parts[1].decode("latin-1")
            if desc.startswith("*"):
                repeating = True
                desc = desc[1:]
            labels = desc.split("!") if desc else []
        if len(parts) >= 3 and parts[2]:
            formats = _expand_formats(parts[2].decode("latin-1"))
        if labels and formats:
            # cycle formats to match label count
            while len(formats) < len(labels):
                formats.append(formats[len(formats) % len(formats)])
        defns[tag] = DDFFieldDefn(tag, name, labels, repeating, formats)
    return defns, reclen


def decode_field(defn: DDFFieldDefn, data: bytes) -> List[Dict[str, object]]:
    """Decode one field instance into repeated label groups."""
    if not defn.labels:
        return [{"": data.rstrip(bytes([FT]))}]
    groups: List[Dict[str, object]] = []
    n = len(data)
    # lexical-level-2 fields terminate UT/FT with a trailing NUL; GDAL's
    # bug-#1526 heuristic: buffer ending (UT|FT, 0x00) => double-byte mode
    dbcs = n >= 2 and data[n - 2] in (UT, FT) and data[n - 1] == 0
    if dbcs and data[n - 2] == FT:
        n -= 2
    elif n and data[n - 1] == FT:  # binary subfields may contain FT/UT
        n -= 1                     # bytes, so only the trailing FT counts
    pos = 0
    while pos < n:
        g: Dict[str, object] = {}
        for label, (kind, width) in zip(defn.labels, defn.formats):
            if pos >= n:
                break
            if kind in ("bu", "bs"):
                raw = data[pos:pos + (width or 1)]
                pos += width or 1
                v = int.from_bytes(raw, "little", signed=(kind == "bs"))
                g[label] = v
            elif kind == "f":
                raw = data[pos:pos + (width or 4)]
                pos += width or 4
                g[label] = struct.unpack("<f" if (width or 4) == 4 else "<d",
                                         raw)[0]
            elif kind == "B":
                g[label] = data[pos:pos + (width or 1)]
                pos += width or 1
            else:  # A / I / R / S / C ascii
                if width:
                    raw = data[pos:pos + width]
                    pos += width
                elif dbcs:  # delimiter is the 2-byte (UT, 0x00) sequence
                    j = pos
                    while j + 1 < n and not (data[j] == UT
                                             and data[j + 1] == 0):
                        j += 1
                    if j + 1 < n:
                        raw, pos = data[pos:j], j + 2
                    else:
                        raw, pos = data[pos:n], n
                else:
                    j = pos
                    while j < n and data[j] != UT:
                        j += 1
                    raw = data[pos:j]
                    pos = j + 1 if j < n else j
                if kind == "I":
                    s = raw.decode("latin-1").strip()
                    g[label] = int(s) if s else None
                elif kind == "R":
                    s = raw.decode("latin-1").strip()
                    g[label] = float(s) if s else None
                else:
                    g[label] = raw  # caller decodes per lexical level
        if g:
            groups.append(g)
        if not defn.repeating:
            break
    return groups


class DDFRecord:
    __slots__ = ("fields",)

    def __init__(self):
        # tag -> list of raw bytes (a tag can appear more than once)
        self.fields: Dict[str, List[bytes]] = {}

    def raw(self, tag: str) -> Optional[bytes]:
        v = self.fields.get(tag)
        return v[0] if v else None


def iter_records(buf: bytes):
    """Yield (defns_view, DDFRecord) for every data record."""
    defns, reclen = parse_ddr(buf)
    off = reclen
    n = len(buf)
    reuse = None  # (base, dirents) for leader 'R' reuse
    while off + 24 <= n:
        reclen, lid, base, szlen, szpos, sztag = _parse_leader(buf, off)
        if base < 0:  # '^'-filled trailing padding (SRP/ADRG) — EOF
            break
        if lid == "R" and reuse is None:
            ents, _ = _parse_directory(buf, off + 24, szlen, szpos, sztag)
            reuse = (base, ents)
        if reuse is not None and lid == "R":
            base, ents = reuse
        else:
            ents, _ = _parse_directory(buf, off + 24, szlen, szpos, sztag)
        rec = DDFRecord()
        for tag, ln, pos in ents:
            rec.fields.setdefault(tag, []).append(
                buf[off + base + pos:off + base + pos + ln])
        yield rec
        if reclen == 0:  # variant leaders: extent = header + field data
            reclen = base + (max(pos + ln for _, ln, pos in ents)
                             if ents else 0)
        off += reclen
    return defns


def read_module(buf: bytes):
    """Parse a whole DDF module -> (field defns, [DDFRecord])."""
    defns, reclen = parse_ddr(buf)
    recs = list(iter_records(buf))
    return defns, recs
