"""Minimal flatbuffers wire-format codec (pure python, stdlib only).

Just enough of the public FlatBuffers binary format
(https://flatbuffers.dev/internals/) to read and write the two small
fixed schemas FlatGeobuf uses (Header/Column/Crs and
Feature/Geometry): little-endian scalars, vtable-indirected tables,
length-prefixed vectors and strings. The Builder follows the standard
back-to-front construction algorithm (same layout rules as the
reference generated code under
`ogr/ogrsf_frmts/flatgeobuf/flatbuffers/`, re-derived from the spec —
no code copied).
"""

from __future__ import annotations

import struct
from typing import List, Optional


# --------------------------- reading ---------------------------------

def _u8(b, o):
    return b[o]


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _i32(b, o):
    return struct.unpack_from("<i", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _u64(b, o):
    return struct.unpack_from("<Q", b, o)[0]


def _f64(b, o):
    return struct.unpack_from("<d", b, o)[0]


class Table:
    """Reader for one table: field access by schema field id."""

    __slots__ = ("buf", "pos", "vt", "vt_len")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.vt = pos - _i32(buf, pos)
        self.vt_len = _u16(buf, self.vt)

    def _field(self, fid: int) -> int:
        """absolute position of field fid, or 0 if absent."""
        slot = 4 + fid * 2
        if slot + 2 > self.vt_len:
            return 0
        rel = _u16(self.buf, self.vt + slot)
        return self.pos + rel if rel else 0

    def scalar(self, fid: int, fmt: str, default):
        p = self._field(fid)
        if not p:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def bool_(self, fid: int, default=False) -> bool:
        return bool(self.scalar(fid, "<B", 1 if default else 0))

    def _indirect(self, fid: int) -> int:
        p = self._field(fid)
        if not p:
            return 0
        return p + _u32(self.buf, p)

    def string(self, fid: int) -> Optional[str]:
        p = self._indirect(fid)
        if not p:
            return None
        n = _u32(self.buf, p)
        return self.buf[p + 4:p + 4 + n].decode("utf-8")

    def vector(self, fid: int):
        """-> (element_start, count) or (0, 0)."""
        p = self._indirect(fid)
        if not p:
            return 0, 0
        return p + 4, _u32(self.buf, p)

    def vector_bytes(self, fid: int) -> bytes:
        start, n = self.vector(fid)
        if not start:
            return b""
        return bytes(self.buf[start:start + n])

    def vector_scalars(self, fid: int, fmt: str, size: int) -> list:
        start, n = self.vector(fid)
        if not start:
            return []
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, start))

    def table(self, fid: int) -> Optional["Table"]:
        p = self._indirect(fid)
        if not p:
            return None
        return Table(self.buf, p)

    def table_vector(self, fid: int) -> List["Table"]:
        start, n = self.vector(fid)
        out = []
        for i in range(n):
            ep = start + 4 * i
            out.append(Table(self.buf, ep + _u32(self.buf, ep)))
        return out


def root(buf: bytes, size_prefixed: bool = False) -> Table:
    off = 4 if size_prefixed else 0
    return Table(buf, off + _u32(buf, off))


# --------------------------- writing ---------------------------------

class Builder:
    """Back-to-front flatbuffer builder (standard algorithm).

    Positions ("offsets") are distances from the END of the buffer;
    uoffset fields store forward distances so they stay valid when the
    front padding is stripped by finish().
    """

    def __init__(self, initial: int = 1024):
        self.buf = bytearray(initial)
        self.head = initial
        self.minalign = 1
        self._vt: Optional[list] = None
        self._obj_start = 0

    # -- low-level

    def offset(self) -> int:
        return len(self.buf) - self.head

    def _grow(self, needed: int):
        while self.head < needed:
            n = len(self.buf)
            self.buf = bytearray(n) + self.buf
            self.head += n

    def _pad(self, n: int):
        self._grow(n)
        self.head -= n
        self.buf[self.head:self.head + n] = b"\x00" * n

    def prep(self, size: int, additional: int):
        if size > self.minalign:
            self.minalign = size
        align = (~(self.offset() + additional) + 1) & (size - 1)
        self._grow(align + size + additional)
        if align:
            self._pad(align)

    def push(self, fmt: str, size: int, value):
        self.prep(size, 0)
        self.head -= size
        struct.pack_into(fmt, self.buf, self.head, value)

    def push_uoffset(self, target: int):
        self.prep(4, 0)
        self.head -= 4
        struct.pack_into("<I", self.buf, self.head,
                         self.offset() - target)

    # -- strings / vectors

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        self.prep(4, len(data) + 1)
        self._pad(1)  # null terminator
        self.head -= len(data)
        self.buf[self.head:self.head + len(data)] = data
        self.push("<I", 4, len(data))
        return self.offset()

    def bytes_vector(self, data: bytes) -> int:
        self.prep(4, len(data))
        self.head -= len(data)
        self.buf[self.head:self.head + len(data)] = data
        self.push("<I", 4, len(data))
        return self.offset()

    def scalar_vector(self, fmt: str, size: int, values) -> int:
        n = len(values)
        self.prep(4, size * n)
        self.prep(size, size * n)
        self.head -= size * n
        struct.pack_into(f"<{n}{fmt.lstrip('<')}", self.buf, self.head,
                         *values)
        self.push("<I", 4, n)
        return self.offset()

    def offset_vector(self, offsets: List[int]) -> int:
        self.prep(4, 4 * len(offsets))
        for off in reversed(offsets):
            self.push_uoffset(off)
        self.push("<I", 4, len(offsets))
        return self.offset()

    # -- tables

    def start_table(self, n_fields: int):
        self._vt = [0] * n_fields
        self._obj_start = self.offset()

    def field_scalar(self, fid: int, fmt: str, size: int, value,
                     default=0):
        if value == default:
            return
        self.push(fmt, size, value)
        self._vt[fid] = self.offset()

    def field_offset(self, fid: int, target: Optional[int]):
        if not target:
            return
        self.push_uoffset(target)
        self._vt[fid] = self.offset()

    def end_table(self) -> int:
        vt = self._vt
        self._vt = None
        # soffset slot
        self.prep(4, 0)
        self.head -= 4
        table_pos = self.offset()
        while vt and vt[-1] == 0:
            vt.pop()
        for fpos in reversed(vt):
            self.push("<H", 2, table_pos - fpos if fpos else 0)
        self.push("<H", 2, table_pos - self._obj_start)
        self.push("<H", 2, (len(vt) + 2) * 2)
        vt_pos = self.offset()
        struct.pack_into("<i", self.buf, len(self.buf) - table_pos,
                         vt_pos - table_pos)
        return table_pos

    def finish(self, root_table: int,
               size_prefix: bool = False) -> bytes:
        self.prep(self.minalign, 8 if size_prefix else 4)
        self.push_uoffset(root_table)
        out = bytes(self.buf[self.head:])
        if size_prefix:
            out = struct.pack("<I", len(out)) + out
        return out
