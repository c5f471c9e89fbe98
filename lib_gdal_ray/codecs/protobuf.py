"""Minimal protobuf wire codec (varint / length-delimited / fixed),
enough to carry Mapbox Vector Tiles. Hand-rolled from the public
protobuf encoding spec — no protobuf library in this container.

Wire types: 0 = varint, 1 = 64-bit, 2 = length-delimited, 5 = 32-bit.
Field header = (field_number << 3) | wire_type, itself a varint.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple


def write_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement like protobuf int64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def tag(field: int, wire: int) -> bytes:
    return write_varint((field << 3) | wire)


def field_varint(field: int, value: int) -> bytes:
    return tag(field, 0) + write_varint(value)


def field_bytes(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + write_varint(len(payload)) + payload


def field_string(field: int, s: str) -> bytes:
    return field_bytes(field, s.encode("utf-8"))


def field_packed(field: int, values) -> bytes:
    body = b"".join(write_varint(v) for v in values)
    return field_bytes(field, body)


def field_double(field: int, v: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", v)


def field_float(field: int, v: float) -> bytes:
    return tag(field, 5) + struct.pack("<f", v)


def iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message body.
    Length-delimited values come back as bytes; varints as int;
    fixed64/fixed32 as raw bytes (caller unpacks)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = read_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            yield field, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def read_packed_varints(payload: bytes) -> List[int]:
    out = []
    pos = 0
    while pos < len(payload):
        v, pos = read_varint(payload, pos)
        out.append(v)
    return out
