"""FlatGeobuf (FGB) vector format: distributed read/write.

Pure-python implementation of the public FlatGeobuf spec
(https://flatgeobuf.org, flatgeobuf/src/fbs/*.fbs): magic
``fgb\\x03fgb\\x00``, a size-prefixed flatbuffer Header, an optional
packed Hilbert R-tree index (40-byte nodes: 4×f64 bbox + u64 offset,
levels stored top-down, leaves last, leaf offsets = byte offsets into
the feature section), then size-prefixed Feature flatbuffers.

Reference parity: `ogr/ogrsf_frmts/flatgeobuf/` — the packed R-tree
layout and Hilbert ordering follow `packedrtree.h:78-105` /
`packedrtree.cpp` (itself based on the public flatbush design); the
flatbuffer schemas follow the published .fbs files. Fresh
implementation over `codecs/flatbuf.py` — no generated code.

Ray shape:
* write — one map_batches pass encodes features + bboxes, a Dataset
  sort orders them by descending Hilbert value (the spec's order,
  giving the packed tree its locality), per-block remote tasks write
  shard files, and the driver stitches header + index + shards with
  streaming copies. The index build holds 40 B/feature (same bound
  as the reference's in-memory PackedRTree).
* read — the packed index (when present) yields every feature's byte
  offset from ONE leaf-level read, so the feature section splits into
  byte ranges read by parallel map_batches tasks; without an index a
  driver-side size-prefix walk (4 B per feature) plans the same
  splits.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..codecs import flatbuf as fb
from ..geom import wkb as W

MAGIC = b"fgb\x03fgb\x00"
NODE_SIZE_BYTES = 40
DEFAULT_NODE_SIZE = 16

# GeometryType enum (fgb header.fbs)
GT_UNKNOWN, GT_POINT, GT_LINESTRING, GT_POLYGON = 0, 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6

# ColumnType enum (fgb header.fbs)
CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING, CT_BINARY = (
    2, 5, 7, 10, 11, 14)

_ARROW_TO_CT = [
    (pa.types.is_boolean, CT_BOOL),
    (pa.types.is_int32, CT_INT),
    (pa.types.is_int64, CT_LONG),
    (pa.types.is_floating, CT_DOUBLE),
    (pa.types.is_string, CT_STRING),
    (pa.types.is_binary, CT_BINARY),
]


def _col_type(t: pa.DataType) -> int:
    for pred, ct in _ARROW_TO_CT:
        if pred(t):
            return ct
    raise ValueError(f"unsupported FGB column type {t}")


# ------------------------- hilbert ------------------------------------

HILBERT_MAX = (1 << 16) - 1


def hilbert_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 16-bit-per-axis Hilbert index (the public flatbush /
    packedrtree.cpp:74-130 bit-interleave formulation)."""
    x = x.astype(np.uint32)
    y = y.astype(np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                  (2, 0x33333333), (1, 0x55555555)):
        mm = np.uint32(m)
        i0 = (i0 | (i0 << np.uint32(sh))) & mm
        i1 = (i1 | (i1 << np.uint32(sh))) & mm
    return (i1 << np.uint32(1)) | i0


def hilbert_of_bbox(xmin, ymin, xmax, ymax, extent) -> np.ndarray:
    ex0, ey0, ex1, ey1 = extent
    w = (ex1 - ex0) or 1.0
    h = (ey1 - ey0) or 1.0
    cx = ((xmin + xmax) / 2 - ex0) / w
    cy = ((ymin + ymax) / 2 - ey0) / h
    hx = np.floor(HILBERT_MAX * cx).astype(np.uint32)
    hy = np.floor(HILBERT_MAX * cy).astype(np.uint32)
    return hilbert_u32(np.minimum(hx, HILBERT_MAX),
                       np.minimum(hy, HILBERT_MAX))


# ------------------------- geometry <-> fgb ---------------------------

def _flat(coords) -> list:
    return np.asarray(coords, dtype=float)[:, :2].ravel().tolist()


def _geom_table(b: fb.Builder, kind: str, payload) -> Tuple[int, int]:
    """Write a Geometry table; -> (table_offset, geometry_type)."""
    if kind == "point":
        xy = b.scalar_vector("d", 8, _flat(payload))
        b.start_table(8)
        b.field_offset(1, xy)
        b.field_scalar(6, "<B", 1, GT_POINT)
        return b.end_table(), GT_POINT
    if kind == "linestring":
        xy = b.scalar_vector("d", 8, _flat(payload))
        b.start_table(8)
        b.field_offset(1, xy)
        b.field_scalar(6, "<B", 1, GT_LINESTRING)
        return b.end_table(), GT_LINESTRING
    if kind == "multipoint":
        xy = b.scalar_vector("d", 8, _flat(payload))
        b.start_table(8)
        b.field_offset(1, xy)
        b.field_scalar(6, "<B", 1, GT_MULTIPOINT)
        return b.end_table(), GT_MULTIPOINT
    if kind == "polygon":
        rings = [np.asarray(r, dtype=float)[:, :2] for r in payload]
        ends = np.cumsum([len(r) for r in rings]).tolist()
        xy = b.scalar_vector(
            "d", 8, np.concatenate(rings).ravel().tolist())
        e = b.scalar_vector("I", 4, ends) if len(rings) > 1 else None
        b.start_table(8)
        if e:
            b.field_offset(0, e)
        b.field_offset(1, xy)
        b.field_scalar(6, "<B", 1, GT_POLYGON)
        return b.end_table(), GT_POLYGON
    if kind == "multilinestring":
        lines = [np.asarray(c, dtype=float)[:, :2] for c in payload]
        ends = np.cumsum([len(c) for c in lines]).tolist()
        xy = b.scalar_vector(
            "d", 8, np.concatenate(lines).ravel().tolist())
        e = b.scalar_vector("I", 4, ends) if len(lines) > 1 else None
        b.start_table(8)
        if e:
            b.field_offset(0, e)
        b.field_offset(1, xy)
        b.field_scalar(6, "<B", 1, GT_MULTILINESTRING)
        return b.end_table(), GT_MULTILINESTRING
    if kind == "multipolygon":
        parts = [_geom_table(b, "polygon", rings)[0]
                 for rings in payload]
        pv = b.offset_vector(parts)
        b.start_table(8)
        b.field_scalar(6, "<B", 1, GT_MULTIPOLYGON)
        b.field_offset(7, pv)
        return b.end_table(), GT_MULTIPOLYGON
    raise ValueError(f"unsupported FGB geometry kind {kind}")


def _pairs(xy: list) -> np.ndarray:
    return np.asarray(xy, dtype=float).reshape(-1, 2)


def _geom_to_wkb(t: fb.Table, outer_type: int) -> bytes:
    gtype = t.scalar(6, "<B", 0) or outer_type
    xy = t.vector_scalars(1, "d", 8)
    ends = t.vector_scalars(0, "I", 4)
    if gtype == GT_POINT:
        c = _pairs(xy)
        return W.points_to_wkb(c[:, 0], c[:, 1])[0]
    if gtype == GT_LINESTRING:
        return W.linestring_to_wkb(_pairs(xy))
    if gtype == GT_MULTIPOINT:
        return W.multipoint_to_wkb(_pairs(xy))
    if gtype in (GT_POLYGON, GT_MULTILINESTRING):
        coords = _pairs(xy)
        cuts = ends if ends else [len(coords)]
        pieces, prev = [], 0
        for e in cuts:
            pieces.append(coords[prev:e])
            prev = e
        if gtype == GT_POLYGON:
            return W.polygon_to_wkb(pieces)
        return W.multilinestring_to_wkb(pieces)
    if gtype == GT_MULTIPOLYGON:
        polys = []
        for part in t.table_vector(7):
            pxy = _pairs(part.vector_scalars(1, "d", 8))
            pends = part.vector_scalars(0, "I", 4) or [len(pxy)]
            rings, prev = [], 0
            for e in pends:
                rings.append(pxy[prev:e])
                prev = e
            polys.append(rings)
        return W.multipolygon_to_wkb(polys)
    raise ValueError(f"unsupported FGB geometry type {gtype}")


# ------------------------- properties ---------------------------------

def _encode_props(values: dict, cols: List[Tuple[str, int]]) -> bytes:
    out = bytearray()
    for i, (name, ct) in enumerate(cols):
        v = values.get(name)
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ct == CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == CT_INT:
            out += struct.pack("<i", int(v))
        elif ct == CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ct == CT_STRING:
            enc = str(v).encode("utf-8")
            out += struct.pack("<I", len(enc)) + enc
        elif ct == CT_BINARY:
            out += struct.pack("<I", len(v)) + bytes(v)
        else:
            raise ValueError(f"unsupported column type {ct}")
    return bytes(out)


def _decode_props(data: bytes, cols: List[Tuple[str, int]]) -> dict:
    out = {}
    pos = 0
    while pos + 2 <= len(data):
        (i,) = struct.unpack_from("<H", data, pos)
        pos += 2
        name, ct = cols[i]
        if ct == CT_BOOL:
            out[name] = bool(data[pos])
            pos += 1
        elif ct == CT_INT:
            (out[name],) = struct.unpack_from("<i", data, pos)
            pos += 4
        elif ct == CT_LONG:
            (out[name],) = struct.unpack_from("<q", data, pos)
            pos += 8
        elif ct == CT_DOUBLE:
            (out[name],) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif ct in (CT_STRING, CT_BINARY):
            (n,) = struct.unpack_from("<I", data, pos)
            pos += 4
            raw = data[pos:pos + n]
            out[name] = raw.decode("utf-8") if ct == CT_STRING else raw
            pos += n
        else:
            raise ValueError(f"unsupported column type {ct}")
    return out


def encode_feature(wkb_buf: bytes, props: dict,
                   cols: List[Tuple[str, int]]) -> bytes:
    """One size-prefixed Feature flatbuffer."""
    b = fb.Builder(256)
    kind, payload = W.parse_wkb(wkb_buf)
    geom, _gt = _geom_table(b, kind, payload)
    pdata = _encode_props(props, cols)
    pvec = b.bytes_vector(pdata) if pdata else None
    b.start_table(3)
    b.field_offset(0, geom)
    if pvec:
        b.field_offset(1, pvec)
    return b.finish(b.end_table(), size_prefix=True)


def decode_feature(buf: bytes, cols: List[Tuple[str, int]]
                   ) -> Tuple[bytes, dict]:
    t = fb.root(buf, size_prefixed=True)
    g = t.table(0)
    wkb_buf = _geom_to_wkb(g, GT_UNKNOWN) if g else None
    props = _decode_props(t.vector_bytes(1), cols)
    return wkb_buf, props


# ------------------------- header --------------------------------------

def _encode_header(name: str, envelope, geometry_type: int,
                   cols: List[Tuple[str, int]], features_count: int,
                   index_node_size: int) -> bytes:
    b = fb.Builder(512)
    col_offsets = []
    for cname, ct in cols:
        ns = b.string(cname)
        b.start_table(11)
        b.field_offset(0, ns)
        b.field_scalar(1, "<B", 1, ct)
        col_offsets.append(b.end_table())
    cvec = b.offset_vector(col_offsets) if col_offsets else None
    env = b.scalar_vector("d", 8, list(envelope)) if envelope else None
    nm = b.string(name)
    b.start_table(14)
    b.field_offset(0, nm)
    if env:
        b.field_offset(1, env)
    b.field_scalar(2, "<B", 1, geometry_type)
    if cvec:
        b.field_offset(7, cvec)
    b.field_scalar(8, "<Q", 8, features_count)
    b.field_scalar(9, "<H", 2, index_node_size,
                   default=DEFAULT_NODE_SIZE)
    return b.finish(b.end_table(), size_prefix=True)


def _decode_header(buf: bytes) -> Dict:
    t = fb.root(buf, size_prefixed=True)
    cols = [(c.string(0), c.scalar(1, "<B", 0))
            for c in t.table_vector(7)]
    return {
        "name": t.string(0),
        "envelope": t.vector_scalars(1, "d", 8),
        "geometry_type": t.scalar(2, "<B", 0),
        "columns": cols,
        "features_count": t.scalar(8, "<Q", 0),
        "index_node_size": t.scalar(9, "<H", DEFAULT_NODE_SIZE),
    }


# ------------------------- packed R-tree -------------------------------

def _level_bounds(num_items: int, node_size: int):
    """(offset, end) per level, top-down storage order
    (packedrtree.cpp generateLevelBounds)."""
    level_num = []
    n = num_items
    num_nodes = n
    level_num.append(n)
    while n != 1:
        n = (n + node_size - 1) // node_size
        num_nodes += n
        level_num.append(n)
    offsets = []
    n = num_nodes
    for size in level_num:
        n -= size
        offsets.append(n)
    return [(o, o + s) for o, s in zip(offsets, level_num)], num_nodes


def _build_index(bboxes: np.ndarray, offsets: np.ndarray,
                 node_size: int = DEFAULT_NODE_SIZE) -> bytes:
    """Packed Hilbert R-tree bytes from hilbert-sorted leaf items.
    bboxes: (n,4) [xmin,ymin,xmax,ymax]; offsets: byte offsets into
    the feature section. Vectorized level roll-up."""
    n = len(bboxes)
    bounds, num_nodes = _level_bounds(n, node_size)
    nodes_box = np.zeros((num_nodes, 4), dtype=np.float64)
    nodes_off = np.zeros(num_nodes, dtype=np.uint64)
    leaf0 = bounds[0][0]
    nodes_box[leaf0:leaf0 + n] = bboxes
    nodes_off[leaf0:leaf0 + n] = offsets
    for li in range(len(bounds) - 1):
        pos, end = bounds[li]
        newpos = bounds[li + 1][0]
        cnt = end - pos
        n_parent = (cnt + node_size - 1) // node_size
        pad = n_parent * node_size - cnt
        bb = nodes_box[pos:end]
        if pad:
            fill = np.concatenate([
                np.full((pad, 2), np.inf), np.full((pad, 2), -np.inf)],
                axis=1)
            bb = np.concatenate([bb, fill])
        bb = bb.reshape(n_parent, node_size, 4)
        pbox = np.concatenate([bb[:, :, :2].min(axis=1),
                               bb[:, :, 2:].max(axis=1)], axis=1)
        nodes_box[newpos:newpos + n_parent] = pbox
        nodes_off[newpos:newpos + n_parent] = (
            np.uint64(pos) + np.arange(n_parent, dtype=np.uint64)
            * np.uint64(node_size))
    out = np.empty(num_nodes, dtype=[("xmin", "<f8"), ("ymin", "<f8"),
                                     ("xmax", "<f8"), ("ymax", "<f8"),
                                     ("off", "<u8")])
    out["xmin"] = nodes_box[:, 0]
    out["ymin"] = nodes_box[:, 1]
    out["xmax"] = nodes_box[:, 2]
    out["ymax"] = nodes_box[:, 3]
    out["off"] = nodes_off
    return out.tobytes()


def _read_leaf_offsets(path: str, header: Dict,
                       header_end: int) -> Tuple[np.ndarray, int]:
    """Feature byte offsets from the index's leaf level (one seek+read
    of 40 B × features; no feature bytes touched). -> (offsets,
    features_section_start)."""
    n = header["features_count"]
    node_size = header["index_node_size"]
    bounds, num_nodes = _level_bounds(n, node_size)
    leaf0 = bounds[0][0]
    with open(path, "rb") as f:
        f.seek(header_end + leaf0 * NODE_SIZE_BYTES)
        raw = f.read(n * NODE_SIZE_BYTES)
    arr = np.frombuffer(raw, dtype=[("xmin", "<f8"), ("ymin", "<f8"),
                                    ("xmax", "<f8"), ("ymax", "<f8"),
                                    ("off", "<u8")])
    return (arr["off"].astype(np.int64),
            header_end + num_nodes * NODE_SIZE_BYTES)


# ------------------------- write ---------------------------------------

def write_flatgeobuf(ds: ray.data.Dataset, path: str,
                     wkb_col: str = "geometry", name: str = "layer",
                     hilbert_sort: bool = True, index: bool = True,
                     node_size: int = DEFAULT_NODE_SIZE) -> int:
    """Dataset -> single .fgb file; -> features written.

    Encode + bbox in parallel; Hilbert order via ONE Dataset sort
    (documented shuffle — it is what gives the packed tree its
    locality); per-block shard writes; driver stitches header + index
    + shards with streaming copies (single-file format ⇒ the final
    concat is serial, like the reference's writer)."""
    schema = ds.schema()
    cols = [(nm, _col_type(t)) for nm, t in
            zip(schema.names, schema.types) if nm != wkb_col]

    def enc(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_pylist()
        others = {nm: batch[nm].to_pylist() for nm, _ in cols}
        feats, boxes = [], np.empty((len(bufs), 4))
        for i, g in enumerate(bufs):
            feats.append(encode_feature(
                g, {nm: vals[i] for nm, vals in others.items()}, cols))
            boxes[i] = W.wkb_bbox([g])[0]
        return pa.table({
            "fb": pa.array(feats, type=pa.binary()),
            "xmin": pa.array(boxes[:, 0]), "ymin": pa.array(boxes[:, 1]),
            "xmax": pa.array(boxes[:, 2]), "ymax": pa.array(boxes[:, 3])})

    enc_ds = ds.map_batches(enc, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    ext = enc_ds.aggregate(Min("xmin"), Min("ymin"),
                           Max("xmax"), Max("ymax"))
    extent = (ext["min(xmin)"], ext["min(ymin)"],
              ext["max(xmax)"], ext["max(ymax)"])

    if hilbert_sort or index:
        def hkey(batch: pa.Table) -> pa.Table:
            h = hilbert_of_bbox(
                batch["xmin"].to_numpy(zero_copy_only=False),
                batch["ymin"].to_numpy(zero_copy_only=False),
                batch["xmax"].to_numpy(zero_copy_only=False),
                batch["ymax"].to_numpy(zero_copy_only=False), extent)
            return batch.append_column("__h", pa.array(
                h.astype(np.int64)))

        # spec order: DESCENDING hilbert (packedrtree.cpp hilbertSort)
        enc_ds = (enc_ds.map_batches(hkey, batch_format="pyarrow")
                  .sort("__h", descending=True))

    shard_dir = path + ".shards"
    os.makedirs(shard_dir, exist_ok=True)

    @ray.remote
    def _write_shard(i: int, block) -> dict:
        tbl = block if isinstance(block, pa.Table) else \
            pa.Table.from_batches([block])
        # Ray's sort can emit EMPTY blocks whose schema lost the data
        # columns (NOTES lesson W) — skip them before touching "fb"
        if len(tbl) == 0 or "fb" not in tbl.column_names:
            return {"path": None, "sizes": np.empty(0, dtype=np.int64),
                    "boxes": np.empty((0, 4))}
        p = os.path.join(shard_dir, f"{i:06d}.bin")
        sizes = np.empty(len(tbl), dtype=np.int64)
        with open(p, "wb") as f:
            for j, buf in enumerate(tbl["fb"].to_pylist()):
                sizes[j] = len(buf)
                f.write(buf)
        boxes = np.stack([
            tbl[c].to_numpy(zero_copy_only=False)
            for c in ("xmin", "ymin", "xmax", "ymax")], axis=1) \
            if len(tbl) else np.empty((0, 4))
        return {"path": p, "sizes": sizes, "boxes": boxes}

    refs = enc_ds.to_arrow_refs()
    manifests = ray.get([_write_shard.remote(i, r)
                         for i, r in enumerate(refs)])
    manifests = [m for m in manifests if len(m["sizes"])]
    all_sizes = (np.concatenate([m["sizes"] for m in manifests])
                 if manifests else np.empty(0, dtype=np.int64))
    n = len(all_sizes)
    offsets = np.concatenate(([0], np.cumsum(all_sizes)[:-1])) \
        if n else np.empty(0, dtype=np.int64)

    gt = GT_UNKNOWN
    header = _encode_header(name, list(extent), gt, cols, n,
                            node_size if (index and n) else 0)
    tmp = path + ".__tmp__"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        if index and n:
            boxes = np.concatenate([m["boxes"] for m in manifests])
            f.write(_build_index(boxes, offsets.astype(np.uint64),
                                 node_size))
        import shutil

        for m in manifests:
            with open(m["path"], "rb") as src:
                shutil.copyfileobj(src, f, 1 << 20)
            os.remove(m["path"])
    os.replace(tmp, path)
    try:
        os.rmdir(shard_dir)
    except OSError:
        pass
    return n


# ------------------------- read -----------------------------------------

def read_header(path: str) -> Tuple[Dict, int]:
    """-> (header dict, byte offset just past the header)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:3] != b"fgb" or magic[4:7] != b"fgb":
            raise ValueError("not a FlatGeobuf file")
        (hlen,) = struct.unpack("<I", f.read(4))
        hbuf = struct.pack("<I", hlen) + f.read(hlen)
    return _decode_header(hbuf), 8 + 4 + hlen


def read_flatgeobuf(path: str,
                    override_num_blocks: Optional[int] = None
                    ) -> ray.data.Dataset:
    """.fgb -> Dataset of (geometry WKB + property columns). Splits
    planned from the packed index when present; otherwise a size-prefix
    walk (4 B/feature reads) plans them."""
    header, hend = read_header(path)
    cols = header["columns"]
    n = header["features_count"]
    fsize = os.path.getsize(path)

    if header["index_node_size"] > 0 and n:
        offs, fstart = _read_leaf_offsets(path, header, hend)
        abs_offs = fstart + offs
    else:
        fstart = hend
        abs_offs = []
        pos = fstart
        with open(path, "rb") as f:
            while pos < fsize:
                abs_offs.append(pos)
                f.seek(pos)
                (ln,) = struct.unpack("<I", f.read(4))
                pos += 4 + ln
        abs_offs = np.asarray(abs_offs, dtype=np.int64)
        n = len(abs_offs)

    if n == 0:
        tbl = {"geometry": pa.array([], type=pa.binary())}
        for nm, ct in cols:
            tbl[nm] = pa.array([], type={
                CT_BOOL: pa.bool_(), CT_INT: pa.int32(),
                CT_LONG: pa.int64(), CT_DOUBLE: pa.float64(),
                CT_STRING: pa.string(), CT_BINARY: pa.binary()}[ct])
        return ray.data.from_arrow(pa.table(tbl))

    nb = override_num_blocks or min(64, max(1, n // 2048))
    splits = np.array_split(np.arange(n), nb)
    items = [{"start": int(abs_offs[s[0]]),
              "end": int(abs_offs[s[-1] + 1]) if s[-1] + 1 < n
              else fsize,
              "count": len(s)} for s in splits if len(s)]

    ct_to_pa = {CT_BOOL: pa.bool_(), CT_INT: pa.int32(),
                CT_LONG: pa.int64(), CT_DOUBLE: pa.float64(),
                CT_STRING: pa.string(), CT_BINARY: pa.binary()}

    def load(batch: pa.Table) -> pa.Table:
        geoms = []
        props_cols = {nm: [] for nm, _ in cols}
        with open(path, "rb") as f:
            for start, end in zip(batch["start"].to_pylist(),
                                  batch["end"].to_pylist()):
                f.seek(start)
                data = f.read(end - start)
                pos = 0
                while pos < len(data):
                    (ln,) = struct.unpack_from("<I", data, pos)
                    g, p = decode_feature(data[pos:pos + 4 + ln], cols)
                    geoms.append(g)
                    for nm, _ in cols:
                        props_cols[nm].append(p.get(nm))
                    pos += 4 + ln
        out = {"geometry": pa.array(geoms, type=pa.binary())}
        for nm, ct in cols:
            out[nm] = pa.array(props_cols[nm], type=ct_to_pa[ct])
        return pa.table(out)

    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
            load, batch_format="pyarrow")
