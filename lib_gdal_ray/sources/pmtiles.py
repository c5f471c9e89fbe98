"""PMTiles v3 single-file tile archives.

Parity target: `ogr/ogrsf_frmts/pmtiles/` (the reference reads and
writes MVT tiles inside PMTiles archives). Implemented from the
public PMTiles v3 spec: 127-byte header, gzip-compressed varint
directories (tileid delta + run-length + length + offset streams),
Hilbert-curve tile ids, root/leaf directory split above the spec's
16384-entry root budget.

Ray shape: tiles are ENCODED in parallel by the MVT sink
(`sources/mvt.py`); the archive itself is one file by design, so
`write_pmtiles` is a driver-side streaming concat of the already-
written tile files (same role as the GeoJSON shard concat). Reads
fan out: the directory parses driver-side (pure metadata), then each
Ray task fetches + decodes only its own tile byte-ranges.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..codecs import protobuf as pb

_HDR_SIZE = 127
_MAGIC = b"PMTiles"


# ---------------------------------------------------------- tile ids

def _rotate(n: int, x: int, y: int, rx: int, ry: int) -> Tuple[int, int]:
    if ry == 0:
        if rx == 1:
            x, y = n - 1 - x, n - 1 - y
        x, y = y, x
    return x, y


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """Global PMTiles tile id: 4^0+...+4^(z-1) + hilbert(x, y at z)."""
    acc = (4 ** z - 1) // 3
    n = 1 << z
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rotate(s, x, y, rx, ry)
        s //= 2
    return acc + d


def tileid_to_zxy(tid: int) -> Tuple[int, int, int]:
    z = 0
    acc = 0
    while acc + 4 ** z <= tid:
        acc += 4 ** z
        z += 1
    d = tid - acc
    n = 1 << z
    x = y = 0
    s = 1
    while s < n:
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        x, y = _rotate(s, x, y, rx, ry)
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return z, x, y


# -------------------------------------------------------- directories

def _serialize_dir(entries: List[Tuple[int, int, int, int]]) -> bytes:
    """[(tileid, offset, length, run_length)] sorted by tileid ->
    spec varint layout (n, id deltas, run lengths, lengths, offsets
    with the contiguity special case)."""
    out = [pb.write_varint(len(entries))]
    last = 0
    for tid, _o, _l, _r in entries:
        out.append(pb.write_varint(tid - last))
        last = tid
    for _t, _o, _l, r in entries:
        out.append(pb.write_varint(r))
    for _t, _o, ln, _r in entries:
        out.append(pb.write_varint(ln))
    for i, (_t, off, ln, _r) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out.append(pb.write_varint(0))
        else:
            out.append(pb.write_varint(off + 1))
    return b"".join(out)


def _parse_dir(buf: bytes) -> List[Tuple[int, int, int, int]]:
    pos = 0
    n, pos = pb.read_varint(buf, pos)
    tids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = pb.read_varint(buf, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        v, pos = pb.read_varint(buf, pos)
        runs.append(v)
    for _ in range(n):
        v, pos = pb.read_varint(buf, pos)
        lens.append(v)
    for i in range(n):
        v, pos = pb.read_varint(buf, pos)
        if v == 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lens, runs))


def _header(root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
            data_off, data_len, n_tiles, n_entries, n_contents,
            min_z, max_z) -> bytes:
    h = bytearray(_HDR_SIZE)
    h[0:7] = _MAGIC
    h[7] = 3                                   # spec version
    import struct as st
    st.pack_into("<QQQQQQQQ", h, 8, root_off, root_len, meta_off, meta_len,
                 leaf_off, leaf_len, data_off, data_len)
    st.pack_into("<QQQ", h, 72, n_tiles, n_entries, n_contents)
    h[96] = 1                                  # clustered
    h[97] = 2                                  # internal compression: gzip
    h[98] = 1                                  # tile compression: none
    h[99] = 1                                  # tile type: MVT
    h[100] = min_z
    h[101] = max_z
    # bounds/center (E7 ints): whole world, center at min zoom
    st.pack_into("<iiii", h, 102, -180_0000000, -85_0000000,
                 180_0000000, 85_0000000)
    h[118] = min_z
    st.pack_into("<ii", h, 119, 0, 0)
    return bytes(h)


def _read_header(h: bytes) -> dict:
    if h[0:7] != _MAGIC or h[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    import struct as st
    vals = st.unpack_from("<QQQQQQQQ", h, 8)
    n = st.unpack_from("<QQQ", h, 72)
    return {"root_off": vals[0], "root_len": vals[1],
            "meta_off": vals[2], "meta_len": vals[3],
            "leaf_off": vals[4], "leaf_len": vals[5],
            "data_off": vals[6], "data_len": vals[7],
            "n_tiles": n[0], "n_entries": n[1], "n_contents": n[2],
            "internal_compression": h[97], "tile_compression": h[98],
            "tile_type": h[99], "min_z": h[100], "max_z": h[101]}


_MAX_ROOT_ENTRIES = 16384


def write_pmtiles(tile_dir: str, out_path: str,
                  metadata: Optional[dict] = None) -> dict:
    """{tile_dir}/{z}/{x}/{y}.pbf tree (the MVT sink's layout) -> ONE
    .pmtiles archive. Tile files were encoded in parallel upstream;
    this is the driver-side assembly: stream tiles in tileid order
    (clustered layout), build the varint directories, write header +
    gzip(root) + gzip(metadata) + gzip(leaves) + data."""
    tiles: List[Tuple[int, str]] = []
    for z_name in os.listdir(tile_dir):
        zdir = os.path.join(tile_dir, z_name)
        if not (z_name.isdigit() and os.path.isdir(zdir)):
            continue
        for x_name in os.listdir(zdir):
            xdir = os.path.join(zdir, x_name)
            if not os.path.isdir(xdir):
                continue
            for y_file in os.listdir(xdir):
                stem, ext = os.path.splitext(y_file)
                if ext not in (".pbf", ".mvt"):
                    continue
                tid = zxy_to_tileid(int(z_name), int(x_name), int(stem))
                tiles.append((tid, os.path.join(xdir, y_file)))
    if not tiles:
        raise ValueError(f"no tiles under {tile_dir}")
    tiles.sort()
    zs = [tileid_to_zxy(t)[0] for t, _ in tiles]

    entries: List[Tuple[int, int, int, int]] = []
    data = bytearray()
    seen: Dict[bytes, Tuple[int, int]] = {}
    n_contents = 0
    for tid, path in tiles:
        with open(path, "rb") as f:
            blob = f.read()
        key = blob if len(blob) <= 1 << 20 else None
        if key is not None and key in seen:
            off, ln = seen[key]
        else:
            off, ln = len(data), len(blob)
            data += blob
            n_contents += 1
            if key is not None:
                seen[key] = (off, ln)
        entries.append((tid, off, ln, 1))

    meta_blob = gzip.compress(json.dumps(metadata or {}).encode())
    if len(entries) <= _MAX_ROOT_ENTRIES:
        root = gzip.compress(_serialize_dir(entries))
        leaves = b""
        root_entries = None
    else:
        # split into leaf directories of <= root budget entries,
        # root points at leaf byte ranges
        leaves_raw = []
        root_entries = []
        step = _MAX_ROOT_ENTRIES
        off = 0
        for i in range(0, len(entries), step):
            chunk = entries[i:i + step]
            blob = gzip.compress(_serialize_dir(chunk))
            root_entries.append((chunk[0][0], off, len(blob), 0))
            leaves_raw.append(blob)
            off += len(blob)
        leaves = b"".join(leaves_raw)
        root = gzip.compress(_serialize_dir(root_entries))

    root_off = _HDR_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_blob)
    data_off = leaf_off + len(leaves)
    hdr = _header(root_off, len(root), meta_off, len(meta_blob),
                  leaf_off, len(leaves), data_off, len(data),
                  len(entries), len(entries), n_contents,
                  min(zs), max(zs))
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(hdr)
        f.write(root)
        f.write(meta_blob)
        f.write(leaves)
        f.write(data)
    os.replace(tmp, out_path)
    return {"n_tiles": len(entries), "n_contents": n_contents,
            "bytes": data_off + len(data)}


def read_pmtiles_index(path: str) -> List[Tuple[int, int, int]]:
    """Archive -> [(tileid, abs offset, length)] (driver-side
    metadata walk; no tile bytes touched)."""
    with open(path, "rb") as f:
        hdr = _read_header(f.read(_HDR_SIZE))
        f.seek(hdr["root_off"])
        root = gzip.decompress(f.read(hdr["root_len"]))
        entries = _parse_dir(root)
        out = []
        for tid, off, ln, run in entries:
            if run == 0:               # leaf pointer
                f.seek(hdr["leaf_off"] + off)
                leaf = gzip.decompress(f.read(ln))
                for t2, o2, l2, _r2 in _parse_dir(leaf):
                    out.append((t2, hdr["data_off"] + o2, l2))
            else:
                out.append((tid, hdr["data_off"] + off, ln))
    return out


def read_pmtiles_features(path: str, **kwargs) -> ray.data.Dataset:
    """Archive -> MVT feature rows (same schema as
    mvt.read_mvt_features). Directory parses driver-side; each Ray
    task reads + decodes only its own tile byte ranges."""
    from .mvt import decode_mvt_tile

    index = read_pmtiles_index(path)
    items = [{"t": t, "o": o, "l": ln} for t, o, ln in index]

    def explode(batch: pa.Table) -> pa.Table:
        cols = {"z": [], "tile_x": [], "tile_y": [], "layer": [],
                "geom_type": [], "n_parts": [], "n_points": [],
                "x": [], "y": [], "properties": []}
        with open(path, "rb") as f:
            for j in range(len(batch)):
                tid = batch["t"][j].as_py()
                f.seek(batch["o"][j].as_py())
                buf = f.read(batch["l"][j].as_py())
                zz, tx, ty = tileid_to_zxy(tid)
                for lname, layer in decode_mvt_tile(buf).items():
                    for ft in layer["features"]:
                        cols["z"].append(zz)
                        cols["tile_x"].append(tx)
                        cols["tile_y"].append(ty)
                        cols["layer"].append(lname)
                        cols["geom_type"].append(ft["type"])
                        cols["n_parts"].append(len(ft["parts"]))
                        cols["n_points"].append(
                            sum(len(p) for p in ft["parts"]))
                        p0 = ft["parts"][0][0] if ft["parts"] else (0, 0)
                        cols["x"].append(int(p0[0]))
                        cols["y"].append(int(p0[1]))
                        cols["properties"].append(
                            json.dumps(ft["properties"], sort_keys=True))
        return pa.table({
            "z": pa.array(cols["z"], pa.int32()),
            "tile_x": pa.array(cols["tile_x"], pa.int64()),
            "tile_y": pa.array(cols["tile_y"], pa.int64()),
            "layer": pa.array(cols["layer"], pa.string()),
            "geom_type": pa.array(cols["geom_type"], pa.int32()),
            "n_parts": pa.array(cols["n_parts"], pa.int64()),
            "n_points": pa.array(cols["n_points"], pa.int64()),
            "x": pa.array(cols["x"], pa.int64()),
            "y": pa.array(cols["y"], pa.int64()),
            "properties": pa.array(cols["properties"], pa.string()),
        })

    nb = kwargs.get("override_num_blocks") or min(64, max(1, len(items)))
    return ray.data.from_items(items, override_num_blocks=nb) \
        .map_batches(explode, batch_format="pyarrow")
