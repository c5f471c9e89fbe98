"""Mapbox Vector Tiles (MVT): tile codec + Ray sink/source.

Parity target: `ogr/ogrsf_frmts/mvt/` (mvt_tile.cpp Tile/Layer/Feature
wire layout, mvtutils.cpp geometry command stream, ogrmvtwriterdataset
.cpp's tiled write). Encoding follows the public Mapbox Vector Tile
spec 2.1 over the hand-rolled protobuf wire codec
(`codecs/protobuf.py`) — no protobuf/mapnik libraries.

Ray shape: `write_mvt_features` assigns each feature to its tiles in
a map_batches stage (envelope → tile range, the same fan-out the
reference's MVT writer does per feature), then ONE groupby(tile_id)
co-locates each tile's features and encodes/writes it in a single
task — tile files are independent, so a 10^6-tile write is 10^6-way
parallel and resumable per tile (skip already-written paths).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..codecs import protobuf as pb

# geometry command ids (MVT spec 4.3.4)
_MOVETO, _LINETO, _CLOSEPATH = 1, 2, 7
GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return pb.field_varint(7, 1 if v else 0)
    if isinstance(v, (int, np.integer)):
        return pb.field_varint(4, int(v))
    if isinstance(v, (float, np.floating)):
        return pb.field_double(3, float(v))
    return pb.field_string(1, str(v))


def _decode_value(buf: bytes):
    import struct
    for field, _wire, val in pb.iter_fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", val)[0]
        if field == 3:
            return struct.unpack("<d", val)[0]
        if field in (4, 5):
            v = val
            return v - (1 << 64) if v >= 1 << 63 else v
        if field == 6:
            return pb.unzigzag(val)
        if field == 7:
            return bool(val)
    return None


def _encode_geometry(geom_type: int, parts: List[np.ndarray]) -> List[int]:
    """Parts -> MVT command stream. Points: one part, (n, 2) coords.
    Lines: one part per linestring. Polygons: one part per ring
    (exterior then holes, NOT closed — ClosePath closes them)."""
    out: List[int] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = parts[0]
        out.append(_cmd(_MOVETO, len(pts)))
        for x, y in pts:
            out.append(pb.zigzag(int(x) - cx))
            out.append(pb.zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return out
    for part in parts:
        part = np.asarray(part)
        out.append(_cmd(_MOVETO, 1))
        out.append(pb.zigzag(int(part[0, 0]) - cx))
        out.append(pb.zigzag(int(part[0, 1]) - cy))
        cx, cy = int(part[0, 0]), int(part[0, 1])
        out.append(_cmd(_LINETO, len(part) - 1))
        for x, y in part[1:]:
            out.append(pb.zigzag(int(x) - cx))
            out.append(pb.zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            out.append(_cmd(_CLOSEPATH, 1))
    return out


def _decode_geometry(geom_type: int, cmds: List[int]) -> List[np.ndarray]:
    parts: List[np.ndarray] = []
    cur: List[Tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        c = cmds[i]
        i += 1
        cmd_id, count = c & 0x7, c >> 3
        if cmd_id == _MOVETO:
            if cur and geom_type != GEOM_POINT:
                parts.append(np.array(cur))
                cur = []
            for _ in range(count):
                cx += pb.unzigzag(cmds[i]); cy += pb.unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == _LINETO:
            for _ in range(count):
                cx += pb.unzigzag(cmds[i]); cy += pb.unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == _CLOSEPATH:
            parts.append(np.array(cur))
            cur = []
    if cur:
        parts.append(np.array(cur))
    return parts


def encode_mvt_tile(layers: Dict[str, List[dict]], extent: int = 4096) -> bytes:
    """{layer_name: [feature, ...]} -> Tile bytes. Feature dict:
    {"id": int?, "type": 1|2|3, "parts": [(n,2) int arrays],
     "properties": {str: str|int|float|bool}}."""
    tile = bytearray()
    for name, feats in layers.items():
        keys: List[str] = []
        vals: List[bytes] = []
        kidx: Dict[str, int] = {}
        vidx: Dict[bytes, int] = {}
        body = bytearray()
        body += pb.field_varint(15, 2)           # version
        body += pb.field_string(1, name)
        for f in feats:
            fb = bytearray()
            if f.get("id") is not None:
                fb += pb.field_varint(1, int(f["id"]))
            tags: List[int] = []
            for k, v in (f.get("properties") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                ev = _encode_value(v)
                if ev not in vidx:
                    vidx[ev] = len(vals)
                    vals.append(ev)
                tags += [kidx[k], vidx[ev]]
            if tags:
                fb += pb.field_packed(2, tags)
            fb += pb.field_varint(3, int(f["type"]))
            fb += pb.field_packed(4, _encode_geometry(int(f["type"]),
                                                      f["parts"]))
            body += pb.field_bytes(2, bytes(fb))
        for k in keys:
            body += pb.field_string(3, k)
        for v in vals:
            body += pb.field_bytes(4, v)
        body += pb.field_varint(5, extent)
        tile += pb.field_bytes(3, bytes(body))
    return bytes(tile)


def decode_mvt_tile(buf: bytes) -> Dict[str, dict]:
    """Tile bytes -> {layer: {"extent": int, "features": [...]}} with
    feature dicts in encode_mvt_tile's shape (properties decoded)."""
    out: Dict[str, dict] = {}
    for field, _w, layer_buf in pb.iter_fields(buf):
        if field != 3:
            continue
        name = ""
        extent = 4096
        keys: List[str] = []
        vals: List = []
        raw_feats: List[bytes] = []
        for f2, _w2, v2 in pb.iter_fields(layer_buf):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                raw_feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                vals.append(_decode_value(v2))
            elif f2 == 5:
                extent = v2
        feats = []
        for fb in raw_feats:
            feat = {"id": None, "type": 0, "parts": [], "properties": {}}
            for f3, w3, v3 in pb.iter_fields(fb):
                if f3 == 1:
                    feat["id"] = v3
                elif f3 == 2:
                    tags = pb.read_packed_varints(v3) if w3 == 2 else [v3]
                    for ki, vi in zip(tags[::2], tags[1::2]):
                        feat["properties"][keys[ki]] = vals[vi]
                elif f3 == 3:
                    feat["type"] = v3
                elif f3 == 4:
                    cmds = pb.read_packed_varints(v3) if w3 == 2 else [v3]
                    feat["parts"] = _decode_geometry(feat["type"], cmds)
            feats.append(feat)
        out[name] = {"extent": extent, "features": feats}
    return out


def _lonlat_to_tile_local(lon, lat, z: int, extent: int):
    """Lon/lat -> (tile_x, tile_y, local_x, local_y) at zoom z
    (WebMercatorQuad, same math as geom/cells.lonlat_to_tile but
    keeping the fractional part at `extent` resolution)."""
    n = 1 << z
    fx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n
    latr = np.radians(np.clip(np.asarray(lat, dtype=np.float64),
                              -85.05112878, 85.05112878))
    fy = (1.0 - np.arcsinh(np.tan(latr)) / np.pi) / 2.0 * n
    tx = np.clip(np.floor(fx).astype(np.int64), 0, n - 1)
    ty = np.clip(np.floor(fy).astype(np.int64), 0, n - 1)
    # floor(+0.5) (GDAL-style rounding), not np.rint — banker's
    # rounding at *.5 is not SQL-mirrorable
    lx = np.floor((fx - tx) * extent + 0.5).astype(np.int64)
    ly = np.floor((fy - ty) * extent + 0.5).astype(np.int64)
    return tx, ty, lx, ly


def write_mvt_points(points: ray.data.Dataset, out_dir: str, z: int,
                     layer: str = "points", extent: int = 4096,
                     prop_cols: Optional[List[str]] = None,
                     skip_existing: bool = False) -> ray.data.Dataset:
    """Point features (columns lon, lat [+ properties]) -> one .pbf
    per XYZ tile under {out_dir}/{z}/{x}/{y}.pbf. Returns the manifest
    Dataset (z, tile_x, tile_y, path, n_features). skip_existing makes
    a re-run resume: tiles whose file already exists are not re-encoded
    (the tiling-job checkpoint contract)."""
    props = prop_cols or []

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        tx, ty, lx, ly = _lonlat_to_tile_local(lon, lat, z, extent)
        cols = {"tile_id": pa.array(tx * (1 << z) + ty),
                "tx": pa.array(tx), "ty": pa.array(ty),
                "lx": pa.array(lx), "ly": pa.array(ly)}
        for c in props:
            cols[c] = batch[c]
        return pa.table(cols)

    keyed = points.map_batches(assign, batch_format="pyarrow")

    def write_tile(group: pa.Table) -> pa.Table:
        tx = int(group["tx"][0].as_py())
        ty = int(group["ty"][0].as_py())
        path = os.path.join(out_dir, str(z), str(tx), f"{ty}.pbf")
        n = len(group)
        if skip_existing and os.path.exists(path):
            return pa.table({"z": pa.array([z], pa.int32()),
                             "tile_x": pa.array([tx], pa.int64()),
                             "tile_y": pa.array([ty], pa.int64()),
                             "path": pa.array([path]),
                             "n_features": pa.array([n], pa.int64())})
        lx = group["lx"].to_numpy(zero_copy_only=False)
        ly = group["ly"].to_numpy(zero_copy_only=False)
        pvals = {c: group[c].to_pylist() for c in props}
        feats = []
        for i in range(n):
            feats.append({
                "type": GEOM_POINT,
                "parts": [np.array([[lx[i], ly[i]]])],
                "properties": {c: pvals[c][i] for c in props},
            })
        buf = encode_mvt_tile({layer: feats}, extent=extent)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"z": pa.array([z], pa.int32()),
                         "tile_x": pa.array([tx], pa.int64()),
                         "tile_y": pa.array([ty], pa.int64()),
                         "path": pa.array([path]),
                         "n_features": pa.array([n], pa.int64())})

    return keyed.groupby("tile_id").map_groups(write_tile,
                                               batch_format="pyarrow")


def read_mvt_features(paths, **kwargs) -> ray.data.Dataset:
    """.pbf tile files -> feature rows (z, tile_x, tile_y, layer,
    geom_type, n_parts, n_points, x, y, properties-json). x/y are the
    first vertex in tile-local integer coords (full parts stay in the
    codec for consumers that need them). Parallel per tile file."""
    kwargs.setdefault("file_extensions", ["pbf", "mvt"])
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def explode(batch: pa.Table) -> pa.Table:
        cols = {"z": [], "tile_x": [], "tile_y": [], "layer": [],
                "geom_type": [], "n_parts": [], "n_points": [],
                "x": [], "y": [], "properties": []}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            parts = os.path.normpath(path).split(os.sep)
            ty = int(os.path.splitext(parts[-1])[0])
            tx = int(parts[-2])
            zz = int(parts[-3])
            for lname, layer in decode_mvt_tile(buf).items():
                for f in layer["features"]:
                    cols["z"].append(zz)
                    cols["tile_x"].append(tx)
                    cols["tile_y"].append(ty)
                    cols["layer"].append(lname)
                    cols["geom_type"].append(f["type"])
                    cols["n_parts"].append(len(f["parts"]))
                    cols["n_points"].append(
                        sum(len(p) for p in f["parts"]))
                    p0 = f["parts"][0][0] if f["parts"] else (0, 0)
                    cols["x"].append(int(p0[0]))
                    cols["y"].append(int(p0[1]))
                    cols["properties"].append(
                        json.dumps(f["properties"], sort_keys=True))
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

    return raw.map_batches(explode, batch_format="pyarrow")
