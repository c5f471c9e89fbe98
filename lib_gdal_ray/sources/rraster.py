"""RRASTER driver: the R `raster` package's native grid format.

A text header `.grd` (INI sections [general]/[georeference]/[data]/
[legend]/[description]) describes a raw binary `.gri` sibling —
BIL/BIP/BSQ interleave, 9 datatypes INT1S..FLT8S, little/big byte
order, optional per-band min/max, a `ratnames/rattypes/ratvalues`
column table that doubles as the color table when it carries
red/green/blue columns.

Reference: frmts/raw/rrasterdataset.cpp (datatype table :522-531,
interleave offsets :955-999, color-table-from-RAT assembly);
autotest gdrivers/rraster.py pins checksum 4672 on byte_rraster1 and
the ct_rgb/ct_rgba palette entries. Re-derived from the header
grammar; no code copied.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    "LOG1S": "u1", "INT1S": "i1", "INT1U": "u1",
    "INT2S": "i2", "INT2U": "u2", "INT4S": "i4", "INT4U": "u4",
    "INT8S": "i8", "FLT4S": "f4", "FLT8S": "f8",
}
_BACK = {("i1", False): "INT1S", ("u1", False): "INT1U",
         ("i2", False): "INT2S", ("u2", False): "INT2U",
         ("i4", False): "INT4S", ("u4", False): "INT4U",
         ("i8", False): "INT8S", ("f4", False): "FLT4S",
         ("f8", False): "FLT8S"}


def identify_rraster(path: str) -> bool:
    if not path.lower().endswith(".grd"):
        return False
    gri = os.path.splitext(path)[0] + ".gri"
    if not os.path.exists(gri):
        return False
    try:
        with open(path, "rb") as f:
            head = f.read(4096).decode("utf-8", "replace").lower()
    except OSError:
        return False
    return "[georeference]" in head and "datatype" in head


def _parse_grd(text: str) -> dict:
    kv = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("["):
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().lower()] = v.strip()
    return kv


def _epsg_from_projection(kv: dict) -> Optional[int]:
    wkt = kv.get("wkt", "")
    if 'AUTHORITY["EPSG"' in wkt:
        try:
            return int(wkt.rsplit('AUTHORITY["EPSG","', 1)[1].split('"')[0])
        except (IndexError, ValueError):
            pass
    proj4 = kv.get("projection", "")
    if "+proj=utm" in proj4 and "+zone=" in proj4:
        zone = int(proj4.split("+zone=")[1].split()[0])
        if "+datum=NAD27" in proj4:
            return 26700 + zone
        if "+datum=NAD83" in proj4:
            return 26900 + zone
        if "+datum=WGS84" in proj4:
            return (32700 if "+south" in proj4 else 32600) + zone
    if "+proj=longlat" in proj4 and "WGS84" in proj4:
        return 4326
    return None


def decode_rraster(path: str):
    """.grd path -> (arr (H, W) or (H, W, B), meta).  meta carries
    transform/epsg/nodata/band_names/color_table/rat."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        kv = _parse_grd(f.read())
    nrows = int(kv["nrows"])
    ncols = int(kv["ncols"])
    nbands = int(kv.get("nbands", "1"))
    dt = _DTYPES.get(kv.get("datatype", "").upper())
    if dt is None:
        raise ValueError(f"RRASTER: unknown datatype {kv.get('datatype')}")
    order = "<" if kv.get("byteorder", "little") == "little" else ">"
    dtype = np.dtype(order + dt)
    bandorder = kv.get("bandorder", "BIL").upper()

    with open(os.path.splitext(path)[0] + ".gri", "rb") as f:
        raw = np.frombuffer(f.read(), dtype=dtype,
                            count=nrows * ncols * nbands)
    if nbands == 1:
        arr = raw.reshape(nrows, ncols)
    elif bandorder == "BIP":
        arr = raw.reshape(nrows, ncols, nbands)
    elif bandorder == "BSQ":
        arr = np.moveaxis(raw.reshape(nbands, nrows, ncols), 0, -1)
    else:  # BIL (default)
        arr = np.moveaxis(raw.reshape(nrows, nbands, ncols), 1, -1)
    arr = np.ascontiguousarray(arr.astype(dtype.newbyteorder("=")))

    xmin, xmax = float(kv["xmin"]), float(kv["xmax"])
    ymin, ymax = float(kv["ymin"]), float(kv["ymax"])
    transform = (xmin, (xmax - xmin) / ncols, 0.0,
                 ymax, 0.0, -(ymax - ymin) / nrows)

    nodata = None
    nv = kv.get("nodatavalue", "")
    if nv and nv.lower() not in ("na", "nan"):
        try:
            nodata = float(nv)
        except ValueError:
            pass

    band_names = kv.get("layername", "").split(":") if \
        kv.get("layername") else []

    # RAT columns; red/green/blue columns double as the color table
    rat = None
    color_table = None
    if kv.get("ratnames"):
        names = kv["ratnames"].split(":")
        types = kv.get("rattypes", "").split(":")
        vals = kv.get("ratvalues", "").split(":")
        ncl = len(vals) // max(len(names), 1)
        cols = {}
        for i, name in enumerate(names):
            col = vals[i * ncl:(i + 1) * ncl]
            typ = types[i] if i < len(types) else "character"
            if typ == "integer":
                cols[name] = [int(v) for v in col]
            elif typ == "numeric":
                cols[name] = [float(v) for v in col]
            else:
                cols[name] = col
        rat = cols
        if {"red", "green", "blue"} <= set(names):
            alpha = cols.get("alpha", [255] * ncl)
            color_table = [[cols["red"][i], cols["green"][i],
                            cols["blue"][i], alpha[i]]
                           for i in range(ncl)]

    meta = {"width": ncols, "height": nrows, "bands": nbands,
            "transform": transform, "epsg": _epsg_from_projection(kv),
            "nodata": nodata, "band_names": band_names,
            "projection": kv.get("projection"),
            "minvalue": kv.get("minvalue"), "maxvalue": kv.get("maxvalue"),
            "categorical": kv.get("categorical", "FALSE") == "TRUE",
            "rat": rat, "color_table": color_table}
    return arr, meta


def encode_rraster(arr: np.ndarray, path: str,
                   transform: Optional[Tuple[float, ...]] = None,
                   projection: Optional[str] = None,
                   nodata=None,
                   band_names=None,
                   bandorder: str = "BIL") -> int:
    """Write .grd + .gri; returns bytes written to the .gri."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    key = (np.dtype(arr.dtype).str[1:], False)
    dt_name = _BACK.get(key)
    if dt_name is None:
        raise ValueError(f"RRASTER: unsupported dtype {arr.dtype}")
    a = np.ascontiguousarray(arr).astype(arr.dtype.newbyteorder("<"))
    if nb == 1 or bandorder == "BIL":
        raw = np.moveaxis(a, -1, 1)          # (h, nb, w)
    elif bandorder == "BIP":
        raw = a
    elif bandorder == "BSQ":
        raw = np.moveaxis(a, -1, 0)
    else:
        raise ValueError(f"unknown bandorder {bandorder}")
    gri = os.path.splitext(path)[0] + ".gri"
    payload = np.ascontiguousarray(raw).tobytes()
    with open(gri, "wb") as f:
        f.write(payload)

    if transform is None:
        transform = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    x0, pxw, _r0, y0, _r1, neg_pxh = transform
    mins = a.reshape(-1, nb).min(axis=0)
    maxs = a.reshape(-1, nb).max(axis=0)
    lines = ["[general]", "creator=lib_gdal_ray", "[georeference]",
             f"nrows={h}", f"ncols={w}",
             f"xmin={x0:.10g}", f"ymin={y0 + neg_pxh * h:.10g}",
             f"xmax={x0 + pxw * w:.10g}", f"ymax={y0:.10g}"]
    if projection:
        lines.append(f"projection={projection}")
    lines += ["[data]", f"datatype={dt_name}", "byteorder=little",
              f"nbands={nb}", f"bandorder={bandorder}",
              "categorical=FALSE",
              "minvalue=" + ":".join(f"{v:.10g}" for v in mins),
              "maxvalue=" + ":".join(f"{v:.10g}" for v in maxs),
              "nodatavalue=" + (f"{nodata:.10g}" if nodata is not None
                                else "NA"),
              "[description]",
              "layername=" + ":".join(band_names or
                                      [f"band{i+1}" for i in range(nb)])]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return len(payload)


def read_rraster_rows(grd_path: str, band: int = 0,
                      rows_per_chunk: int = 512):
    """RRASTER -> Ray Dataset of pixel rows (band, y, x, value), split
    on line ranges — the .gri raw store is trivially byte-addressable
    (the read_envi_rows contract for the BIL/BIP/BSQ strides)."""
    import pyarrow as pa
    import ray.data

    with open(grd_path, "r", encoding="utf-8", errors="replace") as f:
        kv = _parse_grd(f.read())
    h, w = int(kv["nrows"]), int(kv["ncols"])
    nb = int(kv.get("nbands", "1"))
    order = "<" if kv.get("byteorder", "little") == "little" else ">"
    dt = np.dtype(order + _DTYPES[kv.get("datatype", "").upper()])
    bandorder = kv.get("bandorder", "BIL").upper() if nb > 1 else "BIL"
    isz = dt.itemsize
    gri = os.path.splitext(grd_path)[0] + ".gri"
    n_chunks = (h + rows_per_chunk - 1) // rows_per_chunk

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs = [], [], []
        with open(gri, "rb") as f:
            for ci in batch["c"].to_pylist():
                r0 = ci * rows_per_chunk
                r1 = min(r0 + rows_per_chunk, h)
                nr = r1 - r0
                if bandorder == "BSQ":
                    f.seek((band * h + r0) * w * isz)
                    plane = np.frombuffer(f.read(nr * w * isz),
                                          dt).reshape(nr, w)
                elif bandorder == "BIP":
                    f.seek(r0 * w * nb * isz)
                    slab = np.frombuffer(f.read(nr * w * nb * isz),
                                         dt).reshape(nr, w, nb)
                    plane = slab[:, :, band]
                else:  # BIL
                    f.seek(r0 * nb * w * isz)
                    slab = np.frombuffer(f.read(nr * nb * w * isz),
                                         dt).reshape(nr, nb, w)
                    plane = slab[:, band, :]
                yy, xx = np.mgrid[r0:r1, 0:w]
                ys.append(yy.ravel().astype(np.int32))
                xs.append(xx.ravel().astype(np.int32))
                vs.append(plane.ravel().astype(np.float64))
        cat = np.concatenate
        return pa.table({
            "band": pa.array(np.full(sum(len(v) for v in vs), band,
                                     dtype=np.int32)),
            "y": pa.array(cat(ys)), "x": pa.array(cat(xs)),
            "value": pa.array(cat(vs))})

    return ray.data.from_items(
        [{"c": i} for i in range(n_chunks)],
        override_num_blocks=min(64, n_chunks)
    ).map_batches(decode, batch_format="pyarrow")
