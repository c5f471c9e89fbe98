"""gdalmdiminfo analog: report the structure of a multidimensional
store (reference `apps/gdalmdiminfo_bin.cpp` over the
`gcore/gdal_multidim.h` model): arrays, shapes, dtypes, chunking,
attributes — for Zarr v2 directories, NetCDF classic / NetCDF-4 and
HDF5 files. Pure metadata; no chunk payloads are read.

Usage:
    python scripts/gdalmdiminfo.py STORE

Prints ONE JSON line: {"path", "driver", "arrays": {name: {shape,
dtype, chunks?, attrs?}}}.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _jsonable(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def main():
    ap = argparse.ArgumentParser(description="gdalmdiminfo analog")
    ap.add_argument("src")
    args = ap.parse_args()

    arrays = {}
    if os.path.isdir(args.src):
        driver = "Zarr"
        from lib_gdal_ray.sources.zarr import read_meta

        roots = []
        if os.path.exists(os.path.join(args.src, ".zarray")):
            roots.append(("", args.src))
        else:
            for name in sorted(os.listdir(args.src)):
                sub = os.path.join(args.src, name)
                if os.path.exists(os.path.join(sub, ".zarray")):
                    roots.append((name, sub))
        for name, sub in roots:
            m = read_meta(sub)
            arrays[name or "/"] = {
                "shape": list(m["shape"]),
                "chunks": list(m["chunks"]),
                "dtype": str(m["dtype"]),
                "compressor": (m.get("compressor") or {}).get("id")
                if isinstance(m.get("compressor"), dict) else None}
    else:
        with open(args.src, "rb") as f:
            magic = f.read(8)
        if magic == b"\x89HDF\r\n\x1a\n":
            driver = "HDF5"
            from lib_gdal_ray.sources.hdf5 import read_h5_structure

            for name, info in read_h5_structure(args.src).items():
                if info.get("group"):
                    arrays[name] = {"group": True,
                                    "attrs": {k: _jsonable(v) for k, v
                                              in info["attrs"].items()}}
                    continue
                e = {"shape": list(info["shape"]),
                     "dtype": str(info["dtype"]),
                     "layout": info["layout"][0]}
                if info["layout"][0] == "chunked":
                    e["chunks"] = list(info["layout"][2])
                if info["attrs"]:
                    e["attrs"] = {k: _jsonable(v) for k, v
                                  in info["attrs"].items()}
                arrays[name] = e
        else:
            driver = "netCDF"
            from lib_gdal_ray.sources.netcdf import read_header

            hdr = read_header(args.src)
            for name, v in hdr["vars"].items():
                shape = list(v["shape"])
                if v["record"]:
                    shape[0] = hdr["numrecs"]
                arrays[name] = {"shape": shape,
                                "dims": list(v["dims"]),
                                "nc_type": v["nc_type"],
                                "attrs": {k: _jsonable(val) for k, val
                                          in v["atts"].items()}}
    print(json.dumps({"path": args.src, "driver": driver,
                      "arrays": arrays}, default=str))


if __name__ == "__main__":
    main()
