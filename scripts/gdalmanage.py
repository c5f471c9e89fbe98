"""gdalmanage analog: identify / copy / rename / delete datasets,
sibling files included.

    python scripts/gdalmanage.py identify FILE [FILE ...]
    python scripts/gdalmanage.py copy SRC DST
    python scripts/gdalmanage.py rename SRC DST
    python scripts/gdalmanage.py delete FILE

Reference surface: apps/gdalmanage.cpp (GDALIdentifyDriver /
Driver::CopyFiles/Rename/Delete — the file-set operations move every
sibling of multi-file datasets: .shp/.shx/.dbf/.prj triples, header
pairs like .hdr+.bil / .ers+raw / .hgt, world files).  identify
probes in parallel, one Ray task per file.
"""

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

# sibling extension families (lowercase anchor -> companions)
_SIBLINGS = {
    ".shp": [".shx", ".dbf", ".prj", ".cpg", ".qix"],
    ".bil": [".hdr", ".prj", ".stx"],
    ".bsq": [".hdr", ".prj"],
    ".bip": [".hdr", ".prj"],
    ".flt": [".hdr", ".prj"],
    ".img": [".ige", ".rrd", ".aux"],
    ".tif": [".tfw", ".aux.xml", ".ovr", ".msk"],
    ".png": [".pgw", ".aux.xml"],
    ".jpg": [".jgw", ".aux.xml"],
    ".mif": [".mid"],
    ".tab": [".dat", ".map", ".id", ".ind"],
    ".sdts": [],
}


def _file_set(path: str):
    """The dataset's full file list (anchor + existing siblings)."""
    base, ext = os.path.splitext(path)
    out = [path]
    for sib in _SIBLINGS.get(ext.lower(), []):
        for cand in (base + sib, base + sib.upper()):
            if os.path.exists(cand) and cand not in out:
                out.append(cand)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("mode", choices=["identify", "copy", "rename",
                                     "delete"])
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()
    t0 = time.time()

    if args.mode == "identify":
        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        try:
            @ray.remote
            def ident(path: str):
                from lib_gdal_ray.sources.rasters import (identify,
                                                          open_raster_path)

                try:
                    with open(path, "rb") as f:
                        head = f.read(1 << 20)
                    name = identify(head)
                    if name is None:
                        # path-context formats (sibling headers, dirs)
                        name, _arr, _meta = open_raster_path(path)
                    return path, name
                except Exception:
                    return path, None

            rep = dict(ray.get([ident.remote(p) for p in args.paths]))
            print(json.dumps({"mode": "identify", "drivers": rep,
                              "sec": round(time.time() - t0, 3)}))
        finally:
            ray.shutdown()
        return

    if args.mode == "delete":
        removed = []
        for p in args.paths:
            for f in _file_set(p):
                os.remove(f)
                removed.append(f)
        print(json.dumps({"mode": "delete", "removed": removed,
                          "sec": round(time.time() - t0, 3)}))
        return

    if len(args.paths) != 2:
        raise SystemExit(f"gdalmanage {args.mode} needs SRC DST")
    src, dst = args.paths
    src_base, _src_ext = os.path.splitext(src)
    dst_base, _dst_ext = os.path.splitext(dst)
    moved = []
    for f in _file_set(src):
        target = dst_base + f[len(src_base):]
        if args.mode == "copy":
            shutil.copy2(f, target)
        else:
            os.replace(f, target)
        moved.append([f, target])
    print(json.dumps({"mode": args.mode, "files": moved,
                      "sec": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    main()
