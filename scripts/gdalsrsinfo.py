"""gdalsrsinfo analog: report a dataset's (or literal) SRS in the
forms the engine models.

    python scripts/gdalsrsinfo.py file.tif
    python scripts/gdalsrsinfo.py EPSG:32633

Reference surface: apps/gdalsrsinfo.cpp (-o all: proj4 + WKT).  The
engine's CRS registry covers EPSG:4326, EPSG:3857 and the WGS84 UTM
zones (326xx/327xx — `geom/proj.py`); anything else reports
epsg-only with supported=false.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")


def describe(epsg):
    from lib_gdal_ray.geom.proj import parse_utm_epsg

    if epsg is None:
        return {"epsg": None, "supported": False}
    epsg = int(epsg)
    if epsg == 4326:
        return {"epsg": 4326, "supported": True,
                "name": "WGS 84",
                "proj4": "+proj=longlat +datum=WGS84 +no_defs",
                "unit": "degree", "projected": False}
    if epsg == 3857:
        return {"epsg": 3857, "supported": True,
                "name": "WGS 84 / Pseudo-Mercator",
                "proj4": "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 "
                         "+lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m "
                         "+nadgrids=@null +no_defs",
                "unit": "metre", "projected": True}
    utm = parse_utm_epsg(epsg)
    if utm is not None:
        zone, south = utm
        return {"epsg": epsg, "supported": True,
                "name": f"WGS 84 / UTM zone {zone}{'S' if south else 'N'}",
                "proj4": f"+proj=utm +zone={zone}"
                         f"{' +south' if south else ''} "
                         "+datum=WGS84 +units=m +no_defs",
                "unit": "metre", "projected": True}
    return {"epsg": epsg, "supported": False}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("target", help="dataset path or EPSG:<code>")
    args = ap.parse_args()
    t0 = time.time()

    if args.target.upper().startswith("EPSG:"):
        rep = describe(args.target.split(":")[-1])
    else:
        from lib_gdal_ray.sources.rasters import open_raster_path

        _drv, _arr, meta = open_raster_path(args.target)
        rep = describe(meta.get("epsg"))
        rep["source"] = args.target
    rep["sec"] = round(time.time() - t0, 3)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
