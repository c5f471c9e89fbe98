"""Unified raster driver registry: format-sniffing read/write dispatch.

The GDAL driver-registry analog (`gcore/gdaldrivermanager.cpp`,
GDALOpen's driver probe loop) over this repo's real codecs: each
driver is (sniff-by-magic, decode, encode) and `open_raster` probes
them in order, exactly like GDALOpen asks each driver's Identify().
Drivers present: GeoTIFF (georeferenced, all sample types), PNG, BMP,
baseline JPEG. All pure numpy — no GDAL/libpng/libjpeg binaries.

`read_raster_pixels` is the Dataset-level source: any mix of
.tif/.png/.bmp/.jpg files streams per file into sparse pixel rows
keyed by (path, band, y, x) — the format-agnostic ingestion the
reference's RasterIO contract provides.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..codecs import sniff
from ..codecs.bmp import decode_bmp, encode_bmp
from ..codecs.jpeg import decode_jpeg, encode_jpeg
from ..codecs.png import decode_png, encode_png
from ..codecs.tiff import decode_geotiff, encode_geotiff
from .ascii_grids import (decode_aaigrid, decode_xyz, encode_aaigrid,
                          encode_xyz, identify_aaigrid, identify_xyz)

def _lazy(mod: str, fn: str):
    import importlib

    return getattr(importlib.import_module(f".{mod}", __package__), fn)


def _no_encode(name: str):
    def enc(a, **kw):
        raise NotImplementedError(f"{name} driver is read-only")

    return enc


# name -> (extensions, decode(buf)->(arr, meta), encode(arr, **kw)->buf)
DRIVERS: Dict[str, Tuple[tuple, Callable, Callable]] = {
    "GTiff": ((".tif", ".tiff"),
              decode_geotiff,
              lambda a, **kw: encode_geotiff(a, **kw)),
    "PNG": ((".png",),
            lambda b: (decode_png(b), {}),
            lambda a, **kw: encode_png(a, **kw)),
    "BMP": ((".bmp",),
            lambda b: (decode_bmp(b), {}),
            lambda a, **kw: encode_bmp(a)),
    "JPEG": ((".jpg", ".jpeg"),
             lambda b: (decode_jpeg(b), {}),
             lambda a, **kw: encode_jpeg(a, **kw)),
    "GIF": ((".gif",),
            lambda b: _decode_gif_entry(b),
            lambda a, **kw: _encode_gif_entry(a, **kw)),
    "AAIGrid": ((".asc",),
                decode_aaigrid,
                lambda a, **kw: encode_aaigrid(a, **kw)),
    "XYZ": ((".xyz",),
            decode_xyz,
            lambda a, **kw: encode_xyz(a, **kw)),
    "RMF": ((".rsw", ".mtw"),
            lambda b: _decode_rmf_hw(b),
            lambda a, **kw: _encode_rmf_hw(a, **kw)),
    "GRASSASCIIGrid": ((".txt",),
                       lambda b: _lazy("ascii_grids",
                                       "decode_grassascii")(b),
                       lambda a, **kw: _lazy("ascii_grids",
                                             "encode_grassascii")(a, **kw)),
    "ISG": ((".isg",),
            lambda b: _lazy("ascii_grids", "decode_isg")(b),
            _no_encode("ISG")),
    "NWT_GRD": ((".grd",),
                lambda b: _lazy("nwt", "decode_nwt_grd")(b),
                _no_encode("NWT_GRD")),
    "NWT_GRC": ((".grc",),
                lambda b: _lazy("nwt", "decode_nwt_grc")(b),
                _no_encode("NWT_GRC")),
    "DDS": ((".dds",),
            lambda b: _lazy("dds", "decode_dds")(b),
            _no_encode("DDS")),
    "HDF4": ((".hdf",),
             lambda b: _lazy("hdf4", "decode_hdf4")(b),
             lambda a, **kw: _lazy("hdf4", "encode_hdf4")(a)),
    "JP2OpenJPEG": ((".jp2", ".j2k", ".jpc"),
                    lambda b: _decode_jp2_entry(b),
                    lambda a, **kw: _encode_jp2_entry(a, **kw)),
}


def _decode_jp2_entry(buf: bytes):
    from ..codecs.jp2k import decode_jp2

    return decode_jp2(buf)


def _encode_jp2_entry(arr, **kw):
    from ..codecs.jp2k import encode_jp2

    return encode_jp2(arr, **kw)


def _decode_rmf_hw(buf: bytes):
    from .rmf import decode_rmf

    arr, meta = decode_rmf(buf)
    if arr.ndim == 3:  # registry convention is channel-last
        arr = np.moveaxis(arr, 0, -1)
    return arr, meta


def _encode_rmf_hw(arr: np.ndarray, **kw) -> bytes:
    from .rmf import encode_rmf

    if arr.ndim == 3:
        arr = np.moveaxis(arr, -1, 0)
    return encode_rmf(arr, **kw)

def _decode_gif_entry(buf: bytes):
    from ..codecs.gif import decode_gif

    arr, meta = decode_gif(buf)
    return arr, meta


def _encode_gif_entry(arr: np.ndarray, **kw) -> bytes:
    from ..codecs.gif import encode_gif

    return encode_gif(arr, **kw)


_SNIFF_TO_DRIVER = {"png": "PNG", "bmp": "BMP", "jpeg": "JPEG",
                    "gif": "GIF"}


def identify(buf: bytes) -> Optional[str]:
    """GDALIdentify analog: driver name for a payload, or None.
    Binary magics first, then the text-format probes (AAIGrid header
    keywords, XYZ triplet stream) — the GDALOpen probe order."""
    if buf[:2] in (b"II", b"MM") and len(buf) > 3 and buf[2:3] in (b"*", b"\x00"):
        return "GTiff"
    name = _SNIFF_TO_DRIVER.get(sniff(buf))
    if name:
        return name
    if buf[:4] in (b"RSW\x00", b"\x00WSR", b"MTW\x00"):
        return "RMF"
    if buf[:4] == b"DDS ":
        return "DDS"
    if buf[:4] == b"\x0e\x03\x13\x01":
        return "HDF4"
    if buf[:8] == b"\x00\x00\x00\x0cjP  " or buf[:4] == b"\xff\x4f\xff\x51":
        return "JP2OpenJPEG"
    if buf[:4] == b"HGPC" and buf[4:5] in b"18":
        from .nwt import identify_nwt

        return identify_nwt(buf) or None
    if identify_aaigrid(buf):
        return "AAIGrid"
    from .ascii_grids import identify_grassascii, identify_isg

    if identify_grassascii(buf):
        return "GRASSASCIIGrid"
    if identify_isg(buf):
        return "ISG"
    if identify_xyz(buf):
        return "XYZ"
    return None


def open_raster(buf: bytes):
    """GDALOpen analog: probe drivers, decode with the matching one.

    Returns (driver_name, array, meta) — meta carries georeferencing
    for GTiff, {} for the image formats."""
    name = identify(buf)
    if name is None:
        raise ValueError("no raster driver recognizes this payload")
    arr, meta = DRIVERS[name][1](buf)
    return name, arr, meta


def open_raster_path(path: str):
    """GDALOpen-by-path analog: handles the formats that need path
    context — .vrt (sibling source files) and SRTM .hgt (grid size +
    georef from the file name) — then falls through to the buffer
    probe. Returns (driver_name, array, meta)."""
    low = path.lower()
    if low.endswith(".vrt"):
        from .vrt import open_vrt
        arr, meta = open_vrt(path)
        return "VRT", arr, meta
    from .gti import identify_gti
    if identify_gti(path):
        from .gti import open_gti
        arr, meta = open_gti(path)
        return "GTI", arr, meta
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "attrib")):  # MFF2 (HKV)
            from .rawformats import decode_mff2
            arr, meta = decode_mff2(path)
            return "MFF2", arr, meta
        from .aigrid import decode_aig, identify_aig_path
        if identify_aig_path(path):
            arr, meta = decode_aig(path)
            return "AIG", arr, meta
        raise ValueError(f"{path}: directory is not a known dataset")
    if low.endswith(".adf"):
        from .aigrid import decode_aig, identify_aig_path
        if identify_aig_path(path):
            arr, meta = decode_aig(path)
            return "AIG", arr, meta
    with open(path, "rb") as f:
        buf = f.read()
    if buf.lstrip()[:12].startswith(b"<VRTDataset"):
        # VRT content under a non-.vrt name (the reference probes by
        # content; DIMAP fixtures ship IMAGERY.TIF that is a VRT)
        from .vrt import open_vrt
        arr, meta = open_vrt(path)
        return "VRT", arr, meta
    if low.endswith((".h5", ".hdf5")) and buf[:8] == b"\x89HDF\r\n\x1a\n" \
            and b"BathymetryCoverage" in buf[:65536]:
        from .s1xx import decode_s102
        arr, meta = decode_s102(path)
        return "S102", arr, meta
    if low.endswith(".tpkx"):
        from .esric import decode_tpkx
        arr, meta = decode_tpkx(path)
        return "ESRIC", arr, meta
    if low.endswith((".tar", "conf.xml")):
        from .esric import decode_esric, identify_esric
        if identify_esric(path):
            arr, meta = decode_esric(path)
            return "ESRIC", arr, meta
    if low.endswith(".json"):
        from .stacta import decode_stacta, identify_stacta
        if identify_stacta(buf):
            arr, meta = decode_stacta(path)
            return "STACTA", arr, meta
    if low.endswith((".gen", ".thf", ".img")) and buf[:5].isdigit() \
            or low.endswith((".gen", ".thf")) and b"GIN" in buf[:8192]:
        # ISO 8211 raster products: USRP/ASRP vs ADRG by the DSI
        # product tag (for a bare .IMG, probe the sibling .GEN)
        probe = buf[:8192]
        if low.endswith(".img"):
            stem = os.path.splitext(path)[0]
            for cand in (stem + ".GEN", stem + ".gen"):
                if os.path.exists(cand):
                    with open(cand, "rb") as gf:
                        probe = gf.read(8192)
                    break
        if b"USRP" in probe or b"ASRP" in probe:
            from .adrg import decode_srp
            arr, meta = decode_srp(path)
            return "SRP", arr, meta
        if b"ADRG" in probe or b"ARC" in probe[:2048]:
            from .adrg import decode_adrg
            arr, meta = decode_adrg(path)
            return "ADRG", arr, meta
    if low.endswith(".til"):
        from .til import decode_til, identify_til
        if identify_til(buf):
            arr, meta = decode_til(path)
            return "TIL", arr, meta
    if low.endswith(".xml") and b"<product" in buf[:512]:
        from .rs2 import decode_rs2, identify_rs2
        if identify_rs2(buf):
            arr, meta = decode_rs2(path)
            return "RS2", arr, meta
    if low.endswith(".mrf") or b"<MRF_META" in buf[:64]:
        from .mrf import decode_mrf, identify_mrf
        if identify_mrf(buf):
            arr, meta = decode_mrf(path)
            return "MRF", arr, meta
    if low.endswith(".dim") or b"<Dimap_Document" in buf[:1024]:
        from .dimap import decode_dimap, identify_dimap
        if identify_dimap(buf):
            arr, meta = decode_dimap(path)
            return "DIMAP", arr, meta
    if buf[:9] == b"SIMPLE  =":
        from .fits import decode_fits
        arr, meta = decode_fits(buf)
        return "FITS", arr, meta
    if buf[:27] == b"RUU CROSS SYSTEM MAP FORMAT":
        from .pcraster import decode_pcraster
        arr, meta = decode_pcraster(buf)
        return "PCRaster", arr, meta
    if low.endswith(("sirc.hdr", "sirc.img")):
        from .cpg import decode_cpg_sirc, identify_cpg_path
        if identify_cpg_path(path):
            arr, meta = decode_cpg_sirc(path)
            return "CPG", arr, meta
    if low.endswith(".dat") and len(buf) >= 640:
        from .iris import decode_iris, identify_iris
        if identify_iris(buf):
            arr, meta = decode_iris(buf)
            return "IRIS", arr, meta
    if buf[:8] == b"PCIDSK  ":
        from .pcidsk import decode_pcidsk
        arr, meta = decode_pcidsk(buf)
        return "PCIDSK", arr, meta
    if buf[:6] == b"HF2\x00\x00\x00" or (
            buf[:2] == b"\x1f\x8b" and low.endswith((".hf2.gz", ".hfz"))):
        from .gridformats import decode_hf2
        arr, meta = decode_hf2(buf)
        return "HF2", arr, meta
    if low.endswith(".tga"):
        from .tga import decode_tga, identify_tga
        if identify_tga(buf, path):
            arr, meta = decode_tga(buf)
            return "TGA", arr, meta
    if low.endswith(".grd"):
        from .rraster import decode_rraster, identify_rraster
        if identify_rraster(path):
            arr, meta = decode_rraster(path)
            return "RRASTER", arr, meta
    if low.endswith(".lcp"):
        from .lcp import decode_lcp, identify_lcp
        if identify_lcp(buf):
            arr, meta = decode_lcp(buf, path=path)
            return "LCP", arr, meta
    if low.endswith((".zmap", ".dat", ".zycor", ".grd")):
        from .gridformats import decode_zmap, identify_zmap
        if identify_zmap(buf):
            arr, meta = decode_zmap(buf)
            return "ZMap", arr, meta
    if low.endswith(".mem"):
        from .gridformats import decode_jdem, identify_jdem
        if identify_jdem(buf):
            arr, meta = decode_jdem(buf)
            return "JDEM", arr, meta
    if low.endswith((".hgt", ".hgts")):
        from .srtmhgt import decode_srtmhgt, identify_srtmhgt
        if identify_srtmhgt(buf, path):
            arr, meta = decode_srtmhgt(buf, path)
            return "SRTMHGT", arr, meta
    if low.endswith(".ace2"):
        from .srtmhgt import decode_ace2, identify_ace2
        if identify_ace2(path):
            arr, meta = decode_ace2(path)
            return "ACE2", arr, meta
    if low.endswith(".hdr") and buf.lstrip()[:16].startswith(
            b"IMAGINE_RAW_FILE"):
        from .rawmisc import decode_eir
        arr, meta = decode_eir(path)
        return "EIR", arr, meta
    if low.endswith(".hdr") and buf[:15] == b"Format version:" \
            and b"NOHRSC" in buf[:80]:
        from .rawmisc import decode_snodas
        arr, meta = decode_snodas(path)
        return "SNODAS", arr, meta
    if low.endswith((".bil", ".bsq", ".bip")):
        _gb_hdr = path[:path.rfind(".")] + ".hdr"
        if os.path.exists(_gb_hdr) and \
                b"BANDS:" in open(_gb_hdr, "rb").read(2048):
            from .rawmisc import decode_genbin
            arr, meta = decode_genbin(path)
            return "GenBin", arr, meta
    if os.path.exists(path + ".xml") and \
            b"<imageFile" in open(path + ".xml", "rb").read(256):
        from .rawmisc import decode_isce
        arr, meta = decode_isce(path)
        return "ISCE", arr, meta
    if os.path.exists(path + ".rsc"):
        from .rawmisc import decode_roipac
        arr, meta = decode_roipac(path)
        return "ROI_PAC", arr, meta
    if buf[:13].upper() == b"NDF_REVISION=" and buf[13:14] in b"02":
        from .rawmisc import decode_ndf
        arr, meta = decode_ndf(path)
        return "NDF", arr, meta
    if low.endswith(".hdr") and buf.lstrip()[:4] == b"ENVI":
        from .envi import decode_envi
        arr, meta = decode_envi(path)
        return "ENVI", arr, meta
    if low.endswith(".ers"):
        from .rawbin import decode_ers, identify_ers
        if identify_ers(path):
            arr, meta = decode_ers(path)
            return "ERS", arr, meta
    if low.endswith((".bil", ".flt", ".bsq", ".bip")) or \
            low.endswith(".hdr"):
        from .rawbin import decode_ehdr, identify_ehdr
        if identify_ehdr(path):
            arr, meta = decode_ehdr(path)
            return "EHdr", arr, meta
    if buf[:4] == b"UHL1":
        from .dted import decode_dted
        arr, meta = decode_dted(buf)
        return "DTED", arr, meta
    if buf[:15] == b"EHFA_HEADER_TAG":
        from .hfa import decode_hfa
        arr, meta = decode_hfa(path)
        return "HFA", arr, meta
    if low.endswith(".gtx"):
        from .gtx import decode_gtx, identify_gtx
        if identify_gtx(buf, path):
            arr, meta = decode_gtx(buf)
            return "GTX", arr, meta
    if buf.lstrip()[:5] == b"<?xml" and b"Product_Observational" \
            in buf[:2048]:
        from .pds4 import decode_pds4
        arr, meta = decode_pds4(buf, path=path)
        return "PDS4", arr, meta
    if buf[:7] == b"CCSD3ZF" and b"QUBE" in buf[:2048]:
        from .isis2 import decode_isis2
        arr, meta = decode_isis2(buf)
        return "ISIS2", arr, meta
    if buf[:8].startswith(b"LBLSIZE"):
        from .vicar import decode_vicar
        arr, meta = decode_vicar(buf)
        return "VICAR", arr, meta
    if b"PDS_VERSION_ID" in buf[:512] and b"PDS3" in buf[:512]:
        from .pds import decode_pds
        arr, meta = decode_pds(buf, path=path)
        return "PDS", arr, meta
    if buf[:6] == b"Object" and b"IsisCube" in buf[:256]:
        from .isis3 import decode_isis3
        arr, meta = decode_isis3(buf, path=path)
        return "ISIS3", arr, meta
    if buf[:4] in (b"NITF", b"NSIF"):
        from .nitf import decode_nitf
        arr, meta = decode_nitf(buf)
        return "NITF", arr, meta
    if low.endswith((".kap", ".nos")):
        from .bsb import decode_bsb, identify_bsb
        if identify_bsb(buf):
            arr, meta = decode_bsb(buf)
            return "BSB", arr, meta
    if low.endswith(".mpr") and b"[Ilwis]" in buf[:4096]:
        from .ilwis import decode_ilwis
        arr, meta = decode_ilwis(path)
        return "ILWIS", arr, meta
    if low.endswith((".byn", ".err")):
        from .byn import decode_byn, identify_byn
        if identify_byn(buf, path):
            arr, meta = decode_byn(buf)
            return "BYN", arr, meta
    if low.endswith(".gxf"):
        from .gxf import decode_gxf, identify_gxf
        if identify_gxf(buf):
            arr, meta = decode_gxf(buf)
            return "GXF", arr, meta
    if buf[:7] == b"binterr":
        from .simplerasters import decode_bt
        arr, meta = decode_bt(buf)
        return "BT", arr, meta
    if buf[:4] == b"KRO\x01":
        from .simplerasters import decode_kro
        arr, meta = decode_kro(buf)
        return "KRO", arr, meta
    if buf[:6] in (b"HEAD74", b"HEADER") and buf[16:24] != b"S LAT   ":
        from .simplerasters import decode_lan
        arr, meta = decode_lan(buf)
        return "LAN", arr, meta
    if buf[:2] in (b"P5", b"P6") and buf[2:3] in b" \t\n\r":
        from .simplerasters import decode_pnm
        arr, meta = decode_pnm(buf)
        return "PNM", arr, meta
    if buf[:8] == b"NUM_OREC":
        from .simplerasters import decode_ntv2
        arr, meta = decode_ntv2(buf)
        return "NTV2", arr, meta
    if low.endswith(".rst"):
        from .simplerasters import decode_rst
        arr, meta = decode_rst(path)
        return "RST", arr, meta
    if low.endswith((".sdat", ".sgrd", ".sg-grd-z")):
        from .simplerasters import decode_saga
        arr, meta = decode_saga(path)
        return "SAGA", arr, meta
    if low.endswith(".dem") or low.endswith("deme"):
        from .usgsdem import decode_usgsdem, identify_usgsdem
        if identify_usgsdem(buf):
            arr, meta = decode_usgsdem(buf)
            return "USGSDEM", arr, meta
    if buf[:16] == b"TERRAGENTERRAIN ":
        from .rawformats import decode_terragen
        arr, meta = decode_terragen(buf)
        return "TERRAGEN", arr, meta
    if buf[:4] == b"trrn":
        from .rawformats import decode_leveller
        arr, meta = decode_leveller(buf)
        return "LEVELLER", arr, meta
    if buf.lstrip()[:21].upper() == b"BEGIN_USGS_DOQ_HEADER":
        from .rawformats import decode_doq2
        arr, meta = decode_doq2(buf)
        return "DOQ2", arr, meta
    if low.endswith(".hdr") and b"IMAGE_FILE_FORMAT" in buf[:256]:
        from .rawformats import decode_mff
        arr, meta = decode_mff(path)
        return "MFF", arr, meta
    if os.path.exists(path + ".aux") or (
            low.endswith(".raw")
            and os.path.exists(os.path.splitext(path)[0] + ".aux")):
        from .rawformats import decode_paux
        arr, meta = decode_paux(path)
        return "PAux", arr, meta
    if low.endswith((".fst", ".dat")) or low[-4:-2] in (".0", ".1"):
        from .fast import decode_fast, identify_fast
        if identify_fast(buf):
            arr, meta = decode_fast(path)
            return "FAST", arr, meta
    if low.endswith(".gsc"):
        from .rawformats import decode_gsc, identify_gsc
        if identify_gsc(buf):
            arr, meta = decode_gsc(buf)
            return "GSC", arr, meta
    if low.endswith(".doq"):
        from .rawformats import decode_doq1
        arr, meta = decode_doq1(buf)
        return "DOQ1", arr, meta
    if buf[:4] in (b"DSAA", b"DSBB", b"DSRB"):
        from .surfer import (decode_gs7bg, decode_gsag, decode_gsbg,
                             identify_surfer)
        name = identify_surfer(buf)
        dec = {"GSAG": decode_gsag, "GSBG": decode_gsbg,
               "GS7BG": decode_gs7bg}[name]
        arr, meta = dec(buf)
        return name, arr, meta
    if low.endswith(".b"):
        from .rawmisc import decode_noaa_b, identify_noaa_b
        if identify_noaa_b(buf, path):
            arr, meta = decode_noaa_b(buf)
            return "NOAA_B", arr, meta
    if low.endswith((".los", ".las", ".geo")):
        from .rawmisc import decode_loslas, identify_loslas
        if identify_loslas(buf, path):
            arr, meta = decode_loslas(buf)
            return "LOSLAS", arr, meta
    if low.endswith(".bin"):
        from .rawmisc import (decode_ngsgeoid, decode_nsidcbin,
                              identify_ngsgeoid, identify_nsidcbin)
        if identify_ngsgeoid(buf):
            arr, meta = decode_ngsgeoid(buf)
            return "NGSGEOID", arr, meta
        if identify_nsidcbin(buf, path):
            arr, meta = decode_nsidcbin(buf)
            return "NSIDCbin", arr, meta
    from .rawmisc import identify_ctg
    if identify_ctg(buf):
        from .rawmisc import decode_ctg
        arr, meta = decode_ctg(buf)
        return "CTG", arr, meta
    return open_raster(buf)


def write_raster(arr: np.ndarray, driver: str, **kwargs) -> bytes:
    if driver not in DRIVERS:
        raise ValueError(f"unknown raster driver {driver!r} "
                         f"(have {sorted(DRIVERS)})")
    return DRIVERS[driver][2](arr, **kwargs)


def read_raster_pixels(paths: Union[str, List[str]],
                       drop_zero: bool = False, **kwargs) -> ray.data.Dataset:
    """Raster file(s) of ANY registered format -> pixel rows
    (path, band, y, x, value). Streams per file; each decode touches
    only its own raster (scale unit = one file)."""
    exts = [e.lstrip(".") for (es, _d, _e) in DRIVERS.values() for e in es]
    # path-context formats (sibling data/header files)
    exts += ["ers", "bil", "flt", "bsq", "bip", "hgt", "hdr",
             "img", "rrd", "grd", "gtx", "cub", "lbl", "vic", "xml", "gxf",
             "byn", "mpr", "kap", "ntf", "nsf", "bt", "kro", "lan", "gis",
             "pgm", "ppm", "rst", "sdat", "sgrd", "gsb", "dem",
             "til", "mrf", "lcp", "map", "dat", "dim"]
    kwargs.setdefault("file_extensions", exts)
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def explode(batch: pa.Table) -> pa.Table:
        cols = {"path": [], "band": [], "y": [], "x": [], "value": []}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            try:
                if identify(buf) is not None:
                    _name, arr, _meta = open_raster(buf)
                else:
                    # sibling-file formats re-open by path
                    _name, arr, _meta = open_raster_path(path)
            except ValueError:
                # a directory scan tolerates stray non-raster files
                # sharing a registered extension (.txt, .dat, ...)
                continue
            if arr.ndim == 2:
                arr = arr[:, :, None]
            h, w, bands = arr.shape
            for b in range(bands):
                plane = arr[:, :, b]
                if drop_zero:
                    yy, xx = np.nonzero(plane)
                else:
                    yy, xx = np.mgrid[0:h, 0:w]
                    yy, xx = yy.ravel(), xx.ravel()
                n = len(yy)
                cols["path"].append(np.full(n, path, dtype=object))
                cols["band"].append(np.full(n, b, dtype=np.int32))
                cols["y"].append(yy.astype(np.int32))
                cols["x"].append(xx.astype(np.int32))
                cols["value"].append(plane[yy, xx].astype(np.float64))
        if not cols["path"]:
            return pa.table({"path": pa.array([], pa.string()),
                             "band": pa.array([], pa.int32()),
                             "y": pa.array([], pa.int32()),
                             "x": pa.array([], pa.int32()),
                             "value": pa.array([], pa.float64())})
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in cols.items()})

    return raw.map_batches(explode, batch_format="pyarrow")


def raster_index(paths: Union[str, List[str]], **kwargs) -> ray.data.Dataset:
    """gdaltindex analog: one row per raster file with georeferenced
    bounds — header-only for GeoTIFF (tags parsed, pixel blocks never
    decompressed), full decode for headerless formats. The index table
    is what a 100-TB mosaic plans reads against (which files intersect
    this tile) without touching pixel data."""
    from ..codecs.tiff import decode_geotiff_meta

    exts = [e.lstrip(".") for (es, _d, _e) in DRIVERS.values() for e in es]
    kwargs.setdefault("file_extensions", exts)
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def describe(batch: pa.Table) -> pa.Table:
        rows = {"path": [], "driver": [], "width": [], "height": [],
                "bands": [], "dtype": [], "epsg": [],
                "xmin": [], "ymin": [], "xmax": [], "ymax": []}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            name = identify(buf)
            if name is None:
                continue
            if name == "GTiff":
                meta = decode_geotiff_meta(buf)
                arr_shape = (meta["height"], meta["width"])
                bands, dtype = meta["bands"], meta["dtype"]
            else:
                _n, arr, meta = open_raster(buf)
                arr_shape = arr.shape[:2]
                bands = 1 if arr.ndim == 2 else arr.shape[2]
                dtype = str(arr.dtype)
                meta = dict(meta, transform=None, epsg=None)
            h, w = arr_shape
            tf = meta.get("transform")
            if tf is not None:
                x0, pxw, _r0, y0, _r1, pxh = tf
                xmin, xmax = x0, x0 + pxw * w
                ymax, ymin = y0, y0 + pxh * h
            else:  # pixel space
                xmin, ymin, xmax, ymax = 0.0, 0.0, float(w), float(h)
            rows["path"].append(path)
            rows["driver"].append(name)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["bands"].append(bands)
            rows["dtype"].append(dtype)
            rows["epsg"].append(meta.get("epsg"))
            rows["xmin"].append(xmin)
            rows["ymin"].append(ymin)
            rows["xmax"].append(xmax)
            rows["ymax"].append(ymax)
        return pa.table({
            "path": pa.array(rows["path"], pa.string()),
            "driver": pa.array(rows["driver"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "bands": pa.array(rows["bands"], pa.int32()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "epsg": pa.array(rows["epsg"], pa.int32()),
            "xmin": pa.array(rows["xmin"], pa.float64()),
            "ymin": pa.array(rows["ymin"], pa.float64()),
            "xmax": pa.array(rows["xmax"], pa.float64()),
            "ymax": pa.array(rows["ymax"], pa.float64()),
        })

    return raw.map_batches(describe, batch_format="pyarrow")
