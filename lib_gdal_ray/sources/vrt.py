"""VRT (GDAL Virtual Raster) XML datasets over the codec registry.

Parity target: `frmts/vrt/vrtdataset.cpp` (XMLInit / SerializeToXML),
`frmts/vrt/vrtsources.cpp` (VRTSimpleSource / VRTComplexSource window
math: SrcRect -> DstRect nearest resample, NODATA masking,
ScaleOffset/ScaleRatio), `frmts/vrt/vrtderivedrasterband.cpp`
(PixelFunctionType dispatch into the pixel-function registry) and
`apps/gdalbuildvrt_lib.cpp` (union-grid mosaic VRT authoring).

A VRT is a *plan*, not pixels. The driver-side `materialize_vrt`
composites in-process (one raster's worth of memory — the GDAL
RasterIO contract); the Ray-native `read_vrt_pixels` turns each
(band, source) into its own decode task and composites overlaps with
the last-wins mosaic fold, so an N-source VRT reads with N-way
parallelism and no single task ever holds more than one source tile.
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

_DTYPE_MAP = {
    "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "Float32": np.float32, "Float64": np.float64,
}
_DTYPE_NAMES = {v: k for k, v in _DTYPE_MAP.items()}


@dataclass
class VRTSource:
    filename: str
    band: int = 1                       # 1-based source band
    src_rect: Optional[Tuple[float, float, float, float]] = None
    dst_rect: Optional[Tuple[float, float, float, float]] = None
    kind: str = "simple"                # "simple" | "complex"
    scale_ratio: float = 1.0
    scale_offset: float = 0.0
    nodata: Optional[float] = None      # ComplexSource <NODATA>
    relative: bool = False


@dataclass
class VRTBand:
    band: int = 1
    dtype: str = "Float64"
    nodata: Optional[float] = None
    color_interp: Optional[str] = None
    subclass: Optional[str] = None      # "VRTDerivedRasterBand"
    pixel_function: Optional[str] = None
    pixel_function_args: Dict[str, str] = field(default_factory=dict)
    sources: List[VRTSource] = field(default_factory=list)


@dataclass
class VRTDataset:
    xsize: int
    ysize: int
    geotransform: Optional[Tuple[float, ...]] = None
    srs: Optional[str] = None           # WKT or EPSG:n text as written
    bands: List[VRTBand] = field(default_factory=list)
    metadata: Dict[str, str] = field(default_factory=dict)
    base_dir: str = ""                  # directory of the .vrt file


def _rect(el) -> Tuple[float, float, float, float]:
    return (float(el.get("xOff", 0)), float(el.get("yOff", 0)),
            float(el.get("xSize", 0)), float(el.get("ySize", 0)))


def parse_vrt(text: str, base_dir: str = "") -> VRTDataset:
    """<VRTDataset> XML -> model (vrtdataset.cpp VRTDataset::XMLInit)."""
    root = ET.fromstring(text)
    if root.tag != "VRTDataset":
        raise ValueError(f"not a VRTDataset (root <{root.tag}>)")
    ds = VRTDataset(xsize=int(root.get("rasterXSize")),
                    ysize=int(root.get("rasterYSize")),
                    base_dir=base_dir)
    gt = root.find("GeoTransform")
    if gt is not None and gt.text:
        ds.geotransform = tuple(float(v) for v in gt.text.split(","))
    srs = root.find("SRS")
    if srs is not None and srs.text:
        ds.srs = srs.text.strip()
    md = root.find("Metadata")
    if md is not None:
        for mdi in md.findall("MDI"):
            ds.metadata[mdi.get("key", "")] = mdi.text or ""
    for bel in root.findall("VRTRasterBand"):
        band = VRTBand(band=int(bel.get("band", len(ds.bands) + 1)),
                       dtype=bel.get("dataType", "Float64"),
                       subclass=bel.get("subClass"))
        ci = bel.find("ColorInterp")
        if ci is not None and ci.text:
            band.color_interp = ci.text.strip()
        nd = bel.find("NodataValue")
        if nd is None:
            nd = bel.find("NoDataValue")
        if nd is not None and nd.text:
            band.nodata = float(nd.text)
        pf = bel.find("PixelFunctionType")
        if pf is not None and pf.text:
            band.pixel_function = pf.text.strip()
        pfa = bel.find("PixelFunctionArguments")
        if pfa is not None:
            band.pixel_function_args = dict(pfa.attrib)
        for tag, kind in (("SimpleSource", "simple"),
                          ("ComplexSource", "complex"),
                          ("AveragedSource", "simple")):
            for sel in bel.findall(tag):
                fn_el = sel.find("SourceFilename")
                src = VRTSource(
                    filename=(fn_el.text or "").strip(),
                    band=int((sel.findtext("SourceBand") or "1").strip()),
                    kind=kind,
                    relative=(fn_el.get("relativeToVRT", "0") == "1"))
                sr, dr = sel.find("SrcRect"), sel.find("DstRect")
                if sr is not None:
                    src.src_rect = _rect(sr)
                if dr is not None:
                    src.dst_rect = _rect(dr)
                if kind == "complex":
                    so = sel.findtext("ScaleOffset")
                    srt = sel.findtext("ScaleRatio")
                    ndv = sel.findtext("NODATA")
                    if so:
                        src.scale_offset = float(so)
                    if srt:
                        src.scale_ratio = float(srt)
                    if ndv:
                        src.nodata = float(ndv)
                band.sources.append(src)
        ds.bands.append(band)
    return ds


def _fmt_gt(gt: Sequence[float]) -> str:
    return ", ".join(f"{v:.16e}" for v in gt)


def serialize_vrt(ds: VRTDataset) -> str:
    """Model -> <VRTDataset> XML (VRTDataset::SerializeToXML)."""
    root = ET.Element("VRTDataset", rasterXSize=str(ds.xsize),
                      rasterYSize=str(ds.ysize))
    if ds.srs:
        ET.SubElement(root, "SRS").text = ds.srs
    if ds.geotransform:
        ET.SubElement(root, "GeoTransform").text = _fmt_gt(ds.geotransform)
    if ds.metadata:
        md = ET.SubElement(root, "Metadata")
        for k, v in ds.metadata.items():
            ET.SubElement(md, "MDI", key=k).text = v
    for b in ds.bands:
        attrs = {"dataType": b.dtype, "band": str(b.band)}
        if b.subclass:
            attrs["subClass"] = b.subclass
        bel = ET.SubElement(root, "VRTRasterBand", **attrs)
        if b.color_interp:
            ET.SubElement(bel, "ColorInterp").text = b.color_interp
        if b.nodata is not None:
            ET.SubElement(bel, "NoDataValue").text = repr(b.nodata)
        if b.pixel_function:
            ET.SubElement(bel, "PixelFunctionType").text = b.pixel_function
            if b.pixel_function_args:
                ET.SubElement(bel, "PixelFunctionArguments",
                              **{k: str(v) for k, v
                                 in b.pixel_function_args.items()})
        for s in b.sources:
            tag = "ComplexSource" if s.kind == "complex" else "SimpleSource"
            sel = ET.SubElement(bel, tag)
            fn = ET.SubElement(sel, "SourceFilename",
                               relativeToVRT="1" if s.relative else "0")
            fn.text = s.filename
            ET.SubElement(sel, "SourceBand").text = str(s.band)
            if s.src_rect:
                x, y, w, h = s.src_rect
                ET.SubElement(sel, "SrcRect", xOff=repr(x), yOff=repr(y),
                              xSize=repr(w), ySize=repr(h))
            if s.dst_rect:
                x, y, w, h = s.dst_rect
                ET.SubElement(sel, "DstRect", xOff=repr(x), yOff=repr(y),
                              xSize=repr(w), ySize=repr(h))
            if s.kind == "complex":
                if s.scale_offset != 0.0:
                    ET.SubElement(sel, "ScaleOffset").text = repr(s.scale_offset)
                if s.scale_ratio != 1.0:
                    ET.SubElement(sel, "ScaleRatio").text = repr(s.scale_ratio)
                if s.nodata is not None:
                    ET.SubElement(sel, "NODATA").text = repr(s.nodata)
    ET.indent(root)
    return ET.tostring(root, encoding="unicode")


def _source_path(ds: VRTDataset, s: VRTSource) -> str:
    if s.relative and ds.base_dir:
        return os.path.join(ds.base_dir, s.filename)
    return s.filename


def _decode_source(path: str, cache: Optional[dict] = None):
    """Decode one referenced raster -> (H, W, B) float array.

    Nested .vrt sources recurse (GDAL opens sources through GDALOpen,
    so a VRT-of-VRTs is legal)."""
    if cache is not None and path in cache:
        return cache[path]
    if path.lower().endswith(".vrt"):
        arr, _meta = open_vrt(path)
    else:
        from .rasters import open_raster
        with open(path, "rb") as f:
            _name, arr, _meta = open_raster(f.read())
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if cache is not None:
        cache[path] = arr
    return arr


def _resample_window(plane: np.ndarray, src_rect, dst_rect, out_w, out_h):
    """SrcRect -> DstRect nearest resample clipped to the VRT grid.

    Returns (dst_y_idx, dst_x_idx, values) for the destination pixels
    this source writes — center-point nearest mapping like
    VRTSimpleSource::RasterIO's non-resampled path (vrtsources.cpp
    GetSrcDstWindow + nearest IRasterIO)."""
    sh, sw = plane.shape
    sx, sy, sxs, sys = src_rect if src_rect else (0.0, 0.0, sw, sh)
    dx, dy, dxs, dys = dst_rect if dst_rect else (0.0, 0.0, sxs, sys)
    # integer destination window clipped to the VRT grid
    x0 = max(int(math.floor(dx + 0.5)), 0)
    y0 = max(int(math.floor(dy + 0.5)), 0)
    x1 = min(int(math.floor(dx + dxs + 0.5)), out_w)
    y1 = min(int(math.floor(dy + dys + 0.5)), out_h)
    if x1 <= x0 or y1 <= y0:
        e = np.array([], dtype=np.int64)
        return e, e, np.array([], dtype=plane.dtype)
    xs = np.arange(x0, x1)
    ys = np.arange(y0, y1)
    # dst pixel center -> src pixel (floor), clipped to the src window
    sxi = np.floor(sx + (xs + 0.5 - dx) * (sxs / dxs)).astype(np.int64)
    syi = np.floor(sy + (ys + 0.5 - dy) * (sys / dys)).astype(np.int64)
    np.clip(sxi, max(int(sx), 0), min(int(math.ceil(sx + sxs)), sw) - 1,
            out=sxi)
    np.clip(syi, max(int(sy), 0), min(int(math.ceil(sy + sys)), sh) - 1,
            out=syi)
    vals = plane[syi[:, None], sxi[None, :]]
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return yy.ravel(), xx.ravel(), vals.ravel()


def _composite_band(ds: VRTDataset, band: VRTBand, cache: dict) -> np.ndarray:
    """One band's sources pasted in document order (last wins), float64."""
    fill = band.nodata if band.nodata is not None else 0.0
    out = np.full((ds.ysize, ds.xsize), float(fill), dtype=np.float64)
    if band.subclass == "VRTDerivedRasterBand" and band.pixel_function:
        from ..pipelines.raster_calc import _PIXFN
        planes = []
        for s in band.sources:
            arr = _decode_source(_source_path(ds, s), cache)
            plane = arr[:, :, s.band - 1]
            p = np.zeros((ds.ysize, ds.xsize), dtype=np.float64)
            yy, xx, vv = _resample_window(plane, s.src_rect, s.dst_rect,
                                          ds.xsize, ds.ysize)
            p[yy, xx] = vv
            planes.append(p.ravel())
        V = np.stack(planes) if planes else np.zeros((1, out.size))
        fn = _PIXFN.get(band.pixel_function)
        if fn is None:
            raise ValueError(f"unregistered pixel function "
                             f"{band.pixel_function!r}")
        return fn(V, dict(band.pixel_function_args)).reshape(out.shape)
    for s in band.sources:
        arr = _decode_source(_source_path(ds, s), cache)
        plane = arr[:, :, s.band - 1]
        yy, xx, vv = _resample_window(plane, s.src_rect, s.dst_rect,
                                      ds.xsize, ds.ysize)
        vv = vv.astype(np.float64)
        if s.nodata is not None:
            keep = vv != s.nodata
            yy, xx, vv = yy[keep], xx[keep], vv[keep]
        if s.kind == "complex":
            vv = vv * s.scale_ratio + s.scale_offset
        out[yy, xx] = vv
    return out


def materialize_vrt(ds: VRTDataset) -> Tuple[np.ndarray, dict]:
    """Full in-process composite -> ((H, W) or (H, W, B) array, meta).

    Driver-side convenience for small VRTs (the GDALDataset::RasterIO
    whole-image read); the Ray path is `read_vrt_pixels`."""
    cache: dict = {}
    planes = []
    for b in ds.bands:
        p = _composite_band(ds, b, cache)
        np_dt = _DTYPE_MAP.get(b.dtype, np.float64)
        if np.issubdtype(np_dt, np.integer):
            info = np.iinfo(np_dt)
            p = np.clip(np.rint(p), info.min, info.max)
        planes.append(p.astype(np_dt))
    arr = np.stack(planes, axis=-1) if len(planes) > 1 else planes[0]
    meta = {"width": ds.xsize, "height": ds.ysize,
            "bands": len(ds.bands), "transform": ds.geotransform,
            "srs": ds.srs,
            "nodata": ds.bands[0].nodata if ds.bands else None}
    return arr, meta


def open_vrt(path: str) -> Tuple[np.ndarray, dict]:
    with open(path) as f:
        text = f.read()
    return materialize_vrt(parse_vrt(text, os.path.dirname(path)))


def _spec_rows(vrt: VRTDataset, b: VRTBand, s: VRTSource, out_band: int,
               W: int, H: int, drop_zero: bool = False) -> pa.Table:
    """Decode ONE source and window it into VRT grid rows."""
    arr = _decode_source(_source_path(vrt, s), None)
    plane = arr[:, :, s.band - 1]
    yy, xx, vv = _resample_window(plane, s.src_rect, s.dst_rect, W, H)
    vv = vv.astype(np.float64)
    if s.nodata is not None:
        keep = vv != s.nodata
        yy, xx, vv = yy[keep], xx[keep], vv[keep]
    if s.kind == "complex":
        vv = vv * s.scale_ratio + s.scale_offset
    if drop_zero:
        keep = vv != 0
        yy, xx, vv = yy[keep], xx[keep], vv[keep]
    return pa.table({"band": pa.array(np.full(len(vv), out_band,
                                              dtype=np.int32)),
                     "y": pa.array(yy.astype(np.int32)),
                     "x": pa.array(xx.astype(np.int32)),
                     "value": pa.array(vv)})


def read_vrt_pixels(path: str, drop_zero: bool = False) -> ray.data.Dataset:
    """Ray-native VRT read: one decode task per (band, source), rows
    (band, y, x, value) in VRT grid coordinates.

    Bands whose sources never overlap (the gdalbuildvrt mosaic case —
    the overwhelmingly common one) ride ONE Dataset: from_items over
    the (band, source) spec list, one block per spec, flat_map decode.
    No union chain, no shuffle; a 10k-tile VRT is a 10k-block plan.
    Bands with overlapping sources or a pixel function composite
    through the bounded mosaic / pixel-function folds (one groupby on
    pix_id) — those VRTs have few sources by construction.
    """
    with open(path) as f:
        vrt = parse_vrt(f.read(), os.path.dirname(path))
    W, H = vrt.xsize, vrt.ysize

    def _iwin(s: VRTSource) -> Tuple[int, int, int, int]:
        """The integer destination window a source actually writes —
        the same floor(off + 0.5) math as _resample_window, so two
        tiles that merely touch at float-fuzzed edges are disjoint."""
        dx, dy, dxs, dys = s.dst_rect or (0.0, 0.0, float(W), float(H))
        return (max(int(math.floor(dx + 0.5)), 0),
                max(int(math.floor(dy + 0.5)), 0),
                min(int(math.floor(dx + dxs + 0.5)), W),
                min(int(math.floor(dy + dys + 0.5)), H))

    def _overlaps(srcs: List[VRTSource]) -> bool:
        wins = [_iwin(s) for s in srcs]
        for i in range(len(wins)):
            for j in range(i + 1, len(wins)):
                a, b = wins[i], wins[j]
                if (a[0] < b[2] and b[0] < a[2]
                        and a[1] < b[3] and b[1] < a[3]):
                    return True
        return False

    flat_specs: List[dict] = []   # non-overlapping plain bands
    per_band: List[ray.data.Dataset] = []
    for bi, b in enumerate(vrt.bands):
        srcs = b.sources or []
        if not srcs:
            continue
        if b.subclass == "VRTDerivedRasterBand" and b.pixel_function:
            from ..pipelines.raster_calc import pixel_calc_multi
            inputs = []
            for s in srcs:
                one = ray.data.from_items([0]).map_batches(
                    lambda _t, _b=b, _s=s: _to_pix(
                        _spec_rows(vrt, _b, _s, bi, W, H), W),
                    batch_format="pyarrow")
                inputs.append(one)
            derived = pixel_calc_multi(inputs, b.pixel_function,
                                       dict(b.pixel_function_args),
                                       keep_empty=not drop_zero)
            per_band.append(_from_pix(derived, bi, W))
        elif len(srcs) > 1 and _overlaps(srcs):
            from ..pipelines.mosaic import mosaic
            layers = []
            for s in srcs:
                one = ray.data.from_items([0]).map_batches(
                    lambda _t, _b=b, _s=s: _to_pix(
                        _spec_rows(vrt, _b, _s, bi, W, H), W),
                    batch_format="pyarrow")
                layers.append(one)
            per_band.append(_from_pix(mosaic(layers), bi, W))
        else:
            flat_specs.extend({"b": bi, "s": si} for si in range(len(srcs)))
    if flat_specs:
        base = ray.data.from_items(flat_specs,
                                   override_num_blocks=len(flat_specs))

        def decode(batch: pa.Table) -> pa.Table:
            outs = []
            for bi, si in zip(batch["b"].to_pylist(),
                              batch["s"].to_pylist()):
                band = vrt.bands[bi]
                outs.append(_spec_rows(vrt, band, band.sources[si],
                                       bi, W, H, drop_zero=drop_zero))
            return pa.concat_tables(outs) if outs else pa.table(
                {"band": pa.array([], pa.int32()),
                 "y": pa.array([], pa.int32()),
                 "x": pa.array([], pa.int32()),
                 "value": pa.array([], pa.float64())})

        per_band.insert(0, base.map_batches(decode, batch_format="pyarrow"))
    if not per_band:
        raise ValueError("VRT has no sourced bands")
    out = per_band[0]
    for d in per_band[1:]:
        out = out.union(d)
    if drop_zero and len(per_band) > 1:
        # folded bands (mosaic/derived) may still carry zeros —
        # vectorized batch filter, never a per-row Python predicate
        import pyarrow.compute as _pc

        out = out.map_batches(
            lambda t: t.filter(_pc.not_equal(t["value"], 0.0)),
            batch_format="pyarrow")
    return out


def _to_pix(t: pa.Table, width: int) -> pa.Table:
    """(band,y,x,value) table -> (pix_id, burn) for the mosaic fold."""
    y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"pix_id": pa.array(y * width + x),
                     "burn": t["value"]})


def _from_pix(ds: ray.data.Dataset, band: int, width: int) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "band": pa.array(np.full(len(pix), band, dtype=np.int32)),
            "y": pa.array((pix // width).astype(np.int32)),
            "x": pa.array((pix % width).astype(np.int32)),
            "value": pa.array(batch["burn"].to_numpy(zero_copy_only=False)
                              .astype(np.float64)),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def build_vrt(paths: Sequence[str], resolution: str = "highest",
              src_nodata: Optional[float] = None) -> VRTDataset:
    """gdalbuildvrt analog (`apps/gdalbuildvrt_lib.cpp`): union the
    georeferenced extents of the inputs onto one grid and emit one
    SimpleSource (ComplexSource when src_nodata is given) per
    (file, band). Header-only metadata probe per file — pixel blocks
    are never touched at build time."""
    from ..codecs.tiff import decode_geotiff_meta

    infos = []
    for p in paths:
        with open(p, "rb") as f:
            buf = f.read()
        if p.lower().endswith(".vrt"):
            v = parse_vrt(buf.decode(), os.path.dirname(p))
            meta = {"width": v.xsize, "height": v.ysize,
                    "transform": v.geotransform,
                    "bands": len(v.bands),
                    "dtype": (_DTYPE_MAP.get(v.bands[0].dtype, np.float64)
                              (0).dtype.name if v.bands else "float64")}
        else:
            meta = decode_geotiff_meta(buf)
        gt = meta.get("transform")
        if gt is None:
            raise ValueError(f"{p}: not georeferenced (no GeoTransform)")
        if abs(gt[2]) > 0 or abs(gt[4]) > 0:
            raise ValueError(f"{p}: rotated rasters unsupported in buildvrt")
        infos.append((p, meta, gt))

    # union extent; pick target resolution
    res_x = [abs(gt[1]) for (_p, _m, gt) in infos]
    res_y = [abs(gt[5]) for (_p, _m, gt) in infos]
    if resolution == "highest":
        rx, ry = min(res_x), min(res_y)
    elif resolution == "lowest":
        rx, ry = max(res_x), max(res_y)
    else:  # "average"
        rx, ry = float(np.mean(res_x)), float(np.mean(res_y))
    xmin = min(gt[0] for (_p, _m, gt) in infos)
    ymax = max(gt[3] for (_p, _m, gt) in infos)
    xmax = max(gt[0] + gt[1] * m["width"] for (_p, m, gt) in infos)
    ymin = min(gt[3] + gt[5] * m["height"] for (_p, m, gt) in infos)
    W = max(1, int(round((xmax - xmin) / rx)))
    H = max(1, int(round((ymax - ymin) / ry)))
    n_bands = max(m["bands"] for (_p, m, _gt) in infos)
    dt_name = _DTYPE_NAMES.get(np.dtype(infos[0][1]["dtype"]).type, "Float64")

    ds = VRTDataset(xsize=W, ysize=H,
                    geotransform=(xmin, rx, 0.0, ymax, 0.0, -ry))
    epsg = infos[0][1].get("epsg")
    if epsg:
        ds.srs = f"EPSG:{epsg}"
    for bi in range(n_bands):
        band = VRTBand(band=bi + 1, dtype=dt_name)
        for (p, m, gt) in infos:
            if bi >= m["bands"]:
                continue
            dx = (gt[0] - xmin) / rx
            dy = (ymax - gt[3]) / ry
            dxs = m["width"] * abs(gt[1]) / rx
            dys = m["height"] * abs(gt[5]) / ry
            src = VRTSource(
                filename=p, band=bi + 1,
                src_rect=(0.0, 0.0, float(m["width"]), float(m["height"])),
                dst_rect=(dx, dy, dxs, dys),
                kind="complex" if src_nodata is not None else "simple",
                nodata=src_nodata)
            band.sources.append(src)
        ds.bands.append(band)
    return ds


def write_vrt(ds: VRTDataset, path: str) -> None:
    """Serialize to a .vrt file; source paths inside the target
    directory are rewritten relativeToVRT (SerializeToXML parity)."""
    out_dir = os.path.dirname(os.path.abspath(path))
    for b in ds.bands:
        for s in b.sources:
            ap = os.path.abspath(s.filename)
            if not s.relative and ap.startswith(out_dir + os.sep):
                s.filename = os.path.relpath(ap, out_dir)
                s.relative = True
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(serialize_vrt(ds))
        f.write("\n")
    os.replace(tmp, path)
