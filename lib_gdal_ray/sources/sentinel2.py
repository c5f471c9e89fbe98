"""Sentinel-2 SAFE product driver (L1C user products).

Parity target: the reference SENTINEL2 driver
(`frmts/sentinel2/sentinel2dataset.cpp`) on the
`autotest/gdrivers/data/sentinel2/fake_l1c` fixtures
(`sentinel2.py:test_sentinel2_l1c_1/2/3/4`): product metadata keys,
subdataset names/descriptions, granule mosaic placement (size 20984 x
20980 from the two-tile fixture), band order (RGB-fronted 10m list),
and the per-band wavelength table (public ESA MSI constants, the same
values the reference hardcodes).

A SAFE product is a directory tree: the main MTD XML lists granules
and bands; each granule's MTD XML carries per-resolution geocoding
(ULX/ULY/dims); pixels live in per-granule per-band JP2 files. The
subdataset mosaic = union of granule tiles on a common grid.

Ray shape: metadata is driver-side (a handful of small XMLs);
`read_sentinel2_pixels` decodes granule JP2s in parallel — per
(granule, band) file tasks through the JP2 tile-parallel source, with
mosaic offsets applied per task. That IS the satellite-archive scale
unit (a real L1C datatake is hundreds of granule JP2s).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

# Public ESA MSI band constants (band name -> (resolution m,
# wavelength nm, bandwidth nm, color interpretation)); identical to
# the table the reference hardcodes (sentinel2dataset.cpp:65-78).
S2_BANDS = {
    "B1": (60, 443, 20, "coastal"),
    "B2": (10, 490, 65, "blue"),
    "B3": (10, 560, 35, "green"),
    "B4": (10, 665, 30, "red"),
    "B5": (20, 705, 15, "rededge"),
    "B6": (20, 740, 15, "rededge"),
    "B7": (20, 783, 20, "rededge"),
    "B8": (10, 842, 115, "nir"),
    "B8A": (20, 865, 20, "nir"),
    "B9": (60, 945, 20, "nir"),
    "B10": (60, 1375, 30, "otherir"),
    "B11": (20, 1610, 90, "swir"),
    "B12": (20, 2190, 180, "swir"),
}
# bandId index order (ESA numbering: 0=B1 ... 7=B8, 8=B8A, 9=B9 ...)
S2_BANDID_ORDER = ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8",
                   "B8A", "B9", "B10", "B11", "B12"]


def _strip_ns(tag: str) -> str:
    return tag.split("}")[-1]


def _find(el, path: str):
    """Namespace-agnostic single-path find."""
    cur = [el]
    for part in path.split("."):
        nxt = []
        for e in cur:
            for ch in e:
                if _strip_ns(ch.tag) == part:
                    nxt.append(ch)
        cur = nxt
        if not cur:
            return None
    return cur[0]


def _findall(el, name: str):
    out = []
    for e in el.iter():
        if _strip_ns(e.tag) == name:
            out.append(e)
    return out


def _padded(band: str) -> str:
    """B8 -> '08', B8A -> '08A' (the reference's zero-padded sort
    keys; lexicographic order then matches its band sequencing)."""
    n = band[1:]
    return ("0" + n) if int(re.match(r"\d+", n).group()) < 10 else n


def _unpad(padded: str) -> str:
    return "B" + padded.lstrip("0")


def _utm_desc(epsg: int) -> str:
    if 32601 <= epsg <= 32660:
        return f"UTM {epsg - 32600}N"
    if 32701 <= epsg <= 32760:
        return f"UTM {epsg - 32700}S"
    return f"EPSG:{epsg}"


def _granule_mtd_name(granule_id: str) -> Optional[str]:
    """S2A_OPER_MSI_L1C_T32TQR_N01.03 -> S2A_OPER_MTD_L1C_T32TQR.xml
    (sentinel2dataset.cpp granule-id rewrite rule)."""
    g = granule_id
    if (len(g) > 13 and g[8] == "_" and g[12] == "_"
            and len(g) >= 7 and g[-7] == "_" and g[-6] == "N"):
        return g[:9] + "MTD" + g[12:-7] + ".xml"
    return None


def _footprint_wkt(pos_list: str) -> str:
    toks = pos_list.split()
    dim = 3 if (len(toks) % 3 == 0 and len(toks) >= 12
                and toks[0] == toks[-3] and toks[1] == toks[-2]
                and toks[2] == toks[-1]) else 2
    if len(toks) % dim:
        return ""
    pts = []
    for i in range(0, len(toks), dim):
        p = toks[i + 1] + " " + toks[i]
        if dim == 3:
            p += " " + toks[i + 2]
        pts.append(p)
    return "POLYGON((" + ", ".join(pts) + "))"


def parse_sentinel2_product(xml_path: str) -> Dict:
    """Main MTD XML -> {"metadata", "bands", "granules", "level",
    "res_bands"} (L1C or L2A user products)."""
    root = ET.parse(xml_path).getroot()
    tag = _strip_ns(root.tag)
    if tag == "Level-1C_User_Product":
        level = "L1C"
    elif tag == "Level-2A_User_Product":
        level = "L2A"
    else:
        raise ValueError("not a Sentinel-2 L1C/L2A user product")
    gi = _find(root, "General_Info")
    pi = None
    if gi is not None:
        pi = _find(gi, "L2A_Product_Info" if level == "L2A"
                   else "Product_Info")
    if pi is None:
        raise ValueError("Cannot find Product_Info")
    md: Dict[str, str] = {}
    for tag in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME", "PRODUCT_URI",
                "PROCESSING_LEVEL", "PRODUCT_TYPE", "PROCESSING_BASELINE",
                "GENERATION_TIME", "PREVIEW_IMAGE_URL",
                "PREVIEW_GEO_INFO"):
        el = _find(pi, tag)
        if el is not None and el.text:
            md[tag] = el.text
    dt = _find(pi, "Datatake")
    if dt is not None:
        md["DATATAKE_1_ID"] = dt.get("datatakeIdentifier", "")
        for ch in dt:
            if ch.text:
                md["DATATAKE_1_" + _strip_ns(ch.tag)] = ch.text
    pic = _find(gi, "L2A_Product_Image_Characteristics"
                if level == "L2A" else "Product_Image_Characteristics")
    if pic is not None:
        if level == "L2A":
            # quantification values carry their unit attribute
            for qtag in ("L1C_TOA_QUANTIFICATION_VALUE",
                         "L2A_BOA_QUANTIFICATION_VALUE",
                         "L2A_AOT_QUANTIFICATION_VALUE",
                         "L2A_WVP_QUANTIFICATION_VALUE"):
                els = _findall(pic, qtag)   # nested under the
                # L1C_L2A_Quantification_Values_List container
                if els and els[0].text:
                    md[qtag] = els[0].text
                    md[qtag + "_UNIT"] = els[0].get("unit", "")
        for sv in _findall(pic, "Special_Values"):
            t = _find(sv, "SPECIAL_VALUE_TEXT")
            i = _find(sv, "SPECIAL_VALUE_INDEX")
            if t is not None and i is not None:
                md["SPECIAL_VALUE_" + t.text] = i.text
        qv = _find(pic, "QUANTIFICATION_VALUE")
        if qv is not None and qv.text and level == "L1C":
            md["QUANTIFICATION_VALUE"] = qv.text
        rc = _find(pic, "Reflectance_Conversion")
        if rc is not None:
            u = _find(rc, "U")
            if u is not None and u.text:
                md["REFLECTANCE_CONVERSION_U"] = u.text
        rb = _find(pic, "REFERENCE_BAND")
        if rb is not None and rb.text is not None:
            try:
                md["REFERENCE_BAND"] = S2_BANDID_ORDER[int(rb.text)]
            except (ValueError, IndexError):
                pass
    geo = _find(root, "Geometric_Info")
    if geo is not None:
        for el in _findall(geo, "EXT_POS_LIST"):
            if el.text:
                wkt = _footprint_wkt(el.text.strip())
                if wkt:
                    md["FOOTPRINT"] = wkt
                break
    qii = _find(root, "Quality_Indicators_Info")
    if qii is not None:
        cca = _find(qii, "Cloud_Coverage_Assessment")
        if cca is not None and cca.text:
            md["CLOUD_COVERAGE_ASSESSMENT"] = cca.text
        for tag in ("DEGRADED_ANC_DATA_PERCENTAGE",
                    "DEGRADED_MSI_DATA_PERCENTAGE"):
            el = _find(qii, "Technical_Quality_Assessment." + tag)
            if el is not None and el.text:
                md[tag] = el.text
        for el in _findall(qii, "Quality_Inspections"):
            for ch in el:
                if _strip_ns(ch.tag).endswith("_FLAG") and ch.text:
                    md[_strip_ns(ch.tag)] = ch.text
    if level == "L2A":
        # scene-classification percentages and retrieval accuracies
        for el in root.iter():
            t = _strip_ns(el.tag)
            if (t.endswith("_PERCENTAGE") or t.endswith("_ACCURACY"))                     and el.text and len(el) == 0 and t not in md:
                md[t] = el.text
    # solar irradiance by bandId
    irr: Dict[str, Tuple[str, str]] = {}
    for el in _findall(root, "SOLAR_IRRADIANCE"):
        try:
            band = S2_BANDID_ORDER[int(el.get("bandId", ""))]
        except (ValueError, IndexError):
            continue
        irr[band] = (el.text or "", el.get("unit", ""))
    # bands in the product
    bands = []
    bl = _find(pi, "Query_Options.Band_List")
    if bl is not None:
        for el in bl:
            if _strip_ns(el.tag) == "BAND_NAME" and el.text in S2_BANDS:
                bands.append(el.text)
    # granules
    pf = _find(pi, "Query_Options.PRODUCT_FORMAT")
    compact = pf is not None and (pf.text or "") == "SAFE_COMPACT"
    po = _find(pi, "L2A_Product_Organisation" if level == "L2A"
               else "Product_Organisation")
    granules = []
    seen = set()
    res_bands: Dict[int, set] = {}
    if compact and po is not None:
        # SAFE_COMPACT: IMAGE_FILE paths name the granule dirs and
        # band files directly; granule MTD is always MTD_TL.xml
        by_dir: Dict[str, List[str]] = {}
        for el in _findall(po, "IMAGE_FILE"):
            if not el.text:
                continue
            parts = el.text.split("/")
            if len(parts) >= 3 and parts[0] == "GRANULE":
                by_dir.setdefault(parts[1], []).append(el.text)
        for gdir, files in by_dir.items():
            granules.append({"id": gdir, "mtd": "MTD_TL.xml",
                             "images": files, "compact": True})
            for f in files:
                mm = re.search(r"_B(\w+)$", f)
                if mm:
                    bname = "B" + mm.group(1).lstrip("0")
                    if bname in S2_BANDS:
                        res_bands.setdefault(
                            S2_BANDS[bname][0], set()).add(
                                _padded(bname))
    elif po is not None:
        for gl in _findall(po, "Granules") + _findall(po, "Granule"):
            gid = gl.get("granuleIdentifier")
            if not gid:
                continue
            imgs = [el.text for el in gl
                    if _strip_ns(el.tag) in ("IMAGE_ID", "IMAGE_ID_2A")
                    and el.text]
            if gid in seen:
                for g in granules:
                    if g["id"] == gid:
                        g["images"].extend(imgs)
            else:
                seen.add(gid)
                mtd = _granule_mtd_name(gid)
                if mtd is None:
                    continue
                granules.append({"id": gid, "mtd": mtd, "images": imgs})
            if level == "L2A":
                for im in imgs:
                    tok, res = _l2a_image_token(im)
                    if tok is not None:
                        res_bands.setdefault(res, set()).add(tok)
    return {"metadata": md, "bands": bands, "granules": granules,
            "solar_irradiance": irr, "level": level,
            "compact": compact,
            "res_bands": {r: sorted(v) for r, v in res_bands.items()},
            "dirname": os.path.dirname(xml_path)}


def _l2a_image_token(image_id: str):
    """S2A_USER_MSI_L2A_T32TQR_B01_60m -> ("01", 60);
    S2A_USER_SCL_L2A_T32TQR_60m -> ("SCL", 60)."""
    parts = image_id.split("_")
    if len(parts) < 3 or not parts[-1].endswith("m"):
        return None, None
    try:
        res = int(parts[-1][:-1])
    except ValueError:
        return None, None
    if parts[-2].startswith("B"):
        return parts[-2][1:], res
    if len(parts) >= 3 and parts[2] in ("AOT", "WVP", "SCL", "CLD",
                                        "SNW"):
        return parts[2], res
    return None, None


def parse_granule_geocoding(mtd_path: str) -> Dict:
    """Granule MTD XML -> {"epsg", resolutions: {res: {ulx, uly,
    ncols, nrows, xdim, ydim}}}."""
    root = ET.parse(mtd_path).getroot()
    tg = None
    for el in root.iter():
        if _strip_ns(el.tag) == "Tile_Geocoding":
            tg = el
            break
    if tg is None:
        raise ValueError(f"{mtd_path}: no Tile_Geocoding")
    code = _find(tg, "HORIZONTAL_CS_CODE")
    epsg = int(code.text.split(":")[-1]) if code is not None else 0
    sizes = {}
    for el in tg:
        t = _strip_ns(el.tag)
        if t == "Size":
            r = int(el.get("resolution"))
            d = sizes.setdefault(r, {})
            d["nrows"] = int(_find(el, "NROWS").text)
            d["ncols"] = int(_find(el, "NCOLS").text)
        elif t == "Geoposition":
            r = int(el.get("resolution"))
            d = sizes.setdefault(r, {})
            d["ulx"] = float(_find(el, "ULX").text)
            d["uly"] = float(_find(el, "ULY").text)
            d["xdim"] = float(_find(el, "XDIM").text)
            d["ydim"] = float(_find(el, "YDIM").text)
    return {"epsg": epsg, "resolutions": sizes}


def _token_to_name(tok: str) -> str:
    """'01' -> B1, '8A' -> B8A, 'AOT' -> AOT (the reference's
    band-list rendering rule)."""
    t = tok[1:] if tok.startswith("0") else tok
    return ("B" + t) if t[:1].isdigit() else t


def open_sentinel2(xml_path: str) -> Dict:
    """Main MTD XML -> {"metadata": {...}, "subdatasets":
    [(name, desc), ...]} with reference-identical strings (L1C and
    L2A user products)."""
    prod = parse_sentinel2_product(xml_path)
    level = prod["level"]
    # EPSG codes present: peek each granule's geocoding
    epsgs = set()
    for g in prod["granules"]:
        p = os.path.join(prod["dirname"], "GRANULE", g["id"], g["mtd"])
        if os.path.exists(p):
            epsgs.add(parse_granule_geocoding(p)["epsg"])
    if not epsgs:
        raise ValueError("no granule geocoding found")
    if level == "L1C" and not prod.get("compact"):
        res_tokens = {}
        for b in prod["bands"]:
            res_tokens.setdefault(S2_BANDS[b][0], []).append(
                _padded(b))
        res_tokens = {r: sorted(v) for r, v in res_tokens.items()}
    else:
        res_tokens = prod["res_bands"]
    subs = []
    for epsg in sorted(epsgs):
        for res in sorted(res_tokens):
            blist = ", ".join(_token_to_name(t)
                              for t in res_tokens[res])
            subs.append((
                f"SENTINEL2_{level}:{xml_path}:{res}m:EPSG_{epsg}",
                f"Bands {blist} with {res}m resolution, "
                f"{_utm_desc(epsg)}"))
        if prod.get("compact"):
            subs.append((
                f"SENTINEL2_{level}:{xml_path}:TCI:EPSG_{epsg}",
                f"True color image, {_utm_desc(epsg)}"))
        else:
            subs.append((
                f"SENTINEL2_{level}:{xml_path}:PREVIEW:EPSG_{epsg}",
                f"RGB preview, {_utm_desc(epsg)}"))
    return {"metadata": prod["metadata"], "subdatasets": subs}


def open_sentinel2_subdataset(name: str) -> Dict:
    """SENTINEL2_L1C:<xml>:<res>m|PREVIEW:EPSG_<code> -> mosaic
    description: size, geotransform, epsg, ordered band metadata and
    per-(band, granule) JP2 sources with pixel offsets."""
    m = re.match(
        r"^SENTINEL2_(L1C|L2A):(.+):(\d+m|PREVIEW|TCI):EPSG_(\d+)$",
        name)
    if not m:
        raise ValueError(f"invalid SENTINEL2 subdataset {name!r}")
    level, xml_path, resspec, epsg_s = (m.group(1), m.group(2),
                                        m.group(3), int(m.group(4)))
    prod = parse_sentinel2_product(xml_path)
    if prod["level"] != level:
        raise ValueError(f"product level mismatch for {name!r}")
    preview = resspec == "PREVIEW"
    tci = resspec == "TCI"
    if tci and not prod.get("compact"):
        raise ValueError("TCI subdataset requires a SAFE_COMPACT "
                         "product")
    res = 320 if preview else (10 if tci else int(resspec[:-1]))
    gran = []
    for g in prod["granules"]:
        p = os.path.join(prod["dirname"], "GRANULE", g["id"], g["mtd"])
        if not os.path.exists(p):
            raise ValueError(f"missing granule MTD {p}")
        geo = parse_granule_geocoding(p)
        if geo["epsg"] != epsg_s:
            continue
        gran.append((g, geo))
    if not gran:
        raise ValueError(f"no granule with EPSG {epsg_s}")
    # band order (reference rule): zero-padded sort, then front the
    # 02/03/04 triple as 04/03/02 (RGB); PREVIEW is fixed RGB
    if preview or tci:
        order = ["B4", "B3", "B2"]
        gres = 10 if (level == "L1C" or tci) else 60
    else:
        if level == "L1C" and not prod.get("compact"):
            in_res = [b for b in prod["bands"]
                      if S2_BANDS[b][0] == res]
            if not in_res:
                raise ValueError(f"no bands at {res}m")
            padded = sorted(_padded(b) for b in in_res)
        else:
            padded = list(prod["res_bands"].get(res) or [])
            if not padded:
                raise ValueError(f"no bands at {res}m")
        if padded[:3] == ["02", "03", "04"]:
            padded[0], padded[2] = "04", "02"
        order = [_token_to_name(p) for p in padded]
        gres = res
    # mosaic extent
    ulxs, ulys, lrxs, lrys = [], [], [], []
    for _g, geo in gran:
        d = geo["resolutions"].get(gres)
        if d is None:
            raise ValueError(f"granule lacks {gres}m geocoding")
        ulxs.append(d["ulx"])
        ulys.append(d["uly"])
        lrxs.append(d["ulx"] + d["ncols"] * abs(d["xdim"]))
        lrys.append(d["uly"] - d["nrows"] * abs(d["ydim"]))
    step = 320.0 if preview else float(gres)
    if tci:
        step = 10.0
    x0, y1 = min(ulxs), max(ulys)
    xsize = int(round((max(lrxs) - x0) / step))
    ysize = int(round((y1 - min(lrys)) / step))
    bands = []
    for i, b in enumerate(order):
        if b in S2_BANDS:
            resm, wl, bw, ci = S2_BANDS[b]
            irr = prod["solar_irradiance"].get(b, ("", ""))
            bands.append({
                "band": i + 1, "name": b, "wavelength": wl,
                "bandwidth": bw,
                "color": "red" if ((preview or tci) and b == "B4")
                else ci,
                "solar_irradiance": irr[0],
                "solar_irradiance_unit": irr[1],
                "nbits": 8 if (preview or tci) else 12,
                "dtype": "uint8" if (preview or tci) else "uint16",
            })
        else:   # L2A special band (AOT/WVP/SCL/CLD/SNW)
            bands.append({"band": i + 1, "name": b, "wavelength": None,
                          "bandwidth": None, "color": "undefined",
                          "solar_irradiance": "",
                          "solar_irradiance_unit": "",
                          "nbits": 16, "dtype": "uint16"})
    sources = []
    for g, geo in gran:
        d = geo["resolutions"][gres]
        xoff = int(round((d["ulx"] - x0) / step))
        yoff = int(round((y1 - d["uly"]) / step))
        gdir = os.path.join(prod["dirname"], "GRANULE", g["id"])
        if preview or tci:
            if g.get("compact"):
                rel = next((im for im in g["images"]
                            if im.endswith("_TCI")), None)
                if rel is None:
                    continue
                path = os.path.join(prod["dirname"], rel + ".jp2")
            else:
                pvi = g["id"][:9] + "PVI" + g["id"][12:-7]
                path = os.path.join(gdir, "QI_DATA", pvi + ".jp2")
            w = int(round(d["ncols"] * gres / step))
            h = int(round(d["nrows"] * gres / step))
            for i in range(3):
                sources.append({"band": i + 1, "path": path,
                                "source_band": i + 1, "xoff": xoff,
                                "yoff": yoff, "xsize": w, "ysize": h})
        else:
            for i, b in enumerate(order):
                if g.get("compact"):
                    suffix = "_B" + _padded(b) if b != "B8A" else "_B8A"
                    rel = next((im for im in g["images"]
                                if im.endswith(suffix)), None)
                    if rel is None:
                        continue
                    path = os.path.join(prod["dirname"], rel + ".jp2")
                elif level == "L1C":
                    suffix = "_B" + _padded(b).lstrip("0").rjust(2, "0") \
                        if b != "B8A" else "_B8A"
                    img = next((im for im in g["images"]
                                if im.endswith(suffix)), None)
                    if img is None:
                        continue
                    path = os.path.join(gdir, "IMG_DATA", img + ".jp2")
                else:
                    tok = _padded(b) if b.startswith("B") else b
                    img = None
                    for im in g["images"]:
                        t2, r2 = _l2a_image_token(im)
                        if t2 == tok and r2 == res:
                            img = im
                            break
                    if img is None:
                        continue
                    # AOT/WVP and MSI bands live under IMG_DATA/Rxxm,
                    # CLD/SNW under QI_DATA, SCL under IMG_DATA (the
                    # layouts vary by baseline — probe in that order)
                    cands = [os.path.join(gdir, "IMG_DATA",
                                          f"R{res}m", img + ".jp2"),
                             os.path.join(gdir, "QI_DATA",
                                          img + ".jp2"),
                             os.path.join(gdir, "IMG_DATA",
                                          img + ".jp2")]
                    path = next((c for c in cands if os.path.exists(c)),
                                cands[0])
                sources.append({"band": i + 1, "path": path,
                                "source_band": 1, "xoff": xoff,
                                "yoff": yoff, "xsize": d["ncols"],
                                "ysize": d["nrows"]})
    return {"xsize": xsize, "ysize": ysize, "epsg": epsg_s,
            "geotransform": (x0, step, 0.0, y1, 0.0, -step),
            "bands": bands, "sources": sources,
            "metadata": prod["metadata"]}


def read_sentinel2_pixels(subdataset: str, band: int = 1):
    """Subdataset -> Ray Dataset of mosaic pixel rows (y, x, value):
    one JP2 decode task per granule source of the band, offsets
    applied in the task (the archive-scale read path; needs real
    granule JP2 payloads)."""
    import pyarrow as pa
    import ray.data

    sd = open_sentinel2_subdataset(subdataset)
    srcs = [s for s in sd["sources"] if s["band"] == band]

    def decode(batch: pa.Table) -> pa.Table:
        from ..codecs.jp2k import decode_jp2

        ys, xs, vs = [], [], []
        for j in batch["i"].to_pylist():
            s = srcs[j]
            arr, meta = decode_jp2(open(s["path"], "rb").read())
            if arr.ndim == 3:
                arr = arr[:, :, s["source_band"] - 1]
            yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
            ys.append((yy.ravel() + s["yoff"]).astype(np.int32))
            xs.append((xx.ravel() + s["xoff"]).astype(np.int32))
            vs.append(arr.ravel().astype(np.float64))
        cat = np.concatenate
        return pa.table({
            "y": pa.array(cat(ys) if ys else np.empty(0, np.int32)),
            "x": pa.array(cat(xs) if xs else np.empty(0, np.int32)),
            "value": pa.array(cat(vs) if vs else
                              np.empty(0, np.float64))})

    return ray.data.from_items(
        [{"i": i} for i in range(len(srcs))],
        override_num_blocks=max(1, len(srcs))).map_batches(
            decode, batch_format="pyarrow", batch_size=1)
