"""RPF TOC / CADRG-CIB frame driver (RPFTOC).

Parity target: the reference RPFTOC driver
(`frmts/nitf/rpftocfile.cpp`, `rpftocdataset.cpp`, and the RPF pieces
of `nitfimage.c`) on the `autotest/gdrivers/data/nitf/A.TOC` +
`RPFTOC01.ON2` fixtures (`rpftoc.py:test_rpftoc_1..3`): subdataset
"NITF_TOC_ENTRY:CADRG_ONC_1,000,000_2_0:<toc>", checksum 53599 for the
fully-masked frame (every pixel = the appended transparent palette
index), the geotransform whose pixel sizes come from the FRAME
coverage section (edge-of-pixel corners / 1536) with the origin reset
to the TOC boundary rectangle's NW corner, and FILENAME_0 metadata.

An RPF product is a table-of-contents (A.TOC — bare RPF or wrapped in
a NITF RPFHDR TRE) over many 1536x1536 NITF frame files compressed
with 12-bit vector quantization (IC=C4/M4): each 3 bytes hold two
codebook indices, each expanding to a 4x4 pixel patch from one of 4
row-phase LUTs (`nitfimage.c:NITFUncompressVQTile`). Frames carry
their own location table in the RPFIMG TRE: coverage (LID 130), VQ
codebooks (132), 216-colour colormap (135), subframe transparency
mask (138), spatial data (140).

Ray shape: the TOC parse is driver-side (a TOC is a few KB); frame
decode fans out one task per frame FILE (`read_rpftoc_pixels`) — a
real CADRG datatake is thousands of ~1.4 MB frames, the natural
distribution unit at 100 TB scale.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# MIL-STD-2411-1 5.1.4 data series codes (public standard), the
# subset covering CADRG/CIB products: code -> (abbreviation, name).
RPF_SERIES = {
    "GN": ("GNC", "Global Navigation Chart"),
    "JN": ("JNC", "Jet Navigation Chart"),
    "ON": ("ONC", "Operational Navigation Chart"),
    "TP": ("TPC", "Tactical Pilotage Chart"),
    "LF": ("LFC-FR (Day)", "Low Flying Chart (Day) - Host Nation"),
    "JG": ("JOG", "Joint Operations Graphic"),
    "JA": ("JOG-A", "Joint Operations Graphic - Air"),
    "JR": ("JOG-R", "Joint Operations Graphic - Radar"),
    "TC": ("TLM 100", "Topographic Line Map 1:100,000 scale"),
    "TL": ("TLM 50", "Topographic Line Map"),
    "TT": ("TLM 25", "Topographic Line Map 1:25,000 scale"),
    "TQ": ("TLM 24", "Topographic Line Map 1:24,000 scale"),
    "TR": ("TLM 200", "Topographic Line Map 1:200,000 scale"),
    "I1": ("CIB10", "Controlled Image Base 10 metres"),
    "I2": ("CIB5", "Controlled Image Base 5 metres"),
    "I3": ("CIB2", "Controlled Image Base 2 metres"),
    "I4": ("CIB1", "Controlled Image Base 1 meter"),
    "I5": ("CIB .5", "Controlled Image Base .5 meter"),
    "CA": ("CM", "Combat Charts, 1:50,000 scale"),
    "CB": ("CM", "Combat Charts, 1:100,000 scale"),
    "CC": ("CM", "Combat Charts, 1:250,000 scale"),
    "CD": ("CM", "Combat Charts, 1:500,000 scale"),
    "MM": ("(Miscellaneous Maps & Charts)",
           "Miscellaneous Maps & Charts"),
    "UL": ("TLM50-Other", "Topographic Line Map (other 1:50,000)"),
}

_FRAME = 1536  # MIL-C-89038 / MIL-C-89041 3.5.2a frame size
_VQ_SIG = bytes([0x00, 0x00, 0x00, 0x06, 0x00, 0x0E])


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from(">H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def read_location_table(buf: bytes, base: int) -> Dict[int, Tuple[int, int]]:
    """RPF location section at `base` -> {loc_id: (size, offset)}.
    Offsets in the records are absolute positions in the carrying
    file (both for a bare TOC and for a frame's RPFIMG TRE)."""
    tab_off = _u32(buf, base + 2)
    count = _u16(buf, base + 6)
    reclen = _u16(buf, base + 8)
    if reclen != 10:
        raise ValueError(f"RPF location record length {reclen} != 10")
    out: Dict[int, Tuple[int, int]] = {}
    rec = base + tab_off
    for _ in range(count):
        lid = _u16(buf, rec)
        out[lid] = (_u32(buf, rec + 2), _u32(buf, rec + 6))
        rec += reclen
    return out


def _toc_location_base(buf: bytes) -> int:
    """Find the TOC's location section: bare RPF header (48 bytes:
    endian 1, header len 2, filename 12, new 1, standard num 15,
    standard date 8, classification 1, country 2, release 2, then the
    u32 physical location) or a NITF file carrying an RPFHDR TRE with
    the same 48-byte layout."""
    if buf[:4] == b"NITF":
        i = buf.find(b"RPFHDR")
        if i < 0:
            raise ValueError("NITF TOC without RPFHDR TRE")
        hdr = i + 6 + 5  # TRE tag + 5-digit length
    else:
        hdr = 0
    return _u32(buf, hdr + 1 + 2 + 12 + 1 + 15 + 8 + 1 + 2 + 2)


_BREC = struct.Struct(">12dII")


def parse_rpftoc(path: str) -> Dict:
    """A.TOC -> {"entries": [...], "subdatasets": [(name, desc)]}.
    Entry: type/scale/zone/producer, NW/SE corners, intervals, frame
    grid and per-cell frame file records (row 0 = northernmost)."""
    buf = open(path, "rb").read()
    locs = read_location_table(buf, _toc_location_base(buf))
    for lid in (148, 149, 150, 151):
        if lid not in locs:
            raise ValueError(f"TOC missing location id {lid}")
    # boundary rectangle section subheader: table offset, count, reclen
    bsh = locs[148][1]
    nb = _u16(buf, bsh + 4)
    brl = _u16(buf, bsh + 6)
    entries: List[Dict] = []
    for i in range(nb):
        r = locs[149][1] + i * brl
        vals = _BREC.unpack_from(buf, r + 28)
        scale = buf[r + 10:r + 22].decode("ascii").strip()
        if scale.startswith("1:"):
            scale = scale[2:]
        e = {
            "type": buf[r:r + 5].decode("ascii").strip(),
            "compression": buf[r + 5:r + 10].decode("ascii").strip(),
            "scale": scale,
            "zone": buf[r + 22:r + 23].decode("ascii").strip(),
            "producer": buf[r + 23:r + 28].decode("ascii").strip(),
            "nw_lat": vals[0], "nw_long": vals[1],
            "sw_lat": vals[2], "sw_long": vals[3],
            "ne_lat": vals[4], "ne_long": vals[5],
            "se_lat": vals[6], "se_long": vals[7],
            "vert_res": vals[8], "horiz_res": vals[9],
            "vert_interval": vals[10], "horiz_interval": vals[11],
            "n_vert_frames": vals[12], "n_horiz_frames": vals[13],
            "boundary_id": i,
            "series_abbreviation": None, "series_name": None,
            "is_overview_or_legend": False,
        }
        e["frames"] = [None] * (e["n_vert_frames"] * e["n_horiz_frames"])
        entries.append(e)
    # frame file index: subheader (skip 1 security byte), records
    fsh = locs[150][1]
    n_recs = _u32(buf, fsh + 5)
    freclen = _u16(buf, fsh + 13)
    fsub = locs[151][1]
    toc_dir = os.path.dirname(path)
    new_ids = False
    for i in range(n_recs):
        r = fsub + i * freclen
        bid = _u16(buf, r)
        row = _u16(buf, r + 2)
        col = _u16(buf, r + 4)
        if i == 0 and bid == 0:
            new_ids = True  # 0-based variant, rows counted south-up
        if not new_ids:
            bid -= 1
            row -= 1
            col -= 1
        e = entries[bid]
        if new_ids:
            row = (e["n_vert_frames"] - 1) - row
        path_off = _u32(buf, r + 6)
        fname = buf[r + 10:r + 22].decode("ascii").strip().strip("\x00")
        georef = buf[r + 22:r + 28].decode("ascii", "replace")
        plen = _u16(buf, fsub + path_off)
        pdir = buf[fsub + path_off + 2:
                   fsub + path_off + 2 + plen].decode("ascii")
        pdir = pdir.rstrip("/")
        if pdir.startswith("./"):
            pdir = pdir[2:]
        ext = fname.rsplit(".", 1)[-1].lower() if "." in fname else ""
        if ext[:3] in ("ovr", "lgd"):
            e["is_overview_or_legend"] = True
        if e["series_abbreviation"] is None and len(ext) >= 2:
            ser = RPF_SERIES.get(ext[:2].upper())
            if ser:
                e["series_abbreviation"], e["series_name"] = ser
        rel = os.path.join(pdir, fname) if pdir else fname
        full = os.path.join(toc_dir, rel) if toc_dir else rel
        e["frames"][row * e["n_horiz_frames"] + col] = {
            "row": row, "col": col, "filename": fname, "directory": pdir,
            "path": full, "georef": georef,
            "exists": os.path.exists(full),
        }
    subs = []
    for e in entries:
        if e["is_overview_or_legend"]:
            continue
        subs.append((f"NITF_TOC_ENTRY:{entry_name(e)}:{path}",
                     _entry_desc(e)))
    return {"entries": entries, "subdatasets": subs, "path": path}


def entry_name(e: Dict) -> str:
    """rpftocdataset.cpp MakeTOCEntryName: type_abbrev_scale_zone_id
    with ':' and ' ' replaced by '_'."""
    if e["series_abbreviation"]:
        s = (f"{e['type']}_{e['series_abbreviation']}_{e['scale']}_"
             f"{e['zone']}_{e['boundary_id']}")
    else:
        s = f"{e['type']}_{e['scale']}_{e['zone']}_{e['boundary_id']}"
    return s.replace(":", "_").replace(" ", "_")


def _entry_desc(e: Dict) -> str:
    if e["series_name"] and e["series_abbreviation"]:
        return (f"{e['type']}:{e['series_abbreviation']}:"
                f"{e['series_name']}:{e['scale']}:{e['zone']}:"
                f"{e['boundary_id']}")
    return f"{e['type']}:{e['scale']}:{e['zone']}:{e['boundary_id']}"


# ---------------------------------------------------------------- frames

def _nitf_image_segment(buf: bytes) -> Tuple[int, int, Dict]:
    """Minimal NITF 2.0 walk to the first image segment: returns
    (subheader_start, data_start, info) where info carries block
    geometry, IC, and the subheader LUTs."""
    if not buf.startswith(b"NITF02"):
        raise ValueError("not a NITF 2.0 frame file")
    o = 9 + 2 + 4 + 10 + 14 + 80 + 1 + 40 + 40 + 40 + 20 + 20
    if buf[o:o + 6] == b"999998":
        o += 46
    else:
        o += 6
    o += 5 + 5 + 1 + 27 + 18 + 12  # FSCOP..FL
    hl = int(buf[o:o + 6])
    o += 6
    numi = int(buf[o:o + 3])
    o += 3
    if numi < 1:
        raise ValueError("frame file without image segment")
    lish = int(buf[o:o + 6])
    sh = buf[hl:hl + lish]
    o2 = 2 + 10 + 14 + 17 + 80 + 1 + 40 + 40 + 40 + 20 + 20
    if sh[o2:o2 + 6] == b"999998":
        o2 += 46
    else:
        o2 += 6
    o2 += 1 + 42
    nrows = int(sh[o2:o2 + 8])
    ncols = int(sh[o2 + 8:o2 + 16])
    o2 += 16 + 3 + 8 + 8 + 2 + 1
    icords = sh[o2:o2 + 1]
    o2 += 1
    if icords != b"N":
        o2 += 60
    nicom = int(sh[o2:o2 + 1])
    o2 += 1 + nicom * 80
    ic = sh[o2:o2 + 2].decode("ascii")
    o2 += 2
    if ic not in ("NC", "NM"):
        o2 += 4  # COMRAT
    nbands = int(sh[o2:o2 + 1])
    o2 += 1
    luts = None
    for _ in range(nbands):
        o2 += 2 + 6 + 1 + 3
        nluts = int(sh[o2:o2 + 1])
        o2 += 1
        if nluts:
            nelut = int(sh[o2:o2 + 5])
            o2 += 5
            tabs = []
            for t in range(nluts):
                tabs.append(np.frombuffer(
                    sh[o2:o2 + nelut], dtype=np.uint8).copy())
                o2 += nelut
            if luts is None:
                luts = tabs
    o2 += 1  # ISYNC
    imode = sh[o2:o2 + 1].decode("ascii")
    o2 += 1
    nbpr = int(sh[o2:o2 + 4])
    nbpc = int(sh[o2 + 4:o2 + 8])
    info = {"nrows": nrows, "ncols": ncols, "ic": ic, "imode": imode,
            "nbpr": nbpr, "nbpc": nbpc, "nbands": nbands, "luts": luts}
    return hl, hl + lish, info


def _frame_locations(buf: bytes, sh_start: int,
                     data_start: int) -> Dict[int, Tuple[int, int]]:
    """Location table from the RPFIMG TRE in the image subheader."""
    i = buf.find(b"RPFIMG", sh_start, data_start)
    if i < 0:
        raise ValueError("frame without RPFIMG TRE")
    return read_location_table(buf, i + 6 + 5)


def open_rpf_frame(path: str) -> Tuple[np.ndarray, Dict]:
    """One CADRG/CIB frame -> (palette-index array, meta). Masked /
    missing subframes read as the transparent index appended after
    the 216 significant palette entries (nitfimage.c:1081, bug 1751);
    meta carries transform (edge-of-pixel coverage corners),
    color_table (Nx4 RGBA uint8) and nodata."""
    buf = open(path, "rb").read()
    sh_start, data_start, info = _nitf_image_segment(buf)
    locs = _frame_locations(buf, sh_start, data_start)
    meta: Dict = {"driver": "RPFTOC", "ic": info["ic"]}
    nrows, ncols = info["nrows"], info["ncols"]
    # coverage section: 8 MSB doubles nwLat nwLong swLat swLong
    # neLat neLong seLat seLong, edge-of-pixel
    if 130 in locs:
        c = struct.unpack_from(">8d", buf, locs[130][1])
        meta["transform"] = (c[1], (c[5] - c[1]) / ncols, 0.0,
                             c[0], 0.0, (c[6] - c[0]) / nrows)
    lut, nodata = _frame_palette(buf, locs, info)
    meta["color_table"] = lut
    if nodata is not None:
        meta["nodata"] = float(nodata)
    arr = _decode_vq_blocks(buf, data_start, locs, info,
                            0 if nodata is None else int(nodata))
    return arr, meta


def _frame_palette(buf: bytes, locs, info):
    """Subheader LUTs, overridden by the CADRG colormap subsection
    (tableId 2, 216 RGBM records), plus the appended transparent
    entry rule."""
    n_sig = 0
    if info["luts"] and len(info["luts"]) >= 3:
        n_sig = len(info["luts"][0])
        r = np.zeros(256, np.uint8)
        g = np.zeros(256, np.uint8)
        b = np.zeros(256, np.uint8)
        r[:n_sig] = info["luts"][0]
        g[:n_sig] = info["luts"][1]
        b[:n_sig] = info["luts"][2]
    else:
        r = g = b = None
    if 134 in locs and 135 in locs and r is not None:
        n_rec = buf[locs[134][1]]
        cm = locs[135][1]
        rec = cm + 6
        for i in range(n_rec):
            tid = _u16(buf, rec)
            n = _u32(buf, rec + 2)
            elen = buf[rec + 6]
            ctoff = _u32(buf, rec + 9)
            rec += 17
            if i == 0 and tid == 2 and elen == 4 and n == 216:
                rgbm = np.frombuffer(buf, np.uint8, 216 * 4,
                                     cm + ctoff).reshape(216, 4)
                r[:216], g[:216], b[:216] = (rgbm[:, 0], rgbm[:, 1],
                                             rgbm[:, 2])
            break
    nodata = None
    if r is not None and 0 < n_sig < 255:
        if n_sig == 217 and r[216] == 0 and g[216] == 0 and b[216] == 0:
            nodata = 216
        else:
            r[n_sig] = g[n_sig] = b[n_sig] = 0
            nodata = n_sig
    if r is None:
        return None, None
    n_ct = (nodata + 1) if nodata is not None else n_sig
    a = np.full(n_ct, 255, np.uint8)
    if nodata is not None:
        a[nodata] = 0
    ct = np.stack([r[:n_ct], g[:n_ct], b[:n_ct], a], axis=1)
    return ct, nodata


def _block_starts(buf: bytes, data_start: int, locs, info) -> np.ndarray:
    """Per-subframe absolute offsets; UINT_MAX = transparent. C4:
    spatial-data base + 6144*i; M4: block map at the segment start;
    both overridden by the LID 138 mask subsection when present."""
    n = info["nbpr"] * info["nbpc"]
    u32max = np.uint64(0xFFFFFFFF)
    if info["ic"] == "C4":
        base = locs.get(140, (0, data_start))[1]
        starts = base + np.uint64(6144) * np.arange(n, dtype=np.uint64)
    else:  # M4
        im, bmr, _tmr, tpx = struct.unpack_from(">IHHH", buf, data_start)
        o = data_start + 10 + (tpx + 7) // 8
        if bmr == 4:
            offs = np.frombuffer(buf, ">u4", n, o).astype(np.uint64)
            starts = np.where(offs == u32max, u32max,
                              offs + data_start + im)
        else:
            starts = (data_start + im
                      + np.uint64(6144) * np.arange(n, dtype=np.uint64))
    if 138 in locs:
        mo = locs[138][1]
        sfr, _tsr, tpx = struct.unpack_from(">HHH", buf, mo)
        mo += 6 + (tpx + 7) // 8
        if sfr == 4:
            base = locs.get(140, (0, data_start))[1]
            offs = np.frombuffer(buf, ">u4", n, mo).astype(np.uint64)
            starts = np.where(offs == u32max, u32max, offs + base)
    return starts


def _vq_luts(buf: bytes, locs) -> Optional[np.ndarray]:
    """LID 132 codebooks -> (4, 4096, 4) uint8 (4 row phases)."""
    if 132 not in locs:
        return None
    off = locs[132][1]
    if buf[off:off + 6] != _VQ_SIG:
        i = buf.find(_VQ_SIG, off, off + 1000)
        if i < 0:
            return None
        off = i
    luts = np.empty((4, 4096, 4), np.uint8)
    for t in range(4):
        vec = _u32(buf, off + 6 + t * 14 + 10)
        luts[t] = np.frombuffer(buf, np.uint8, 4096 * 4,
                                off + vec).reshape(4096, 4)
    return luts


def decode_vq_subframe(data: bytes, luts: np.ndarray) -> np.ndarray:
    """6144 VQ bytes -> 256x256 uint8, vectorized: split the byte
    triplets into two 12-bit codes, gather 4-byte runs from each of
    the 4 row-phase codebooks."""
    raw = np.frombuffer(data, np.uint8).reshape(64, 32, 3).astype(np.uint16)
    val1 = (raw[:, :, 0] << 4) | (raw[:, :, 1] >> 4)   # (64, 32)
    val2 = ((raw[:, :, 1] & 0xF) << 8) | raw[:, :, 2]
    codes = np.empty((64, 64), np.uint16)
    codes[:, 0::2] = val1
    codes[:, 1::2] = val2
    out = np.empty((256, 256), np.uint8)
    for t in range(4):
        # rows t, t+4, ... : LUT[t][code] gives the 4 horizontal px
        out[t::4] = luts[t][codes].reshape(64, 256)
    return out


def _decode_vq_blocks(buf: bytes, data_start: int, locs, info,
                      fill: int) -> np.ndarray:
    h = info["nbpc"] * 256
    w = info["nbpr"] * 256
    out = np.full((h, w), fill, np.uint8)
    luts = _vq_luts(buf, locs)
    if luts is None:
        return out[:info["nrows"], :info["ncols"]]
    starts = _block_starts(buf, data_start, locs, info)
    u32max = np.uint64(0xFFFFFFFF)
    for by in range(info["nbpc"]):
        for bx in range(info["nbpr"]):
            s = starts[by * info["nbpr"] + bx]
            if s == u32max or int(s) + 6144 > len(buf):
                continue
            tile = decode_vq_subframe(buf[int(s):int(s) + 6144], luts)
            out[by * 256:(by + 1) * 256, bx * 256:(bx + 1) * 256] = tile
    return out[:info["nrows"], :info["ncols"]]


# ---------------------------------------------------------- TOC entries

def find_toc_entry(toc: Dict, name: str) -> Dict:
    for e in toc["entries"]:
        if entry_name(e) == name:
            return e
    raise ValueError(f"no TOC entry named {name!r}")


def open_rpftoc_entry(name_or_path: str,
                      entry: Optional[str] = None) -> Tuple[np.ndarray, Dict]:
    """"NITF_TOC_ENTRY:<entry>:<toc>" (or toc path + entry name) ->
    (mosaic array, meta). Mosaic = frame grid x 1536^2, fill = the
    frames' transparent index; gt pixel sizes from the first existing
    frame with the origin reset to the boundary NW corner
    (rpftocdataset.cpp:CreateDataSetFromTocEntry)."""
    if entry is None:
        if not name_or_path.startswith("NITF_TOC_ENTRY:"):
            raise ValueError(f"invalid RPFTOC name {name_or_path!r}")
        rest = name_or_path[len("NITF_TOC_ENTRY:"):]
        entry, toc_path = rest.split(":", 1)
    else:
        toc_path = name_or_path
    toc = parse_rpftoc(toc_path)
    e = find_toc_entry(toc, entry)
    h = e["n_vert_frames"] * _FRAME
    w = e["n_horiz_frames"] * _FRAME
    meta: Dict = {"driver": "RPFTOC", "epsg": 4326}
    first = None
    out = None
    filenames = {}
    for fr in e["frames"]:
        if fr is None or not fr["exists"]:
            continue
        arr, fmeta = open_rpf_frame(fr["path"])
        if first is None:
            first = fmeta
            fill = int(fmeta.get("nodata", 0))
            out = np.full((h, w), fill, np.uint8)
            gt = fmeta.get("transform")
            if gt is not None:
                meta["transform"] = (e["nw_long"], gt[1], 0.0,
                                     e["nw_lat"], 0.0, gt[5])
            if "color_table" in fmeta:
                meta["color_table"] = fmeta["color_table"]
            if "nodata" in fmeta:
                meta["nodata"] = fmeta["nodata"]
        y0 = fr["row"] * _FRAME
        x0 = fr["col"] * _FRAME
        out[y0:y0 + arr.shape[0], x0:x0 + arr.shape[1]] = arr
        filenames[f"FILENAME_{len(filenames)}"] = fr["path"]
    if out is None:
        raise ValueError(f"TOC entry {entry!r} has no existing frame")
    meta.update(filenames)
    return out, meta


def rpftoc_info(path: str) -> Dict:
    """TOC-level metadata (registry/gdalinfo contract)."""
    toc = parse_rpftoc(path)
    md = {}
    for i, (name, desc) in enumerate(toc["subdatasets"]):
        md[f"SUBDATASET_{i + 1}_NAME"] = name
        md[f"SUBDATASET_{i + 1}_DESC"] = desc
    return {"driver": "RPFTOC", "subdatasets": toc["subdatasets"],
            "metadata": md, "n_entries": len(toc["entries"])}


def read_rpftoc_pixels(name: str):
    """TOC entry -> Ray Dataset of pixel rows (y, x, value): one
    decode task per frame file, global mosaic coordinates. Missing /
    masked frames yield no rows (they are the transparent fill)."""
    import pyarrow as pa
    import ray.data

    rest = name[len("NITF_TOC_ENTRY:"):] if \
        name.startswith("NITF_TOC_ENTRY:") else name
    ename, toc_path = rest.split(":", 1)
    toc = parse_rpftoc(toc_path)
    e = find_toc_entry(toc, ename)
    frames = [fr for fr in e["frames"] if fr is not None and fr["exists"]]

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs = [], [], []
        for i in batch["i"].to_pylist():
            fr = frames[i]
            arr, _m = open_rpf_frame(fr["path"])
            yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
            ys.append((yy.ravel() + fr["row"] * _FRAME).astype(np.int32))
            xs.append((xx.ravel() + fr["col"] * _FRAME).astype(np.int32))
            vs.append(arr.ravel().astype(np.float64))
        cat = np.concatenate
        return pa.table({
            "y": pa.array(cat(ys) if ys else np.empty(0, np.int32)),
            "x": pa.array(cat(xs) if xs else np.empty(0, np.int32)),
            "value": pa.array(cat(vs) if vs else
                              np.empty(0, np.float64))})

    return ray.data.from_items(
        [{"i": i} for i in range(len(frames))],
        override_num_blocks=max(1, len(frames))).map_batches(
            decode, batch_format="pyarrow", batch_size=1)
