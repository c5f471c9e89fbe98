"""DXF driver tests — pinned against the reference's own fixtures
(`autotest/ogr/data/dxf/*`) and the WKT expectations hardcoded in
`autotest/ogr/ogr_dxf.py`."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import dxf

REF = "/root/reference/autotest/ogr/data/dxf"


def _wkt_coords(wkt: str) -> np.ndarray:
    """All numbers of a WKT string as an (n, dim) array."""
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", wkt)
    vals = np.array([float(v) for v in nums])
    body = wkt[wkt.index("("):]
    dim = len(body.strip("() ").split(",")[0].split())
    return vals.reshape(-1, dim)


def _layer(path):
    return dxf.read_dxf(path).to_pandas().sort_values("fid") \
        .reset_index(drop=True)


def test_circle():
    """ogr_dxf.py:test_ogr_dxf_21 — CIRCLE strokes to a closed 91-pt
    25D linestring at 4-degree steps, starting at angle 0, clockwise
    after GDAL's sign flip."""
    df = _layer(f"{REF}/circle.dxf")
    k, pts = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "linestring"
    pts = np.asarray(pts)
    assert pts.shape == (91, 3)
    assert np.allclose(pts[0], [5, 2, 3])
    assert np.allclose(
        pts[1], [4.990256201039297, 1.720974105023499, 3], atol=1e-12)
    assert np.allclose(
        pts[2], [4.961072274966281, 1.443307596159738, 3], atol=1e-12)
    assert np.allclose(pts[-1], [5.0, 2.0, 3])
    assert np.allclose(pts[45], [-3.0, 2.0, 3])  # angle 180


def test_solid():
    """ogr_dxf.py:test_ogr_dxf_26 — SOLID vertex order 1,2,4,3."""
    df = _layer(f"{REF}/solid.dxf")
    k, rings = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "polygon"
    exp = np.array([[2.716846, 2.762514], [2.393674, 1.647962],
                    [4.391042, 1.06881], [4.714214, 2.183362],
                    [2.716846, 2.762514]])
    assert np.allclose(np.asarray(rings[0])[:, :2], exp, atol=1e-9)


def test_3dface():
    """ogr_dxf.py:test_ogr_dxf_25."""
    df = _layer(f"{REF}/3dface.dxf")
    k, rings = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "polygon"
    assert np.allclose(rings[0], [[10, 20, 30], [11, 21, 31],
                                  [12, 22, 32], [10, 20, 30]])
    k, rings = wkbm.parse_wkb_z(df["geometry"].iloc[1])
    assert np.allclose(rings[0], [[10, 20, 30], [11, 21, 31],
                                  [12, 22, 32], [13, 23, 33],
                                  [10, 20, 30]])


def test_mtext_unescape_and_point():
    """ogr_dxf.py:test_ogr_dxf_22 — MTEXT escape translation."""
    df = _layer(f"{REF}/text.dxf")
    assert df["Text"].iloc[0] == "test\ttext ab/c~d±ef^g.h#i jklm"
    k, pts = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "point" and np.allclose(pts[0], [1, 2, 3])


def test_text_unescape_unit():
    raw = (r"\A1;test^Itext\~\pt0.2;{\H0.7x;\Sab\/c\~d%%p^ ef\^ g.h\#i;}"
           + r" j{\L\Ok\ol}m")
    assert dxf.text_unescape(raw, True) == \
        "test\ttext ab/c~d±ef^g.h#i jklm"
    assert dxf.text_unescape(r"a%%db%%uc", False) == "a°bc"


def test_entities_only():
    """ogr_dxf.py:test_ogr_dxf_11 — file with only an ENTITIES
    section (no header)."""
    df = _layer(f"{REF}/entities_only.dxf")
    k, p = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "point" and np.allclose(p[0], [672500.0, 242000.0,
                                               539.986])
    k, p = wkbm.parse_wkb_z(df["geometry"].iloc[1])
    assert np.allclose(p[0], [672750.0, 242000.0, 558.974])


def test_closed_polyline_with_bulge():
    """ogr_dxf.py:test_ogr_dxf_read_closed_polyline_with_bulge —
    exact bulge tessellation (EmitArc center/angle construction,
    duplicated arc extremities, closed ring)."""
    exp = _wkt_coords(
        "LINESTRING (40585366.7065058 3433935.53809098,40585329.9256486 "
        "3433998.44081707,40585329.9256486 3433998.44081707,40585328.5387678 "
        "3434000.63680805,40585327.0051198 3434002.73293274,40585325.3318693 "
        "3434004.71939884,40585323.526833 3434006.58692634,40585321.5984435 "
        "3434008.32679087,40585319.5557093 3434009.93086443,40585317.4081735 "
        "3434011.39165342,40585315.1658683 3434012.70233358,40585312.8392691 "
        "3434013.85678191,40585310.4392448 3434014.84960528,40585307.9770074 "
        "3434015.67616559,40585305.4640596 3434016.33260146,40585302.9121409 "
        "3434016.81584629,40585300.3331728 3434017.12364253,40585297.7392033 "
        "3434017.25455227,40585271.1313178 3434017.68678191,40585252.1698149 "
        "3433885.99037548,40585256.74147 3433885.9161116,40585256.74147 "
        "3433885.9161116,40585266.2920614 3433886.0916242,40585275.8076317 "
        "3433886.92740148,40585285.2425893 3433888.41943902,40585294.551729 "
        "3433890.56058809,40585303.6904483 3433893.34058991,40585312.6149614 "
        "3433896.74612477,40585321.2825086 3433900.76087591,40585329.6515615 "
        "3433905.36560764,40585364.2483736 3433925.99220872,40585364.2483736 "
        "3433925.99220872,40585364.6481964 3433926.24937651,40585365.0296424 "
        "3433926.53308859,40585365.3909523 3433926.84203644,40585365.7304596 "
        "3433927.17479516,40585366.0465985 3433927.52983003,40585366.337911 "
        "3433927.90550359,40585366.6030535 3433928.30008319,40585366.840803 "
        "3433928.71174899,40585367.0500632 3433929.13860232,40585367.2298688 "
        "3433929.5786745,40585367.3793906 3433930.02993587,40585367.4979389 "
        "3433930.49030515,40585367.5849671 3433930.95765907,40585367.6400736 "
        "3433931.42984214,40585367.6630045 3433931.9046766,40585367.6536538 "
        "3433932.37997246,40585367.6120647 3433932.85353759,40585367.5384291 "
        "3433933.32318787,40585367.4330866 3433933.7867572,40585367.2965229 "
        "3433934.24210757,40585367.129368 3433934.68713883,40585366.9323928 "
        "3433935.11979846,40585366.7065058 3433935.53809098)")
    df = _layer(f"{REF}/closed_polyline_with_bulge.dxf")
    k, pts = wkbm.parse_wkb_z(df["geometry"].iloc[0])
    assert k == "linestring"
    pts = np.asarray(pts)[:, :2]
    assert pts.shape == exp.shape
    assert np.allclose(pts, exp, rtol=0, atol=2e-7)
    assert pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]


def test_insert_block_merge():
    """ogr_dxf.py:test_ogr_dxf_9 — INSERT inlines the block as one
    merged multilinestring feature."""
    exp = _wkt_coords(
        "MULTILINESTRING ((79.069506278985116 121.003652476272777 0,"
        "79.716898725419625 118.892590150942851 0),(79.716898725419625 "
        "118.892590150942851 0,78.140638855839953 120.440702522851453 0),"
        "(78.140638855839953 120.440702522851453 0,80.139111190485622 "
        "120.328112532167196 0),(80.139111190485622 120.328112532167196 0,"
        "78.619146316248077 118.920737648613908 0),(78.619146316248077 "
        "118.920737648613908 0,79.041358781314059 120.975504978601705 0))")
    df = _layer(f"{REF}/assorted.dxf")
    mls = None
    for g in df["geometry"]:
        if g is None:
            continue
        k, payload = wkbm.parse_wkb_z(g)
        if k == "multilinestring" and len(payload) == 5:
            mls = payload
            break
    assert mls is not None, "block INSERT feature not found"
    got = np.concatenate([np.asarray(s)[:, :2] for s in mls])
    assert np.allclose(got, exp.reshape(-1, 3)[:, :2], atol=1e-9)


def test_assorted_fields():
    """Field parity on the first (ellipse) feature of assorted.dxf:
    Layer/SubClasses/Linetype/EntityHandle (ogr_dxf.py:test_ogr_dxf_2)
    plus the envelope-area checks for ellipse and arc."""
    df = _layer(f"{REF}/assorted.dxf")
    f0 = df.iloc[0]
    assert f0["Layer"] == "0"
    assert f0["SubClasses"] == "AcDbEntity:AcDbEllipse"
    assert f0["Linetype"] == "ByLayer"
    assert f0["EntityHandle"] == "43"
    assert f0["PaperSpace"] is None or np.isnan(f0["PaperSpace"])
    k, pts = wkbm.parse_wkb_z(f0["geometry"])
    pts = np.asarray(pts)
    env = ((pts[:, 0].max() - pts[:, 0].min())
           * (pts[:, 1].max() - pts[:, 1].min()))
    assert abs(env - 1596.12) < 0.5
    assert abs(pts[0, 0] - 73.25) < 0.001
    assert abs(pts[0, 1] - 139.75) < 0.001
    # partial ellipse (feature 1)
    k, pts = wkbm.parse_wkb_z(df.iloc[1]["geometry"])
    pts = np.asarray(pts)
    env = ((pts[:, 0].max() - pts[:, 0].min())
           * (pts[:, 1].max() - pts[:, 1].min()))
    assert abs(env - 311.864) < 0.5
    assert abs(pts[0, 0] - 61.133) < 0.01
    assert abs(pts[0, 1] - 103.592) < 0.01
    # POINT with true color (feature 2)
    k, p = wkbm.parse_wkb_z(df.iloc[2]["geometry"])
    assert k == "point" and np.allclose(p[0], [83.5, 160.0, 0])
    # LINE (feature 3)
    k, p = wkbm.parse_wkb_z(df.iloc[3]["geometry"])
    assert k == "linestring"
    assert np.allclose(p, [[97.0, 159.5, 0], [108.5, 132.25, 0]])
    # MTEXT (feature 4): 2D point
    k, p = wkbm.parse_wkb_z(df.iloc[4]["geometry"])
    assert k == "point" and np.allclose(np.asarray(p)[0, :2], [84, 126])
    # partial circle = ARC (feature 5)
    k, pts = wkbm.parse_wkb_z(df.iloc[5]["geometry"])
    pts = np.asarray(pts)
    env = ((pts[:, 0].max() - pts[:, 0].min())
           * (pts[:, 1].max() - pts[:, 1].min()))
    assert abs(env - 445.748) < 0.5
    assert abs(pts[0, 0] - 115.258) < 0.01
    assert abs(pts[0, 1] - 107.791) < 0.01
    # PaperSpace line (feature 6)
    assert df.iloc[6]["PaperSpace"] == 1


def test_lwpolyline_ocs():
    """ogr_dxf.py:test_ogr_dxf_10 — LWPOLYLINE in OCS (arbitrary
    axis transform)."""
    df = _layer(f"{REF}/LWPOLYLINE-OCS.dxf")
    k, pts = wkbm.parse_wkb_z(df["geometry"].iloc[1])
    assert k == "linestring"
    assert np.allclose(
        np.asarray(pts),
        [[600325.567999998573214, 3153021.253000000491738,
          562.760000000052969],
         [600255.215999998385087, 3151973.98600000096485,
          536.950000000069849],
         [597873.927999997511506, 3152247.628000000491738,
          602.705000000089058]], atol=1e-6)


def test_write_read_roundtrip(tmp_path):
    x = np.round(np.linspace(-170, 170, 50), 6)
    y = np.round(np.linspace(-80, 80, 50), 6)
    geoms = [bytes(g) for g in wkbm.points_to_wkb(x, y)]
    ds = ray.data.from_arrow(pa.table({
        "geometry": pa.array(geoms, pa.binary()),
        "lyr": pa.array([f"L{i % 3}" for i in range(50)]),
        "txt": pa.array([str(i) for i in range(50)]),
    }))
    path = str(tmp_path / "rt.dxf")
    dxf.write_dxf(ds, path, layer_col="lyr", text_col="txt")
    back = dxf.read_dxf(path).to_pandas()
    assert len(back) == 50
    back = back.sort_values("Text", key=lambda s: s.astype(int))
    gx = np.array([wkbm.parse_wkb_z(g)[1][0][0]
                   for g in back["geometry"]])
    assert np.array_equal(gx, x)
    assert set(back["Layer"]) == {"L0", "L1", "L2"}


def test_write_polyline_roundtrip(tmp_path):
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                    float)
    ds = ray.data.from_arrow(pa.table({
        "geometry": pa.array(
            [wkbm.polygon_to_wkb([ring]),
             wkbm.linestring_to_wkb([(1, 1), (5, 7)])], pa.binary())}))
    path = str(tmp_path / "poly.dxf")
    dxf.write_dxf(ds, path)
    back = dxf.read_dxf(path).to_pandas()
    kinds = sorted(wkbm.parse_wkb_z(g)[0] for g in back["geometry"])
    assert kinds == ["linestring", "linestring"]
    counts = sorted(len(wkbm.parse_wkb_z(g)[1]) for g in back["geometry"])
    assert counts == [2, 5]  # closed LWPOLYLINE re-closes the ring


def _spline_feats(path):
    ents, blocks = dxf.scan_dxf(path)
    out = []
    for e in ents:
        if e[0][1] == "SPLINE":
            r = dxf.parse_entity(e, blocks)
            out.append(np.asarray(r[1].payload))
    return out


def test_spline_weights():
    """ogr_dxf.py:test_ogr_dxf_29 — NURBS evaluation incl. rational
    weights, 8 samples per control point, exact endpoints."""
    feats = _spline_feats(f"{REF}/spline_weight.dxf")
    assert len(feats) >= 3
    for pts in feats[:3]:
        assert len(pts) == 40
        assert np.allclose(pts[0, :2], [2, 2], atol=1e-12)
        assert np.allclose(pts[-1, :2], [6, 2], atol=1e-12)
    # no weights
    assert np.allclose(feats[0][1, :2],
                       [2.1025641025641, 2.15371128980596], atol=1e-12)
    assert np.allclose(feats[0][20, :2],
                       [4.05128205128205, 3.99804447141725], atol=1e-11)
    # weight(3) = 2.0
    assert np.allclose(feats[1][1, :2],
                       [2.10976572340247, 2.16451423293308], atol=1e-12)
    # weight(3) = 0.5
    assert np.allclose(feats[2][1, :2],
                       [2.09894267472891, 2.14827889065297], atol=1e-12)


def test_spline_qcad():
    """ogr_dxf.py:test_ogr_dxf_20 — 8-control-point spline."""
    feats = _spline_feats(f"{REF}/spline_qcad.dxf")
    pts = feats[0]
    assert len(pts) == 64
    assert np.allclose(pts[0, :2], [10.75, 62.75], atol=1e-9)
    assert np.allclose(pts[1, :2],
                       [20.6377527691461, 63.4348325014897], atol=1e-9)
    assert np.allclose(pts[-1, :2], [57.25, 85.5], atol=1e-9)


def test_spline_closed():
    """ogr_dxf.py:test_ogr_dxf_30 — closed spline with explicit
    knots; first == last point."""
    feats = _spline_feats(f"{REF}/spline_closed.dxf")
    pts = feats[0]
    assert np.allclose(pts[0, :2], [14, 2], atol=1e-9)
    assert np.allclose(pts[-1, :2], [14, 2], atol=1e-9)
    assert np.allclose(pts[1, :2],
                       [13.9043277090443, 2.1111553863727], atol=1e-9)
    assert np.allclose(pts[30, :2],
                       [16.2252950548894, 3.68154190979879], atol=1e-9)


# ------------------------------------------------------------------
# HATCH (ogrdxf_hatch.cpp; VERDICT r5 item 9)

def test_hatch_circular_arcs():
    """ogr_dxf.py:test_ogr_dxf_24 — HATCH with 4 circular-arc edges
    chains into one closed polygon; coordinates pinned to the
    reference's expected WKT at OGR_ARC_STEPSIZE=45."""
    import os

    exp1 = _wkt_coords(
        "POLYGON ((2 1,1.646446609406726 0.853553390593274,1.5 0.5,"
        "1.646446609406726 0.146446609406726,2 0,"
        "2.146446609406726 -0.353553390593274,2.5 -0.5,"
        "2.853553390593274 -0.353553390593274,3.0 -0.0,"
        "3.353553390593274 0.146446609406726,3.5 0.5,"
        "3.353553390593274 0.853553390593273,3 1,"
        "2.853553390593274 1.353553390593274,2.5 1.5,"
        "2.146446609406726 1.353553390593274,2 1))")
    os.environ["OGR_ARC_STEPSIZE"] = "45"
    try:
        frs, blocks = dxf.scan_dxf(f"{REF}/hatch.dxf")
        feats = [g for fr in frs for _f, g in
                 dxf.parse_features(fr, blocks)]
    finally:
        del os.environ["OGR_ARC_STEPSIZE"]
    assert [g.kind for g in feats] == ["polygon"] * 3
    ring = np.asarray(feats[0].payload[0])[:, :2]
    assert ring.shape == exp1.shape
    assert np.abs(ring - exp1).max() < 1e-12
    # third hatch: polyline boundary path
    r3 = np.asarray(feats[2].payload[0])[:, :2]
    exp3 = _wkt_coords("POLYGON ((-1 -1,-1 0,0 0,-1 -1))")
    assert np.abs(r3 - exp3).max() < 1e-12


def test_hatch_as_multipolygon():
    """ogr_dxf.py:test_ogr_dxf_hatch_as_multipolygon — five disjoint
    boundary paths organize into a 5-polygon MULTIPOLYGON (touching
    rings are NOT nested)."""
    frs, blocks = dxf.scan_dxf(f"{REF}/hatch_as_multipolygon.dxf")
    g = [g for fr in frs for _f, g in dxf.parse_features(fr, blocks)][0]
    assert g.kind == "multipolygon"
    assert len(g.payload) == 5
    assert all(len(p) == 1 for p in g.payload)  # no holes
    exp = _wkt_coords(
        "POLYGON ((358.626489135389 -3222.17795096722,"
        "351.920706594896 -3213.54792929232,"
        "337.147774411618 -3225.08824421182,"
        "343.594999049021 -3233.57143454121,"
        "358.626489135389 -3222.17795096722))")
    errs = []
    for p in g.payload:
        r = np.asarray(p[0])[:, :2]
        if r.shape == exp.shape:
            errs.append(np.abs(r - exp).max())
    assert errs and min(errs) < 1e-9


def test_hatch_elliptical_arc():
    """ogr_dxf.py:test_ogr_dxf_35 — elliptical-arc boundary with the
    circular-angle -> elliptical-parameter conversion; first vertices
    pinned to the reference's expected WKT (default 4-degree step)."""
    frs, blocks = dxf.scan_dxf(f"{REF}/elliptical-arc-hatch-min.dxf")
    feats = [g for fr in frs for _f, g in dxf.parse_features(fr, blocks)]
    r = np.asarray(feats[0].payload[0])
    assert np.abs(r[0] - [10.0, 5.0, 0.0]).max() < 1e-12
    assert np.abs(r[1] - [10.0121275732481, 0.823574944937595, 0]
                  ).max() < 1e-10


def test_hatch_spline_boundary_with_ocs():
    """ogr_dxf.py:test_ogr_dxf_52 HATCH 1 — spline boundary edge +
    210 extrusion: NURBS stroke then the arbitrary-axis OCS transform;
    first three vertices pinned."""
    frs, blocks = dxf.scan_dxf(f"{REF}/additional-entities.dxf")
    hatches = [g for fr in frs for f, g in dxf.parse_features(fr, blocks)
               if g is not None and "AcDbHatch" in str(f.get("SubClasses"))]
    r = np.asarray(hatches[0].payload[0])
    exp = np.array([[47.6969600708475, 60.0, 15.0],
                    [47.6969600708475, 0.0, 15.0],
                    [46.1103652823066, -0.466958240734954,
                     14.5010390223444]])
    assert np.abs(r[:3] - exp).max() < 1e-10
    # HATCH 2: plain 2D spline boundary
    r2 = np.asarray(hatches[1].payload[0])
    assert np.abs(r2[0][:2] - [77.2409948093467, 172.430072843974]
                  ).max() < 1e-10


# ------------------------------------------------------------------
# DIMENSION (ogrdxf_dimension.cpp)

def test_dimension_anonymous_block():
    """ogr_dxf.py:test_ogr_dxf_46 (#7120) — a DIMENSION naming an
    anonymous *D block inserts that block UNMERGED: extension lines
    then arrow lines as separate LINESTRING features."""
    frs, blocks = dxf.scan_dxf(f"{REF}/dimension.dxf")
    feats = [x for fr in frs for x in dxf.parse_features(fr, blocks)]
    exp = [
        [(320000.0, 5820010.0625), (320000.0, 5820010.43087258)],
        [(320010.0, 5820010.0625), (320010.0, 5820010.43087258)],
        [(320000.18, 5820010.25087258), (320004.475225102,
                                         5820010.25087258)],
        [(320009.82, 5820010.25087258), (320005.524774898,
                                         5820010.25087258)],
    ]
    for (want, (_f, g)) in zip(exp, feats):
        assert g.kind == "linestring"
        got = np.asarray(g.payload)[:, :2]
        assert np.abs(got - np.asarray(want)).max() < 1e-8


def test_dimension_fallback_rendering():
    """ogr_dxf.py:test_ogr_dxf_8 — a DIMENSION with no block renders
    the fallback: arrow + extension MULTILINESTRING, two default 3:1
    arrowhead triangles, and a text point whose label is the computed
    distance at the DIMSTYLE's DIMDEC precision ("54.33")."""
    frs, blocks = dxf.scan_dxf(f"{REF}/assorted.dxf")
    feats = [x for fr in frs for x in dxf.parse_features(fr, blocks)]
    f_mls, g_mls = feats[7]
    assert g_mls.kind == "multilinestring" and len(g_mls.payload) == 3
    exp_mls = _wkt_coords(
        "MULTILINESTRING ((63.8628719444825 149.209935992088,"
        "24.3419606685507 111.934531038653),"
        "(72.3255686642474 140.237438265109,"
        "63.0051995752285 150.119275371538),"
        "(32.8046573883157 102.962033311673,"
        "23.4842882992968 112.843870418103))")
    got = np.vstack([np.asarray(s)[:, :2] for s in g_mls.payload])
    assert np.abs(got - exp_mls).max() < 1e-9
    _fa, g_a1 = feats[8]
    assert g_a1.kind == "polygon"
    exp_a1 = _wkt_coords(
        "POLYGON ((61.7583023958313 147.797704380064,"
        "63.8628719444825 149.209935992088,"
        "62.3300839753339 147.191478127097,"
        "61.7583023958313 147.797704380064))")
    assert np.abs(np.asarray(g_a1.payload[0])[:, :2]
                  - exp_a1).max() < 1e-9
    _fa2, g_a2 = feats[9]
    assert g_a2.kind == "polygon"
    ft, g_t = feats[10]
    assert g_t.kind == "point"
    assert np.abs(np.asarray(g_t.payload)[0, :2]
                  - [42.815907752635709, 131.936242584545397]
                  ).max() < 1e-9
    assert ft["Text"] == "54.33"   # <> replaced at DIMDEC=2 precision
