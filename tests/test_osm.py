"""OSM PBF/XML driver tests — pinned against the reference's own
fixtures (`autotest/ogr/data/osm/*`) and the expectations hardcoded
in `autotest/ogr/ogr_osm.py:test_ogr_osm_1`."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import osm

REF = "/root/reference/autotest/ogr/data/osm"


# ------------------------------------------------------------- codec

def test_packed_varint_roundtrip():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, size=1000, dtype=np.int64).astype(
        np.uint64)
    vals[:10] = [0, 1, 127, 128, 129, 16383, 16384, (1 << 35) - 1,
                 (1 << 56) + 3, (1 << 63) - 1]
    enc = osm.encode_packed_u64(vals)
    back = osm.decode_packed_u64(enc)
    assert np.array_equal(back, vals)


def test_packed_signed_delta_roundtrip():
    rng = np.random.default_rng(8)
    vals = rng.integers(-(1 << 40), 1 << 40, size=500, dtype=np.int64)
    enc = osm.encode_packed_s64(vals, delta=True)
    back = osm.decode_packed_s64(enc, delta=True)
    assert np.array_equal(back, vals)
    # matches the scalar reference codec byte-for-byte
    from lib_gdal_ray.codecs.protobuf import write_varint, zigzag
    deltas = np.diff(vals, prepend=np.int64(0))
    ref = b"".join(write_varint(zigzag(int(d))) for d in deltas)
    assert enc == ref


# ----------------------------------------------------- fixture parity

def _d(ds):
    return ds.to_pandas()


@pytest.mark.parametrize("fixture", ["test.pbf", "test.osm",
                                     "test_uncompressed_dense_false.pbf"])
def test_reference_layers(fixture):
    """The five layers match ogr_osm.py:test_ogr_osm_1 exactly."""
    path = f"{REF}/{fixture}"
    layers = osm.osm_layers(path)

    pts = _d(layers["points"])
    assert len(pts) == 1
    assert pts["osm_id"].iloc[0] == "3"
    assert pts["name"].iloc[0] == "Some interesting point"
    assert pts["other_tags"].iloc[0] == '"foo"=>"bar","bar"=>"baz"'
    kind, payload = wkbm.parse_wkb(pts["geometry"].iloc[0])
    assert kind == "point"
    assert tuple(np.round(payload[0], 6)) == (3.0, 49.5)

    lines = _d(layers["lines"]).sort_values("osm_id").reset_index(drop=True)
    assert list(lines["osm_id"]) == ["1", "6"]
    assert lines["highway"].iloc[0] == "motorway"
    assert lines["z_order"].iloc[0] == 9
    assert lines["other_tags"].iloc[0] == '"foo"=>"bar"'
    k1, p1 = wkbm.parse_wkb(lines["geometry"].iloc[0])
    assert k1 == "linestring"
    assert np.allclose(p1, [[2, 49], [3, 50]])
    k6, p6 = wkbm.parse_wkb(lines["geometry"].iloc[1])
    # way 6 references a missing node (900): dropped, way kept
    assert np.allclose(p6, [[2, 49], [3, 49], [3, 50], [2, 50], [2, 49]])
    assert lines["name"].iloc[1] == "id_6"

    mp = _d(layers["multipolygons"])
    assert len(mp) == 3
    rels = mp[mp["osm_id"].notna()].sort_values("osm_id")
    assert list(rels["osm_id"]) == ["1", "5"]
    assert list(rels["type"]) == ["multipolygon", "multipolygon"]
    assert rels["natural"].tolist() == ["forest", "wood"]  # 5 inherits
    stand = mp[mp["osm_way_id"].notna()]
    assert stand["osm_way_id"].tolist() == ["8"]
    assert stand["name"].tolist() == ["standalone_polygon"]
    kind, polys = wkbm.parse_wkb(rels["geometry"].iloc[0])
    assert kind == "multipolygon"
    assert len(polys) == 1 and len(polys[0]) == 2  # outer + hole
    assert np.allclose(polys[0][0],
                       [[2, 49], [3, 49], [3, 50], [2, 50], [2, 49]])
    assert np.allclose(polys[0][1][0], [2.1, 49.1])

    mls = _d(layers["multilinestrings"])
    assert mls["osm_id"].tolist() == ["3"]
    assert mls["type"].tolist() == ["route"]
    kind, segs = wkbm.parse_wkb(mls["geometry"].iloc[0])
    assert kind == "multilinestring"
    assert np.allclose(segs[0], [[2, 49], [3, 50]])

    other = _d(layers["other_relations"])
    assert other["osm_id"].tolist() == ["4"]
    assert other["type"].tolist() == ["other_type"]
    kind, members = wkbm.parse_wkb(other["geometry"].iloc[0])
    assert kind == "geometrycollection"
    assert len(members) == 2
    k0, pay0 = members[0]
    k1, pay1 = members[1]
    assert k0 == "point" and np.allclose(pay0[0], [2, 49])
    assert k1 == "linestring" and np.allclose(pay1, [[2, 49], [3, 50]])


def test_element_counts():
    elems = osm.read_osm_elements(f"{REF}/test.pbf").to_pandas()
    assert (elems["kind"] == 0).sum() == 9
    assert (elems["kind"] == 1).sum() == 8
    assert (elems["kind"] == 2).sum() == 5


# --------------------------------------------------------- roundtrip

def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    n = 500
    ids = np.arange(1, n + 1, dtype=np.int64)
    lon = np.round(rng.uniform(-179, 179, n), 7)
    lat = np.round(rng.uniform(-85, 85, n), 7)
    tag_k = [["name"] if i % 5 == 0 else [] for i in range(n)]
    tag_v = [[f"n{i}"] if i % 5 == 0 else [] for i in range(n)]
    nodes = ray.data.from_arrow(pa.table({
        "id": ids, "lon": lon, "lat": lat,
        "tag_k": pa.array(tag_k, pa.list_(pa.string())),
        "tag_v": pa.array(tag_v, pa.list_(pa.string()))}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "refs": pa.array([[1, 2, 3], [10, 11, 12, 10]],
                         pa.list_(pa.int64())),
        "tag_k": pa.array([["highway"], ["building"]],
                          pa.list_(pa.string())),
        "tag_v": pa.array([["residential"], ["yes"]],
                          pa.list_(pa.string()))}))
    path = str(tmp_path / "rt.osm.pbf")
    osm.write_osm_pbf(path, nodes=nodes, ways=ways)

    back = osm.read_osm_elements(path).to_pandas()
    nb = back[back["kind"] == 0].sort_values("id")
    assert len(nb) == n
    assert np.allclose(nb["lon"].to_numpy(), lon[np.argsort(ids)],
                       atol=1e-7)
    assert np.allclose(nb["lat"].to_numpy(), lat[np.argsort(ids)],
                       atol=1e-7)
    tagged = nb[nb["tag_k"].map(len) > 0]
    assert len(tagged) == n // 5
    wb = back[back["kind"] == 1].sort_values("id")
    assert [list(r) for r in wb["refs"]] == [[1, 2, 3], [10, 11, 12, 10]]
    assert list(zip(wb["tag_k"].iloc[0], wb["tag_v"].iloc[0])) == \
        [("highway", "residential")]


def test_roundtrip_uncompressed(tmp_path):
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([5, 9], pa.int64()),
        "lon": pa.array([1.5, -2.25]), "lat": pa.array([40.0, -3.5])}))
    path = str(tmp_path / "raw.osm.pbf")
    osm.write_osm_pbf(path, nodes=nodes, compress=False)
    back = osm.read_osm_elements(path).to_pandas()
    assert np.allclose(sorted(back["lon"]), [-2.25, 1.5])


def test_relation_roundtrip(tmp_path):
    rels = ray.data.from_arrow(pa.table({
        "id": pa.array([7], pa.int64()),
        "m_type": pa.array([[1, 1, 0]], pa.list_(pa.int8())),
        "m_ref": pa.array([[2, 3, 44]], pa.list_(pa.int64())),
        "m_role": pa.array([["outer", "inner", ""]],
                           pa.list_(pa.string())),
        "tag_k": pa.array([["type"]], pa.list_(pa.string())),
        "tag_v": pa.array([["multipolygon"]], pa.list_(pa.string()))}))
    path = str(tmp_path / "rel.osm.pbf")
    osm.write_osm_pbf(path, relations=rels)
    back = osm.read_osm_elements(path).to_pandas()
    r = back[back["kind"] == 2].iloc[0]
    assert r["id"] == 7
    assert list(r["m_type"]) == [1, 1, 0]
    assert list(r["m_ref"]) == [2, 3, 44]
    assert list(r["m_role"]) == ["outer", "inner", ""]


# ------------------------------------------------- shuffle join path

def test_shuffle_way_resolution_matches_broadcast():
    path = f"{REF}/test.pbf"
    shuf = osm.resolve_ways_shuffle(path).to_pandas()
    idx_ref = osm._broadcast_nodes(path)
    bc = osm._ways_with_coords(path, idx_ref).to_pandas()
    # the shuffle path keeps only resolvable refs; compare way 1
    s1 = np.asarray(
        shuf[shuf["way_id"] == 1]["xy"].iloc[0], np.float64)
    b1 = np.asarray(bc[bc["id"] == 1]["xy"].iloc[0], np.float64)
    assert np.allclose(s1, b1)
    # every broadcast-resolved way present with same ref count
    got = {int(w): len(x) // 2 for w, x in zip(shuf["way_id"], shuf["xy"])}
    for wid, xy in zip(bc["id"], bc["xy"]):
        assert got[int(wid)] == len(xy) // 2


def test_xml_pbf_identical():
    a = osm.read_osm_elements(f"{REF}/test.pbf").to_pandas()
    b = osm.read_osm_elements(f"{REF}/test.osm").to_pandas()
    for kind in (0, 1, 2):
        ka = a[a["kind"] == kind].sort_values("id").reset_index(drop=True)
        kb = b[b["kind"] == kind].sort_values("id").reset_index(drop=True)
        assert list(ka["id"]) == list(kb["id"])
    na = a[a["kind"] == 0].sort_values("id")
    nb = b[b["kind"] == 0].sort_values("id")
    assert np.allclose(na["lon"].to_numpy(), nb["lon"].to_numpy(),
                       atol=5e-7)
