"""Vector format drivers: WKT codec, GeoJSON(/Seq), CSV-WKT roundtrips.

Reference parity: OGR geojson + csv drivers and
OGRGeometryFactory::createFromWkt / exportToWkt
(ogr/ogrsf_frmts/geojson, ogr/ogrsf_frmts/csv, ogr/ogrgeometryfactory.cpp).
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as W
from lib_gdal_ray.geom import wkt as T
from lib_gdal_ray.sources import vector_formats as vf


def _sample_geoms():
    return [
        W.points_to_wkb(np.array([1.5]), np.array([-2.25]))[0],
        W.linestring_to_wkb(np.array([[0, 0], [1, 1], [2, 0.5]], float)),
        W.polygon_to_wkb([
            np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
            np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)]),
        W.multipoint_to_wkb(np.array([[0, 1], [2, 3.5]])),
        W.multilinestring_to_wkb([np.array([[0, 0], [1, 0]], float),
                                  np.array([[2, 2], [3, 3]], float)]),
        W.multipolygon_to_wkb([[np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)],
                               [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)]]),
        W.geometrycollection_to_wkb([
            W.points_to_wkb(np.array([1.0]), np.array([2.0]))[0],
            W.linestring_to_wkb(np.array([[0, 0], [1, 1]], float))]),
    ]


class TestWkt:
    def test_wkb_wkt_roundtrip_all_types(self):
        for buf in _sample_geoms():
            s = T.wkb_to_wkt(buf)
            assert T.wkb_to_wkt(T.wkt_to_wkb(s)) == s

    @pytest.mark.parametrize("text,norm", [
        ("POINT (30 10)", "POINT (30 10)"),
        ("POINT Z (1 2 3)", "POINT Z (1 2 3)"),
        ("MULTIPOINT (10 40, 40 30)", "MULTIPOINT ((10 40), (40 30))"),
        ("MULTIPOINT ((10 40), (40 30))", "MULTIPOINT ((10 40), (40 30))"),
        ("POLYGON ((0 0, 10 0, 10 10, 0 0))", "POLYGON ((0 0, 10 0, 10 10, 0 0))"),
        ("POLYGON EMPTY", "POLYGON EMPTY"),
        ("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY"),
        ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
         "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"),
        ("LINESTRING (-1.5 2e3, 0.25 -0.125)", "LINESTRING (-1.5 2000, 0.25 -0.125)"),
    ])
    def test_external_forms_normalize(self, text, norm):
        assert T.wkb_to_wkt(T.wkt_to_wkb(text)) == norm

    def test_float_exactness(self):
        # repr shortest-roundtrip: parse(format(x)) bit-exact
        vals = np.array([0.1, 1 / 3, -177.123456789, 1e-12])
        buf = W.linestring_to_wkb(np.stack([vals, vals * 2], axis=1))
        back = T.wkt_to_wkb(T.wkb_to_wkt(buf))
        assert back == buf

    def test_errors(self):
        with pytest.raises(ValueError):
            T.wkt_to_wkb("CIRCLE (0 0, 1)")
        # trailing text is tolerated by default (OGR importFromWkt
        # cursor semantics — the reference's own corpus carries it);
        # strict mode restores the hard error
        assert T.wkt_to_wkb("POINT (1 2) trailing") == \
            T.wkt_to_wkb("POINT (1 2)")
        with pytest.raises(ValueError):
            T.wkt_to_wkb("POINT (1 2) trailing", strict=True)


class TestGeoJsonGeom:
    def test_geom_dict_roundtrip(self):
        for buf in _sample_geoms():
            g = vf.wkb_to_geojson_geom(buf)
            back = vf.geojson_geom_to_wkb(g)
            assert T.wkb_to_wkt(back) == T.wkb_to_wkt(buf)

    def test_null_geometry(self):
        assert vf.geojson_geom_to_wkb(None) is None
        assert vf.wkb_to_geojson_geom(None) is None


class TestDatasetRoundtrips:
    def _layer(self):
        geoms = _sample_geoms()
        return ray.data.from_arrow(pa.table({
            "fid": pa.array(range(len(geoms))),
            "name": pa.array([f"f{i}" for i in range(len(geoms))]),
            "geometry": pa.array(geoms, type=pa.binary()),
        }))

    def test_geojson_seq(self, ray_session, tmp_path):
        out = str(tmp_path / "seq")
        vf.write_geojson_seq(self._layer(), out)
        # every line is valid JSON Feature
        lines = []
        for f in os.listdir(out):
            lines += [json.loads(l) for l in open(os.path.join(out, f))
                      if l.strip()]
        assert all(l["type"] == "Feature" for l in lines)
        back = (vf.read_geojson_seq(out, properties=["fid", "name"])
                .to_pandas().sort_values("fid").reset_index(drop=True))
        want = [T.wkb_to_wkt(g) for g in _sample_geoms()]
        assert [T.wkb_to_wkt(g) for g in back["geometry"]] == want
        assert list(back["name"]) == [f"f{i}" for i in range(len(want))]

    def test_csv_wkt(self, ray_session, tmp_path):
        out = str(tmp_path / "csv")
        vf.write_csv_wkt(self._layer(), out)
        back = (vf.read_csv_wkt(out).to_pandas()
                .sort_values("fid").reset_index(drop=True))
        want = [T.wkb_to_wkt(g) for g in _sample_geoms()]
        assert [T.wkb_to_wkt(g) for g in back["geometry"]] == want

    def test_feature_collection(self, ray_session, tmp_path):
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": {"a": 1}},
            {"type": "Feature", "geometry": None, "properties": {"a": 2}},
        ]}
        p = tmp_path / "fc.geojson"
        p.write_text(json.dumps(fc))
        out = vf.read_geojson(str(p)).to_pandas().sort_values("a")
        assert list(out["a"]) == [1, 2]
        assert T.wkb_to_wkt(out["geometry"].iloc[0]) == "POINT (1 2)"
        assert out["geometry"].iloc[1] is None


class TestGpkg:
    """GeoPackage driver (sources/gpkg.py; reference ogr/ogrsf_frmts/gpkg)."""

    def _layer(self, n=200):
        lon = np.linspace(-10, 10, n)
        lat = np.linspace(40, 50, n)
        geoms = [W.points_to_wkb(np.array([x]), np.array([y]))[0]
                 for x, y in zip(lon, lat)]
        return pa.table({
            "pid": pa.array(np.arange(n)),
            "name": pa.array([f"f{i}" for i in range(n)]),
            "score": pa.array(lon * 1.5),
            "flag": pa.array([i % 2 == 0 for i in range(n)]),
            "geometry": pa.array(geoms, type=pa.binary()),
        })

    def test_roundtrip_partitioned(self, tmp_path):
        from lib_gdal_ray.sources import gpkg

        t = self._layer()
        out = str(tmp_path / "parts")
        gpkg.write_gpkg(ray.data.from_arrow(t).repartition(3), out, layer="pts",
                        geometry_type="POINT")
        assert len([f for f in os.listdir(out) if f.endswith(".gpkg")]) == 3
        back = gpkg.read_gpkg(out).to_pandas().sort_values("pid").reset_index(drop=True)
        assert len(back) == 200
        assert list(back["pid"]) == list(range(200))
        assert back["name"].iloc[5] == "f5"
        np.testing.assert_allclose(back["score"].to_numpy(),
                                   np.linspace(-10, 10, 200) * 1.5)
        # booleans ride as sqlite INTEGER
        assert set(back["flag"].unique()) == {0, 1}
        glon, glat = W.wkb_to_points(np.asarray(back["geometry"].to_list(),
                                                dtype=object))
        np.testing.assert_allclose(glon, np.linspace(-10, 10, 200))

    def test_rowid_split_single_file(self, tmp_path):
        from lib_gdal_ray.sources import gpkg

        t = self._layer(500)
        out = str(tmp_path / "parts")
        gpkg.write_gpkg(ray.data.from_arrow(t).repartition(1), out, layer="pts")
        f = [os.path.join(out, x) for x in os.listdir(out)][0]
        ds = gpkg.read_gpkg(f, rows_per_task=120)
        # 500 rows / 120 per task -> 5 splits, all rows exactly once
        df = ds.to_pandas()
        assert sorted(df["pid"]) == list(range(500))

    def test_column_pruning_and_geom_types(self, tmp_path):
        from lib_gdal_ray.sources import gpkg

        geoms = _sample_geoms()
        t = pa.table({"gid": pa.array(range(len(geoms))),
                      "geometry": pa.array(geoms, type=pa.binary())})
        out = str(tmp_path / "g")
        gpkg.write_gpkg(ray.data.from_arrow(t), out, layer="mixed")
        back = gpkg.read_gpkg(out).to_pandas().sort_values("gid")
        assert [bytes(b) for b in back["geometry"]] == geoms  # WKB byte-exact
        only = gpkg.read_gpkg(out, columns=["gid"]).to_pandas()
        assert list(only.columns) == ["gid"]

    def test_merge_single_file(self, tmp_path):
        from lib_gdal_ray.sources import gpkg

        t = self._layer(90)
        out = str(tmp_path / "parts")
        gpkg.write_gpkg(ray.data.from_arrow(t).repartition(3), out, layer="pts")
        total = gpkg.merge_gpkg_dir(out, str(tmp_path / "one.gpkg"), layer="pts")
        assert total == 90
        back = gpkg.read_gpkg(str(tmp_path / "one.gpkg")).to_pandas()
        assert sorted(back["pid"]) == list(range(90))

    def test_blob_codec_envelopes(self):
        from lib_gdal_ray.sources.gpkg import gpkg_blob_to_wkb, wkb_to_gpkg_blob
        import struct as _s

        wkb = W.points_to_wkb(np.array([3.0]), np.array([4.0]))[0]
        blob = wkb_to_gpkg_blob(wkb)
        assert blob[:2] == b"GP" and gpkg_blob_to_wkb(blob) == wkb
        # envelope indicator 1 (xy): 4 doubles between header and WKB
        env = b"GP\x00" + bytes([0x01 | (1 << 1)]) + _s.pack("<i", 4326) \
            + _s.pack("<4d", 0, 1, 0, 1) + wkb
        assert gpkg_blob_to_wkb(env) == wkb
        assert gpkg_blob_to_wkb(None) is None
        with pytest.raises(ValueError):
            gpkg_blob_to_wkb(b"XX" + blob[2:])

    def test_nulls_and_empty_layer_name_guard(self, tmp_path):
        from lib_gdal_ray.sources import gpkg

        t = pa.table({"gid": pa.array([1, 2]),
                      "geometry": pa.array([_sample_geoms()[0], None],
                                           type=pa.binary())})
        out = str(tmp_path / "n")
        gpkg.write_gpkg(ray.data.from_arrow(t), out, layer="pts")
        back = gpkg.read_gpkg(out).to_pandas().sort_values("gid")
        assert back["geometry"].iloc[1] is None
        with pytest.raises(ValueError):
            gpkg.read_gpkg(out, layer="missing").count()


class TestShapefile:
    """ESRI Shapefile driver (sources/shapefile.py; reference
    ogr/ogrsf_frmts/shape + ESRI TD 1998)."""

    def test_roundtrip_points_attrs(self, tmp_path):
        from lib_gdal_ray.sources import shapefile as shp

        n = 300
        lon = np.linspace(-10, 10, n)
        lat = np.linspace(40, 50, n)
        geoms = [W.points_to_wkb(np.array([x]), np.array([y]))[0]
                 for x, y in zip(lon, lat)]
        t = pa.table({"pid": pa.array(np.arange(n)),
                      "name": pa.array([f"n{i}" for i in range(n)]),
                      "flag": pa.array([i % 3 == 0 for i in range(n)]),
                      "geometry": pa.array(geoms, type=pa.binary())})
        out = str(tmp_path / "pts")
        shp.write_shapefile(ray.data.from_arrow(t).repartition(3), out)
        files = os.listdir(out)
        assert len([f for f in files if f.endswith(".shp")]) == 3
        assert len([f for f in files if f.endswith(".dbf")]) == 3
        back = shp.read_shapefile(out).to_pandas().sort_values("pid").reset_index(drop=True)
        assert list(back["pid"]) == list(range(n))
        assert back["name"].iloc[7] == "n7"
        assert bool(back["flag"].iloc[0]) and not bool(back["flag"].iloc[1])
        blon, blat = W.wkb_to_points(np.asarray(back["geometry"].to_list(), dtype=object))
        np.testing.assert_allclose(blon, lon)

    def test_record_range_splits(self, tmp_path):
        from lib_gdal_ray.sources import shapefile as shp

        n = 500
        geoms = [W.points_to_wkb(np.array([float(i)]), np.array([0.0]))[0]
                 for i in range(n)]
        t = pa.table({"pid": pa.array(np.arange(n)),
                      "geometry": pa.array(geoms, type=pa.binary())})
        out = str(tmp_path / "one")
        shp.write_shapefile(ray.data.from_arrow(t).repartition(1), out)
        f = [os.path.join(out, x) for x in os.listdir(out) if x.endswith(".shp")][0]
        df = shp.read_shapefile(f, rows_per_task=120).to_pandas()
        assert sorted(df["pid"]) == list(range(n))

    @pytest.mark.parametrize("idx", [1, 2, 3, 4, 5])
    def test_geometry_types_roundtrip(self, idx):
        from lib_gdal_ray.sources import shapefile as shp

        g = _sample_geoms()[idx]
        st, content = shp.wkb_to_shp_record(g)
        back = shp.shp_record_to_wkb(content)
        k1, p1 = W.parse_wkb(g)
        k2, p2 = W.parse_wkb(back)
        assert k1 == k2
        # area/length-preserving (ring orientation may be normalized)
        if k1 in ("polygon", "multipolygon"):
            def area(polys):
                if k1 == "polygon":
                    polys = [polys]
                tot = 0.0
                for rings in polys:
                    for i, r in enumerate(rings):
                        a = abs(0.5 * np.sum(
                            r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
                        tot += a if i == 0 else -a
                return tot
            np.testing.assert_allclose(area(p2), area(p1))

    def test_hole_assignment_two_shells(self):
        from lib_gdal_ray.sources import shapefile as shp

        # two disjoint shells, hole inside the SECOND one
        mp = W.multipolygon_to_wkb([
            [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)],
            [np.array([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]], float),
             np.array([[12, 12], [14, 12], [14, 14], [12, 14], [12, 12]], float)],
        ])
        st, content = shp.wkb_to_shp_record(mp)
        k, polys = W.parse_wkb(shp.shp_record_to_wkb(content))
        assert k == "multipolygon"
        with_hole = [p for p in polys if len(p) == 2]
        assert len(with_hole) == 1
        assert with_hole[0][0][:, 0].max() == 20.0  # hole on the big shell

    def test_null_geometry(self):
        from lib_gdal_ray.sources import shapefile as shp

        st, content = shp.wkb_to_shp_record(None)
        assert shp.shp_record_to_wkb(content) is None

    def test_mixed_types_rejected(self, tmp_path):
        from lib_gdal_ray.sources import shapefile as shp

        t = pa.table({"gid": pa.array([1, 2]), "geometry": pa.array(
            [_sample_geoms()[0], _sample_geoms()[1]], type=pa.binary())})
        with pytest.raises(Exception):
            shp.write_shapefile(ray.data.from_arrow(t), str(tmp_path / "m"))


class TestOgr2OgrCli:
    def test_translate_chain(self, tmp_path):
        """parquet -> gpkg (where + reproject + simplify) -> geojsonseq,
        exercising the CLI in subprocesses (each owns its Ray session)."""
        import json as _json
        import subprocess
        import sys as _sys

        from lib_gdal_ray.geom import wkb as W2

        src = str(tmp_path / "zones.parquet")
        polys = [W2.box_to_wkb(i, i, i + 2.0, i + 2.0) for i in range(20)]
        pa.parquet.write_table(
            pa.table({"zid": pa.array(np.arange(20, dtype=np.int64)),
                      "geometry": pa.array(polys, type=pa.binary())}), src)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "ogr2ogr.py")
        gpkg = str(tmp_path / "zones.gpkg")
        out = subprocess.run(
            [_sys.executable, cli, gpkg, src, "-where", "zid < 10",
             "-t_srs", "EPSG:3857", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        rep = _json.loads(out.stdout.strip().splitlines()[-1])
        assert rep["rows"] == 10 and rep["dst_format"] == "gpkg"
        seq = str(tmp_path / "zones.geojsonl")
        out2 = subprocess.run(
            [_sys.executable, cli, seq, gpkg, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out2.returncode == 0, out2.stderr[-800:]
        n_lines = sum(1 for f in os.listdir(seq)
                      for _ in open(os.path.join(seq, f))) \
            if os.path.isdir(seq) else sum(1 for _ in open(seq))
        assert n_lines == 10

        # classic .geojson destination: ONE FeatureCollection file
        # (previously fell through _write and silently wrote nothing)
        gj = str(tmp_path / "zones.geojson")
        out3 = subprocess.run(
            [_sys.executable, cli, gj, src, "-where", "zid < 3",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out3.returncode == 0, out3.stderr[-800:]
        rep3 = _json.loads(out3.stdout.strip().splitlines()[-1])
        assert rep3["rows"] == 3 and rep3["dst_format"] == "geojson"
        doc = _json.load(open(gj))
        assert doc["type"] == "FeatureCollection"
        assert sorted(f["properties"]["zid"] for f in doc["features"]) \
            == [0, 1, 2]

        # gpkg source with 3857 srs metadata: -t_srs back to 4326 must
        # pick up the source CRS (not assume 4326)
        back = str(tmp_path / "back.geojson")
        out4 = subprocess.run(
            [_sys.executable, cli, back, gpkg, "-t_srs", "EPSG:4326",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out4.returncode == 0, out4.stderr[-800:]
        doc4 = _json.load(open(back))
        xs = [c for f in doc4["features"]
              for ring in f["geometry"]["coordinates"] for c, _ in ring]
        assert max(abs(x) for x in xs) < 180.5  # degrees, not meters


class TestOgr2OgrNewFormats:
    def test_fgb_gml_kml_gpx_outputs_and_ogrinfo(self, tmp_path):
        """CSV-WKT -> each round-4 output format, then ogrinfo reads
        the .fgb back (subprocesses; each owns its Ray session)."""
        import json as _json
        import subprocess
        import sys as _sys

        src = str(tmp_path / "pts.csv")
        with open(src, "w") as f:
            f.write("id,wkt\n")
            for i in range(5):
                f.write(f'{i},"POINT ({i} {i + 1})"\n')
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "ogr2ogr.py")
        for ext, n_exp in (("fgb", 5), ("gml", 5), ("kml", 5), ("gpx", 5)):
            dst = str(tmp_path / f"o.{ext}")
            out = subprocess.run(
                [_sys.executable, cli, dst, src, "--num-cpus", "2"],
                capture_output=True, text=True, timeout=300)
            assert out.returncode == 0, (ext, out.stderr[-800:])
            rep = _json.loads(out.stdout.strip().splitlines()[-1])
            assert rep["rows"] == n_exp and rep["dst_format"] == ext
        info = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "ogrinfo.py"),
             str(tmp_path / "o.fgb"), "-where", "id >= 2",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert info.returncode == 0, info.stderr[-800:]
        rep = _json.loads(info.stdout.strip().splitlines()[-1])
        assert rep["n_features"] == 3
        assert rep["geom_types"] == {"point": 3}
        assert rep["extent"] == [2.0, 3.0, 4.0, 5.0]


class TestTindexMdiminfoCli:
    def test_gdaltindex_and_mdiminfo(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        from lib_gdal_ray.codecs.tiff import encode_geotiff
        from lib_gdal_ray.sources.hdf5 import write_hdf5

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        srcs = []
        for i in range(2):
            p = str(tmp_path / f"{i}.tif")
            with open(p, "wb") as f:
                f.write(encode_geotiff(np.full((4, 4), i, np.uint8),
                                       transform=(i * 4, 1, 0, 4, 0, -1),
                                       epsg=4326))
            srcs.append(p)
        idx = str(tmp_path / "index.geojsonl")
        vrt = str(tmp_path / "m.vrt")
        out = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdaltindex.py"),
             idx, *srcs, "-vrt", vrt, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        rep = _json.loads(out.stdout.strip().splitlines()[-1])
        assert rep["n_rasters"] == 2 and rep["vrt"]["xsize"] == 8
        from lib_gdal_ray.sources.vrt import open_vrt
        arr, _ = open_vrt(vrt)
        assert arr.shape == (4, 8)

        h5 = str(tmp_path / "m.h5")
        write_hdf5(h5, {"v": np.zeros((4, 5))}, chunks={"v": (2, 5)})
        out2 = subprocess.run(
            [_sys.executable,
             os.path.join(repo, "scripts", "gdalmdiminfo.py"), h5],
            capture_output=True, text=True, timeout=120)
        assert out2.returncode == 0, out2.stderr[-800:]
        rep2 = _json.loads(out2.stdout.strip())
        assert rep2["driver"] == "HDF5"
        assert rep2["arrays"]["/v"]["chunks"] == [2, 5]
