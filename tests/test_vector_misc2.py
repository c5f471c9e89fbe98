"""Arrow IPC / GeoArrow driver + CSV X-Y/.csvt point reading, pinned
against the reference's autotest fixtures (ogr/data/arrow/
from_paleolimbot_geoarrow, ogr/data/csv)."""

import numpy as np
import pyarrow as pa

from lib_gdal_ray.geom.wkt import wkb_to_wkt

ARROW = "/root/reference/autotest/ogr/data/arrow"
CSV = "/root/reference/autotest/ogr/data/csv"


class TestArrowIPC:
    D = f"{ARROW}/from_paleolimbot_geoarrow"

    def test_wkb_wkt_native_point(self):
        from lib_gdal_ray.sources.arrow_ipc import read_arrow_table

        for variant in ("wkb", "wkt", "default"):
            t = read_arrow_table(f"{self.D}/point-{variant}.feather")
            geoms = [g for g in t.column("geometry").to_pylist() if g]
            assert wkb_to_wkt(geoms[0]) == "POINT (30 10)", variant
            assert t.schema.field("geometry").type == pa.binary()

    def test_geometry_families(self):
        from lib_gdal_ray.sources.arrow_ipc import read_arrow_table

        expect = {
            "linestring-wkb": "LINESTRING (30 10, 10 30, 40 40)",
            "polygon-wkb":
                "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
            "multipoint-wkt": "MULTIPOINT ((30 10))",
        }
        for name, wkt in expect.items():
            t = read_arrow_table(f"{self.D}/{name}.feather")
            g = next(v for v in t.column("geometry").to_pylist() if v)
            assert wkb_to_wkt(g) == wkt, name

    def test_point_z(self):
        from lib_gdal_ray.sources.arrow_ipc import read_arrow_table

        t = read_arrow_table(f"{self.D}/point_z-wkb.feather")
        g = next(v for v in t.column("geometry").to_pylist() if v)
        assert wkb_to_wkt(g).startswith("POINT Z")

    def test_roundtrip(self, tmp_path, ray_session):
        import ray

        from lib_gdal_ray.sources.arrow_ipc import (read_arrow_ipc,
                                                    write_arrow_ipc)

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                      "s": pa.array(["x", "y", "z"])})
        ds = ray.data.from_arrow(t)
        p = str(tmp_path / "out.feather")
        assert write_arrow_ipc(ds, p) == 3
        back = read_arrow_ipc(p)
        assert sorted(back.to_pandas()["a"].tolist()) == [1, 2, 3]
        # stream flavor
        p2 = str(tmp_path / "out.arrows")
        write_arrow_ipc(ds, p2)
        assert read_arrow_ipc(p2).count() == 3


class TestCSVPoints:
    def test_csvt_types(self, ray_session):
        from lib_gdal_ray.sources.vector_formats import read_csv_points

        ds = read_csv_points(f"{CSV}/testcsvt.csv")
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        # .csvt declares Integer/Real/String triplets twice + temporal
        assert types["INTCOL"] == pa.int64()
        assert types["REALCOL"] == pa.float64()
        assert types["STRINGCOL"] == pa.string()
        t = ds.to_pandas()
        assert t["STRINGCOL"].iloc[0] == "foo"
        assert t["INTCOL"].iloc[0] == 12
        assert t["REALCOL"].iloc[0] == 5.7

    def test_xy_points(self, tmp_path, ray_session):
        from lib_gdal_ray.sources.vector_formats import read_csv_points

        p = tmp_path / "pts.csv"
        p.write_text("id,lon,lat,name\n1,10.5,45.25,a\n2,-120,33,b\n")
        df = read_csv_points(str(p)).to_pandas()
        assert wkb_to_wkt(df["geometry"].iloc[0]) == "POINT (10.5 45.25)"
        assert wkb_to_wkt(df["geometry"].iloc[1]) == "POINT (-120 33)"
        assert df["name"].tolist() == ["a", "b"]

    def test_read_vector_dispatch(self, tmp_path, ray_session):
        from lib_gdal_ray.sources.vrt_vector import read_vector

        p = tmp_path / "pts.csv"
        p.write_text("x,y,v\n1,2,3\n4,5,6\n")
        df = read_vector(str(p)).to_pandas()
        assert "geometry" in df.columns
        assert wkb_to_wkt(df["geometry"].iloc[0]) == "POINT (1 2)"
        # arrow dispatch
        import pyarrow.feather as feather

        fp = str(tmp_path / "t.feather")
        feather.write_feather(pa.table({"q": [7, 8]}), fp)
        assert read_vector(fp).count() == 2


class TestBareDBF:
    def test_flat_dbf(self, ray_session):
        from lib_gdal_ray.sources.shapefile import read_dbf_table
        from lib_gdal_ray.sources.vrt_vector import read_vector

        # the reference's flat.dbf (fed to VRT PointFromColumns)
        t = read_dbf_table(
            "/root/reference/autotest/ogr/data/flat.dbf")
        rows = t.to_pylist()
        assert rows[0] == {"fid": 1, "other": "First", "x": 12.5,
                           "y": 17.0, "z": 1.2,
                           "wkt": "POINT(12.5 17 1.2)"}
        assert read_vector(
            "/root/reference/autotest/ogr/data/idlink.dbf").count() == 7
