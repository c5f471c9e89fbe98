"""ESRIJSON / GeoRSS / JML / AVCE00 / IDF / Idrisi-VCT vector drivers,
pinned to the reference's own autotest fixtures
(autotest/ogr/{ogr_esrijson,ogr_georss,ogr_jml,ogr_avc,ogr_vdv,
ogr_idrisi}.py expectations)."""

import numpy as np
import pytest

from lib_gdal_ray.geom.wkt import wkb_to_wkt

DATA = "/root/reference/autotest/ogr/data"


class TestEsriJson:
    D = f"{DATA}/esrijson"

    def test_point_typed_fields(self):
        from lib_gdal_ray.sources.esrijson import read_esrijson

        t = read_esrijson(f"{self.D}/esripoint.json")
        r = t.to_pylist()[0]
        assert wkb_to_wkt(r["geometry"]) == "POINT (2 49)"
        assert r["fid"] == 1
        assert r["fooSmallInt"] == 2
        assert r["fooInt"] == 1234567890
        assert r["fooSingle"] == 1.5
        assert r["fooDouble"] == 3.4
        assert r["fooString"] == "56"
        assert r["fooDate"] == "2021/12/31 00:00:00+00"
        assert r["fooDateOnly"] == "2025/09/20"
        assert r["fooTimeOnly"] == "12:34:56"
        assert r["fooBigInteger"] == 1234567890123456
        assert r["fooGlobalID"] == \
            "{FD04C39C-69C6-4DCC-88D6-7E3E673DD0CB}"
        assert t.schema.metadata[b"esrijson_wkid"] == b"4326"

    def test_geometries(self):
        from lib_gdal_ray.sources.esrijson import read_esrijson

        g = read_esrijson(
            f"{self.D}/esripolygon.json").to_pylist()[0]["geometry"]
        w = wkb_to_wkt(g)
        # rings organized by containment: hole in poly 1, 2nd outer
        assert w.startswith("MULTIPOLYGON (((2 49, 2 50, 3 50, 3 49, "
                            "2 49), (2.1 49.1,")
        assert "(-2 49" in w
        assert wkb_to_wkt(read_esrijson(
            f"{self.D}/esripolygonempty.json").to_pylist()[0]
            ["geometry"]) == "POLYGON EMPTY"
        assert wkb_to_wkt(read_esrijson(
            f"{self.D}/esrilinestring.json").to_pylist()[0]
            ["geometry"]) == "LINESTRING (2 49, 3 50)"
        assert wkb_to_wkt(read_esrijson(
            f"{self.D}/esrimultipoint.json").to_pylist()[0]
            ["geometry"]) == "MULTIPOINT ((2 49), (3 50))"
        assert wkb_to_wkt(read_esrijson(
            f"{self.D}/esrizpoint.json").to_pylist()[0]
            ["geometry"]) == "POINT Z (2 49 1)"
        # bare features array (no header)
        assert wkb_to_wkt(read_esrijson(
            f"{self.D}/esrijsonstartingwithfeaturesgeometry.json")
            .to_pylist()[0]["geometry"]).startswith("POLYGON ((2 49")


class TestGeoRSS:
    D = f"{DATA}/georss"

    def test_rss_simple(self):
        from lib_gdal_ray.sources.georss import read_georss

        rows = read_georss(f"{self.D}/test_georss_simple.xml").to_pylist()
        assert [r["title"] for r in rows] == \
            ["A point", "A line", "A polygon", "A box"]
        assert wkb_to_wkt(rows[0]["geometry"]) == "POINT (2 49)"
        assert wkb_to_wkt(rows[1]["geometry"]) == \
            "LINESTRING (2 48, 2.1 48.1, 2.2 48)"
        assert wkb_to_wkt(rows[2]["geometry"]) == \
            "POLYGON ((2 50, 2.1 50.1, 2.2 48.1, 2.1 46.1, 2 50))"
        assert wkb_to_wkt(rows[3]["geometry"]) == \
            "POLYGON ((2 49, 2 49.5, 2.2 49.5, 2.2 49, 2 49))"
        assert rows[0]["pubDate"] == "2008/12/07 20:13:00+02"
        assert rows[0]["category"] == "First category"
        assert rows[0]["category_domain"] == "first_domain"
        assert rows[0]["category2"] == "Second category"

    def test_rss_gml(self):
        from lib_gdal_ray.sources.georss import read_georss

        rows = read_georss(f"{self.D}/test_georss_gml.xml").to_pylist()
        assert wkb_to_wkt(rows[0]["geometry"]) == "POINT (2 49)"
        assert wkb_to_wkt(rows[3]["geometry"]) == \
            "POLYGON ((2 49, 2 49.5, 2.2 49.5, 2.2 49, 2 49))"

    @pytest.mark.parametrize("name", ["atom_rfc_sample.xml",
                                      "atom_rfc_sample_atom_ns.xml"])
    def test_atom(self, name):
        from lib_gdal_ray.sources.georss import read_georss

        r = read_georss(f"{self.D}/{name}").to_pylist()[0]
        # the reference's atom_field_values list, verbatim
        expect = {
            "title": "Atom draft-07 snapshot",
            "link_rel": "alternate", "link_type": "text/html",
            "link_href": "http://example.org/2005/04/02/atom",
            "link2_rel": "enclosure", "link2_type": "audio/mpeg",
            "link2_length": "1337",
            "link2_href":
                "http://example.org/audio/ph34r_my_podcast.mp3",
            "id": "tag:example.org,2003:3.2397",
            "updated": "2005/07/31 12:29:29+00",
            "published": "2003/12/13 08:29:29-04",
            "author_name": "Mark Pilgrim",
            "author_uri": "http://example.org/",
            "author_email": "f8dy@example.com",
            "contributor_name": "Sam Ruby",
            "contributor2_name": "Joe Gregorio",
            "content_type": "xhtml", "content_xml_lang": "en",
            "content_xml_base": "http://diveintomark.org/",
        }
        for k, v in expect.items():
            assert r.get(k) == v, (k, r.get(k))
        assert '<div xmlns="http://www.w3.org/1999/xhtml">' in \
            r["content"]

    def test_write_roundtrip(self, tmp_path):
        from lib_gdal_ray.sources.georss import read_georss, write_georss

        t = read_georss(f"{self.D}/test_georss_simple.xml")
        p = str(tmp_path / "out.xml")
        write_georss(t, p)
        t2 = read_georss(p)
        assert t2.column("title").to_pylist() == \
            t.column("title").to_pylist()
        assert [wkb_to_wkt(g) for g in
                t2.column("geometry").to_pylist()] == \
            [wkb_to_wkt(g) for g in t.column("geometry").to_pylist()]


class TestJML:
    D = f"{DATA}/jml"

    def test_read(self):
        from lib_gdal_ray.sources.jml import read_jml

        t = read_jml(f"{self.D}/test.jml")
        # the reference's exact declared-column list (ignored ones out)
        assert [c for c in t.column_names
                if c not in ("_style", "geometry")] == [
            "first_property", "another_property", "objectAttr",
            "attr2", "attr3", "int", "double", "date", "datetime",
            "R_G_B", "not_ignored"]
        rows = t.to_pylist()
        r = rows[0]
        assert r["first_property"] == "even"
        assert r["another_property"] == "rouault"
        assert r["objectAttr"] == "foo"
        assert r["attr2"] == "bar" and r["attr3"] == "baz"
        assert r["int"] == 123 and r["double"] == 1.23
        assert r["date"] == "2014/10/18 00:00:00"
        assert r["datetime"] == "2014/10/18 21:36:45"
        assert r["not_ignored"] is None
        assert r["_style"] == "BRUSH(fc:#0000FF)"
        assert wkb_to_wkt(r["geometry"]) == \
            "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
        assert rows[1]["datetime"] == "2014/10/18 21:36:45+02"
        assert rows[1]["_style"] == "PEN(c:#FF00FF)"
        assert wkb_to_wkt(rows[1]["geometry"]) == "POINT (-1 -1)"
        assert rows[2]["geometry"] is None

    def test_write_roundtrip(self, tmp_path):
        from lib_gdal_ray.sources.jml import read_jml, write_jml

        t = read_jml(f"{self.D}/test.jml")
        p = str(tmp_path / "out.jml")
        write_jml(t, p)
        t2 = read_jml(p)
        assert t2.column("int").to_pylist() == \
            t.column("int").to_pylist()
        assert t2.column("first_property").to_pylist() == \
            t.column("first_property").to_pylist()


class TestAVCE00:
    D = f"{DATA}/avc"

    def test_line_coverage(self):
        from lib_gdal_ray.sources.avce00 import read_e00

        layers = read_e00(f"{self.D}/test.e00")
        arc = layers["ARC"]
        assert arc.column("UserId").to_pylist() == [1, 2, 3, 4, 5, 6, 7]
        pts = np.array([[340099.875, 4100200.0], [340400.0625, 4100399.5],
                        [340900.125, 4100200.0], [340700.03125, 4100199.5]])
        from lib_gdal_ray.geom.wkb import parse_wkb

        kind, payload = parse_wkb(arc.column("geometry").to_pylist()[0])
        assert kind == "linestring"
        np.testing.assert_allclose(payload, pts, atol=0.01)
        assert layers["ARC"].schema.metadata[b"e00_prj_Projection"] == \
            b"UTM"

    def test_compressed_rejected_with_guidance(self):
        # ogr_avc.py:77-83 — the reference driver REJECTS compressed
        # E00 (open fails); same contract, same e00conv guidance
        import pytest as _pytest

        from lib_gdal_ray.sources.avce00 import read_e00

        with _pytest.raises(ValueError, match="compressed E00.*e00conv"):
            read_e00(f"{self.D}/compressed.e00")

    def test_point_coverage(self):
        from lib_gdal_ray.sources.avce00 import read_e00

        lab = read_e00(f"{self.D}/testpoint.e00")["LAB"]
        assert lab.num_rows == 80
        attr_cols = [c for c in lab.column_names
                     if c not in ("fid", "geometry")]
        assert len(attr_cols) == 7  # ValueId/PolyId + 5 PAT columns
        last = lab.to_pylist()[-1]
        assert last["ValueId"] == 80 and last["WELLS-ID"] == 80

    def test_poly_coverage(self):
        from lib_gdal_ray.sources.avce00 import read_e00

        pal = read_e00(f"{self.D}/testpoly.e00")["PAL"]
        assert pal.num_rows == 3  # universe polygon skipped
        last = pal.to_pylist()[-1]
        assert last["ArcIds"] == [-4, -5]
        assert last["AREA"] == pytest.approx(9939.059, abs=1e-3)
        w = wkb_to_wkt(last["geometry"])
        assert w == ("POLYGON ((340700.03125 4100199.5, 340500 "
                     "4100199.75, 340599.96875 4100100.25, "
                     "340700.03125 4100199.5))")

    def test_compressed_rejected(self):
        from lib_gdal_ray.sources.avce00 import read_e00

        with pytest.raises(ValueError):
            read_e00(f"{self.D}/compressed.e00")


class TestIDF:
    D = f"{DATA}/vdv"

    def test_idf(self):
        from lib_gdal_ray.sources.idf import read_idf

        layers = read_idf(f"{self.D}/test.idf")
        n = layers["Node"].to_pylist()[0]
        assert n["NODE_ID"] == 1 and n["foo"] == "U"
        assert wkb_to_wkt(n["geometry"]) == "POINT (2 49)"
        lk = layers["Link"].to_pylist()[0]
        assert wkb_to_wkt(lk["geometry"]) == \
            "LINESTRING (2 49, 2.5 49.5, 2.7 49.7, 3 50)"
        lc = layers["LinkCoordinate"].to_pylist()[0]
        assert wkb_to_wkt(lc["geometry"]) == "POINT (2.5 49.5)"
        assert layers["Other"].to_pylist()[0]["FOO"] == 1

    def test_idf_3d(self):
        from lib_gdal_ray.sources.idf import read_idf

        layers = read_idf(f"{self.D}/test_3d.idf")
        n = layers["Node"].to_pylist()[0]
        assert n["NODE_ID"] == 1 and n["foo"] == "U"
        assert wkb_to_wkt(n["geometry"]) == "POINT Z (2 49 10)"


class TestIdrisiVCT:
    D = f"{DATA}/idrisi"

    def test_points(self):
        from lib_gdal_ray.sources.idrisi_vct import read_idrisi_vct

        t = read_idrisi_vct(f"{self.D}/points.vct")
        assert t.num_rows == 2
        r = t.to_pylist()[0]
        assert r["id"] == 1.0
        assert r["IntegerField"] == 2
        assert r["RealField"] == 3.45
        assert r["StringField"] == "foo"
        assert wkb_to_wkt(r["geometry"]) == "POINT (400000 5000000)"

    def test_lines_and_polygons(self):
        from lib_gdal_ray.sources.idrisi_vct import read_idrisi_vct

        t = read_idrisi_vct(f"{self.D}/lines.vct")
        assert t.column("id").to_pylist() == [10.0, 20.0]
        assert wkb_to_wkt(t.to_pylist()[0]["geometry"]) == \
            "LINESTRING (400000 5000000, 600000 4500000)"
        t = read_idrisi_vct(f"{self.D}/polygons.vct")
        w = wkb_to_wkt(t.to_pylist()[0]["geometry"])
        assert w.startswith("POLYGON ((400000 4000000, 400000 5000000")
        assert "), (" in w  # interior ring present


def test_read_vector_dispatch(ray_session):
    import ray

    from lib_gdal_ray.sources.vrt_vector import read_vector

    ds = read_vector(f"{DATA}/jml/test.jml")
    assert ds.count() == 3
    ds = read_vector(f"{DATA}/avc/test.e00")
    assert ds.count() == 7
    ds = read_vector(f"{DATA}/vdv/test.idf")
    assert ds.count() == 2
    ds = read_vector(f"{DATA}/idrisi/points.vct")
    assert ds.count() == 2
    ds = read_vector(f"{DATA}/esrijson/esripoint.json")
    assert ds.count() == 1
    assert isinstance(ds, ray.data.Dataset)
