"""Shapefile source: round-trip against a hand-built fixture (S7 breadth)."""

import numpy as np
import pandas as pd
import pytest

from geospatial_studio_pipelines_spark.geo import wkb as W
from geospatial_studio_pipelines_spark.sources import shapefile as SHP


def _fixture_pdf():
    sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])
    hole = np.array([[0.5, 0.5], [1.0, 0.5], [1.0, 1.0], [0.5, 1.0], [0.5, 0.5]])
    tri = np.array([[10.0, 10.0], [12.0, 10.0], [11.0, 12.5], [10.0, 10.0]])
    return pd.DataFrame(
        {
            "geom_wkb": [W.dumps_polygon([sq, hole]), W.dumps_polygon([tri])],
            "name": ["square", "triangle"],
            "code": [7, 42],
            "score": [0.25, 1.5],
        }
    )


def test_shapefile_roundtrip(spark, tmp_path):
    pdf = _fixture_pdf()
    stem = str(tmp_path / "layer")
    SHP.write_shapefile(pdf, stem)
    got = SHP.read_shapefile(spark, stem + ".shp").orderBy("minx").collect()
    assert len(got) == 2
    sq_row, tri_row = got
    # geometry: rings byte-identical through WKB
    for row, src in ((sq_row, pdf.geom_wkb[0]), (tri_row, pdf.geom_wkb[1])):
        got_rings = W.polygon_rings(bytes(row.geom_wkb))
        exp_rings = W.polygon_rings(bytes(src))
        assert len(got_rings) == len(exp_rings)
        for g, e in zip(got_rings, exp_rings):
            assert np.array_equal(g, e)
    # flat bbox columns (the prunable-scan contract shared with read_geojsonl)
    assert (sq_row.minx, sq_row.miny, sq_row.maxx, sq_row.maxy) == (0.0, 0.0, 2.0, 2.0)
    assert (tri_row.minx, tri_row.maxy) == (10.0, 12.5)
    # dbf attributes with derived schema: C→string, N(dec=0)→long, N→double
    assert (sq_row.name, sq_row.code, sq_row.score) == ("square", 7, 0.25)
    assert (tri_row.name, tri_row.code, tri_row.score) == ("triangle", 42, 1.5)


def test_shapefile_explicit_schema_and_dir(spark, tmp_path):
    pdf = _fixture_pdf()
    SHP.write_shapefile(pdf, str(tmp_path / "a"))
    SHP.write_shapefile(pdf, str(tmp_path / "b"))
    got = SHP.read_shapefile(spark, str(tmp_path), attrs_schema="name string, code long")
    rows = got.collect()
    assert len(rows) == 4  # two files scanned in one relation
    assert {r.name for r in rows} == {"square", "triangle"}
    assert {r.code for r in rows} == {7, 42}


def test_shapefile_feeds_spatial_join(spark, tmp_path):
    """The reader's output IS the engine's AOI shape: rename + join."""
    import pyspark.sql.functions as F

    from geospatial_studio_pipelines_spark.operators import spatial_join

    pdf = _fixture_pdf()
    stem = str(tmp_path / "aois")
    SHP.write_shapefile(pdf, stem)
    layer = SHP.read_shapefile(spark, stem + ".shp").toPandas()
    aoi_pdf = pd.DataFrame(
        {
            "aoi_id": layer["name"],
            "geom_wkb": layer["geom_wkb"],
            "bbox_minx": layer["minx"], "bbox_miny": layer["miny"],
            "bbox_maxx": layer["maxx"], "bbox_maxy": layer["maxy"],
        }
    )
    images = spark.createDataFrame(
        [("in-square", 1.2, 1.2, 1.4, 1.4), ("in-tri", 10.8, 10.2, 11.2, 10.6),
         ("in-hole", 0.6, 0.6, 0.9, 0.9), ("nowhere", 50.0, 50.0, 51.0, 51.0)],
        "image_id string, minx double, miny double, maxx double, maxy double",
    )
    got = {(r.image_id, r.aoi_id)
           for r in spatial_join.broadcast_spatial_join(images, aoi_pdf).collect()}
    # in-hole still intersects the square polygon's boundary ring bbox-wise?
    # no: the hole is interior — bbox [0.6,0.9]^2 sits inside the hole, so
    # the exact kernel must reject it.
    assert got == {("in-square", "square"), ("in-tri", "triangle")}


def test_parse_shp_rejects_garbage():
    with pytest.raises(ValueError, match="bad file code"):
        SHP.parse_shp(b"\x00" * 200)


def test_point_shapefile_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "geom_wkb": [W.dumps_point(1.5, 2.5), W.dumps_point(-3.0, 4.0)],
            "name": ["a", "b"],
        }
    )
    stem = str(tmp_path / "pts")
    SHP.write_shapefile(pdf, stem)
    got = SHP.read_shapefile(spark, stem + ".shp").orderBy("minx").collect()
    assert len(got) == 2
    gt, xy = W.loads(bytes(got[0].geom_wkb))
    assert gt == W.POINT and xy == (-3.0, 4.0)
    assert (got[0].minx, got[0].miny, got[0].maxx, got[0].maxy) == (-3.0, 4.0, -3.0, 4.0)
    assert [r.name for r in got] == ["b", "a"]


def test_polyline_shapefile_roundtrip_single_and_multipart(spark, tmp_path):
    seg1 = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    seg2 = np.array([[5.0, 5.0], [6.0, 7.0]])
    pdf = pd.DataFrame(
        {
            "geom_wkb": [W.dumps_linestring(seg1), W.dumps_multilinestring([seg1, seg2])],
            "name": ["line", "multi"],
        }
    )
    stem = str(tmp_path / "lines")
    SHP.write_shapefile(pdf, stem)
    got = {r.name: r for r in SHP.read_shapefile(spark, stem + ".shp").collect()}
    gt, pts = W.loads(bytes(got["line"].geom_wkb))
    assert gt == W.LINESTRING and np.allclose(pts, seg1)
    gt, parts = W.loads(bytes(got["multi"].geom_wkb))
    assert gt == W.MULTILINESTRING and len(parts) == 2
    assert np.allclose(parts[0], seg1) and np.allclose(parts[1], seg2)
    assert (got["multi"].maxx, got["multi"].maxy) == (6.0, 7.0)


def test_null_record_does_not_shift_attributes(spark, tmp_path):
    """r3 ADVICE (medium): a Null shape mid-file must not assign every later
    record the previous record's attributes."""
    tri = np.array([[10.0, 10.0], [12.0, 10.0], [11.0, 12.5], [10.0, 10.0]])
    sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])
    pdf = pd.DataFrame(
        {
            "geom_wkb": [W.dumps_polygon([tri]), None, W.dumps_polygon([sq])],
            "name": ["first", "nullrec", "third"],
        }
    )
    stem = str(tmp_path / "withnull")
    SHP.write_shapefile(pdf, stem)
    got = {r.name: r for r in SHP.read_shapefile(spark, stem + ".shp").collect()}
    # Null record itself is dropped from output; attrs stay aligned
    assert set(got) == {"first", "third"}
    assert got["third"].minx == 0.0 and got["first"].minx == 10.0


def test_deleted_dbf_row_does_not_shift_attributes(spark, tmp_path):
    """A deleted-flag .dbf row paired with a Null .shp record keeps later
    records aligned (deleted rows are placeholders, not skipped)."""
    tri = np.array([[10.0, 10.0], [12.0, 10.0], [11.0, 12.5], [10.0, 10.0]])
    pdf = pd.DataFrame(
        {
            "geom_wkb": [W.dumps_point(0.0, 0.0), None, W.dumps_polygon([tri])],
            "name": ["first", "gone", "third"],
        }
    )
    # point + polygon can't share a file: use point, null, point instead
    pdf["geom_wkb"] = [W.dumps_point(0.0, 0.0), None, W.dumps_point(9.0, 9.0)]
    stem = str(tmp_path / "deleted")
    SHP.write_shapefile(pdf, stem)
    # flip record 1's deletion flag in the .dbf (fixed-width records)
    buf = bytearray(open(stem + ".dbf", "rb").read())
    import struct as _s

    hdr_size, rec_size = _s.unpack("<HH", buf[8:12])
    buf[hdr_size + rec_size] = ord("*")
    open(stem + ".dbf", "wb").write(bytes(buf))
    got = {r.name: r for r in SHP.read_shapefile(spark, stem + ".shp").collect()}
    assert set(got) == {"first", "third"}
    assert got["third"].minx == 9.0


def test_record_count_mismatch_fails_loudly(spark, tmp_path):
    pdf = pd.DataFrame(
        {"geom_wkb": [W.dumps_point(0.0, 0.0), W.dumps_point(1.0, 1.0)], "name": ["a", "b"]}
    )
    stem = str(tmp_path / "mismatch")
    SHP.write_shapefile(pdf, stem)
    # truncate the .dbf to one record: positional zip would silently misalign
    buf = bytearray(open(stem + ".dbf", "rb").read())
    import struct as _s

    hdr_size, rec_size = _s.unpack("<HH", buf[8:12])
    buf[4:8] = _s.pack("<I", 1)
    open(stem + ".dbf", "wb").write(bytes(buf[: hdr_size + rec_size]) + b"\x1a")
    with pytest.raises(Exception, match="record-count mismatch"):
        SHP.read_shapefile(spark, stem + ".shp").collect()


def test_shapefile_zip_completeness_gate(tmp_path):
    """The reference's upload gate (user_store_download_operations.py:68-72):
    .shp/.shx/.dbf must all be present per stem."""
    ok, missing = SHP.shapefile_zip_complete(["a.shp", "a.shx", "a.dbf", "readme.txt"])
    assert ok and not missing
    ok, missing = SHP.shapefile_zip_complete(["a.shp", "a.dbf"])
    assert not ok and missing == {"a": [".shx"]}
    ok, missing = SHP.shapefile_zip_complete(["b.txt"])
    assert not ok  # no .shp at all is not a shapefile upload
    # the engine's own writer output passes the gate
    pdf = pd.DataFrame({"geom_wkb": [W.dumps_point(0.0, 0.0)], "name": ["a"]})
    SHP.write_shapefile(pdf, str(tmp_path / "w"))
    names = [p.name for p in tmp_path.iterdir()]
    ok, missing = SHP.shapefile_zip_complete(names)
    assert ok, (names, missing)


def test_mixed_shape_types_rejected(tmp_path):
    tri = np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0], [0.0, 0.0]])
    pdf = pd.DataFrame(
        {"geom_wkb": [W.dumps_point(0.0, 0.0), W.dumps_polygon([tri])], "name": ["p", "g"]}
    )
    with pytest.raises(ValueError, match="mixed shape types"):
        SHP.write_shapefile(pdf, str(tmp_path / "mixed"))


def test_bare_glob_rejected(spark, tmp_path):
    pdf = _fixture_pdf()
    SHP.write_shapefile(pdf, str(tmp_path / "tile_a"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must end with '.shp'"):
        SHP.read_shapefile(spark, str(tmp_path / "tile*"))


def test_missing_dbf_yields_null_attrs_with_explicit_schema(spark, tmp_path):
    """PATH_NOT_FOUND on the .dbf side (no .dbf anywhere) falls back to
    all-null attributes — and ONLY that error class is swallowed."""
    pdf = _fixture_pdf()
    SHP.write_shapefile(pdf, str(tmp_path / "layer"))
    import os as _os

    _os.remove(str(tmp_path / "layer.dbf"))
    got = SHP.read_shapefile(
        spark, str(tmp_path / "layer.shp"), attrs_schema="name string, code long"
    ).collect()
    assert len(got) == 2
    assert all(r.name is None and r.code is None for r in got)
