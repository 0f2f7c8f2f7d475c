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
