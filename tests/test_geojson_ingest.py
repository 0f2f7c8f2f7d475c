"""GeoJSON sink/source round-trip (S6) + ingest format gate (S15)."""

import json
import os

import numpy as np
import pandas as pd

from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.codecs.image import encode_image
from geospatial_studio_pipelines_spark.geo import wkb
from geospatial_studio_pipelines_spark.sources import geojson


def test_geojsonl_roundtrip(spark, tmp_path):
    aois = datagen.aoi_pdf(12)
    df = spark.createDataFrame(aois[["aoi_id", "geom_wkb"]])
    path = str(tmp_path / "aois_geojsonl")
    geojson.write_geojsonl(df, path, props=("aoi_id",))
    back = geojson.read_geojsonl(spark, path, "aoi_id string").toPandas()
    assert len(back) == 12
    orig = aois.set_index("aoi_id")
    got = back.set_index("aoi_id")
    for aid in orig.index:
        r0 = wkb.polygon_rings(bytes(orig.loc[aid, "geom_wkb"]))
        r1 = wkb.polygon_rings(bytes(got.loc[aid, "geom_wkb"]))
        assert len(r0) == len(r1)
        for a, b in zip(r0, r1):
            assert np.allclose(a, b)
    # bbox columns restored from geometry
    assert np.allclose(got.loc["aoi-0003", ["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=float),
                       orig.loc["aoi-0003", ["bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"]].to_numpy(dtype=float))
    # every line is valid standalone GeoJSON (GeoJSONSeq contract)
    part = [f for f in os.listdir(path) if f.startswith("part-")][0]
    with open(os.path.join(path, part)) as fh:
        for line in fh:
            feat = json.loads(line)
            assert feat["type"] == "Feature" and feat["geometry"]["type"] == "Polygon"


def test_feature_collection_driver_side(spark):
    aois = datagen.aoi_pdf(3)
    df = spark.createDataFrame(aois[["aoi_id", "geom_wkb"]])
    fc = geojson.to_feature_collection(df, props=("aoi_id",))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 3


def test_ingest_validation_gate(spark):
    good = datagen.fixture_pixels(1, 8, 6)
    rows = [
        {"image_id": "good", "bytes": encode_image(good, "png"), "w": 8, "h": 6},
        {"image_id": "truncated", "bytes": encode_image(good, "png")[:20], "w": 8, "h": 6},
        {"image_id": "wrong_dims", "bytes": encode_image(good, "png"), "w": 9, "h": 6},
        {"image_id": "garbage", "bytes": b"\x00\x01\x02", "w": 8, "h": 6},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    ok, bad = geojson.quarantine_invalid(df)
    assert [r.image_id for r in ok.collect()] == ["good"]
    reasons = {r.image_id: r.reason for r in bad.collect()}
    assert set(reasons) == {"truncated", "wrong_dims", "garbage"}
    assert "dimension mismatch" in reasons["wrong_dims"]


def test_unpack_archives(spark):
    import io
    import tarfile
    import zipfile

    import pandas as pd

    from geospatial_studio_pipelines_spark.sources import archive

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a/x.tif", b"xx1")
        zf.writestr("b/y.tif", b"yy22")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        data = b"zzz333"
        info = tarfile.TarInfo("c/z.tif")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "archive_name": ["one.zip", "two.tar.gz"],
                "archive_bytes": [zbuf.getvalue(), tbuf.getvalue()],
            }
        )
    )
    out = {(r.archive_name, r.member_path): (bytes(r.member_bytes), r.member_size)
           for r in archive.unpack_archives(df).collect()}
    assert out[("one.zip", "a/x.tif")] == (b"xx1", 3)
    assert out[("one.zip", "b/y.tif")] == (b"yy22", 4)
    assert out[("two.tar.gz", "c/z.tif")] == (b"zzz333", 6)


def test_write_zip_roundtrip(spark, tmp_path):
    import zipfile

    import pandas as pd

    from geospatial_studio_pipelines_spark.sources import archive

    df = spark.createDataFrame(
        pd.DataFrame({"name": ["p1.bin", "p2.bin"], "bytes": [b"abc", b"defg"]})
    )
    path = str(tmp_path / "artifacts.zip")
    assert archive.write_zip(df, path) == 2
    with zipfile.ZipFile(path) as zf:
        assert zf.read("p1.bin") == b"abc" and zf.read("p2.bin") == b"defg"


def test_chip_and_label(spark):
    import numpy as np

    from geospatial_studio_pipelines_spark import datagen
    from geospatial_studio_pipelines_spark.codecs.image import decode_image
    from geospatial_studio_pipelines_spark.operators import raster, tiling

    n = 40  # labels exist for every 10th image; image 30 (224x512) amplifies
    images = datagen.images_df(spark, n)
    labels = datagen.label_df(spark, n)
    chips = tiling.chip_and_label(images, labels).collect()
    img_pdf = {r["image_id"]: r for r in datagen.images_df(spark, n).collect()}
    lab_pdf = {r["image_id"]: r for r in datagen.label_df(spark, n).collect()}
    expected = sum(
        len(tiling.window_offsets_oracle(img_pdf[iid]["w"]))
        * len(tiling.window_offsets_oracle(img_pdf[iid]["h"]))
        for iid in lab_pdf
    )
    assert len(chips) == expected and expected > len(lab_pdf)  # windows amplify
    for r in chips[:12]:
        img = decode_image(bytes(img_pdf[r.image_id]["bytes"]))
        lab = decode_image(bytes(lab_pdf[r.image_id]["label_bytes"]))
        exp_img = raster.crop_window(img, r.win_col_off, r.win_row_off, r.win_w, r.win_h)
        exp_lab = raster.crop_window(lab, r.win_col_off, r.win_row_off, r.win_w, r.win_h)
        assert np.array_equal(decode_image(bytes(r.chip_bytes)), exp_img)
        assert np.array_equal(decode_image(bytes(r.chip_label_bytes)), exp_lab)
    # chip grid covers every pixel of each image exactly like with_windows
    per_img = {}
    for r in chips:
        per_img.setdefault(r.image_id, []).append(r)
    for iid, rs in per_img.items():
        w, h = img_pdf[iid]["w"], img_pdf[iid]["h"]
        cov = np.zeros((h, w), dtype=bool)
        for r in rs:
            cov[r.win_row_off : r.win_row_off + r.win_h, r.win_col_off : r.win_col_off + r.win_w] = True
        assert cov.all()
