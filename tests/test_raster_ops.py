"""Raster operators: decibels, scaling, impute, resize, pseudo-inference,
mosaic aggs, masking chain, overlap-average — vs numpy oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.codecs.image import decode_image, encode_image, psnr
from geospatial_studio_pipelines_spark.operators import masking, mosaic, raster


def test_impute_nans_array():
    arr = np.full((8, 8, 1), 5.0, dtype=np.float32)
    arr[2, 2, 0] = raster.NODATA
    arr[7, 7, 0] = np.float32(np.finfo(np.float32).max)
    out = raster.impute_nans_array(arr)
    assert out[2, 2, 0] == 5.0 and out[7, 7, 0] == 5.0
    with pytest.raises(ValueError):
        raster.impute_nans_array(np.full((4, 4, 1), raster.NODATA, dtype=np.float32))


def test_resize_identity_and_downscale():
    arr = datagen.fixture_pixels(7, 16, 12).astype(np.float32)
    assert np.array_equal(raster.resize_array(arr, 12, 16, "nearest"), arr)
    down = raster.resize_array(arr, 6, 8, "nearest")
    assert down.shape == (6, 8, 3)
    bi = raster.resize_array(arr, 24, 32, "bilinear")
    assert bi.shape == (24, 32, 3)
    assert abs(float(bi.mean()) - float(arr.mean())) < 2.0


def test_mosaic_reduce_methods():
    t = np.array(
        [
            [[[1.0], [np.nan]], [[3.0], [4.0]]],
            [[[5.0], [6.0]], [[np.nan], [8.0]]],
            [[[9.0], [10.0]], [[11.0], [np.nan]]],
        ]
    )  # (3 tiles, 2, 2, 1)
    assert np.allclose(mosaic.mosaic_reduce(t, "average")[:, :, 0], [[5, 8], [7, 6]])
    assert np.allclose(mosaic.mosaic_reduce(t, "min")[:, :, 0], [[1, 6], [3, 4]])
    assert np.allclose(mosaic.mosaic_reduce(t, "max")[:, :, 0], [[9, 10], [11, 8]])
    assert np.allclose(mosaic.mosaic_reduce(t, "median")[:, :, 0], [[5, 8], [7, 6]])
    assert np.allclose(mosaic.mosaic_reduce(t, "first")[:, :, 0], [[1, 6], [3, 4]])
    assert np.allclose(mosaic.mosaic_reduce(t, "last")[:, :, 0], [[9, 10], [11, 8]])
    allnan = np.full((2, 1, 1, 1), np.nan)
    assert mosaic.mosaic_reduce(allnan, "first")[0, 0, 0] == mosaic.NODATA


def test_mosaic_spark_group(spark):
    rows = []
    for iid, vals in [("a", [[1, 2], [3, 4]]), ("b", [[5, 6], [7, 8]])]:
        arr = np.asarray(vals, dtype=np.float32)[:, :, None]
        rows.append(("cellX", iid, encode_image(arr, "raw")))
    df = spark.createDataFrame(rows, "cell string, image_id string, bytes binary")
    out = mosaic.mosaic(df, ["cell"], "average").collect()
    assert len(out) == 1 and out[0]["n_tiles"] == 2
    got = decode_image(bytes(out[0]["mosaic_bytes"]))[:, :, 0]
    assert np.allclose(got, [[3, 4], [5, 6]])


def test_masking_chain_matches_oracle(spark):
    n = 40
    imgs = datagen.images_df(spark, n)
    preds = raster.pseudo_inference(imgs, "bytes", "pred_bytes").select("image_id", "w", "h", "pred_bytes")
    qa = datagen.qa_df(spark, n)
    got = masking.apply_mask_chain(preds, qa).select("image_id", "masked_bytes").toPandas()
    qa_pdf = datagen.qa_pdf(n).set_index("image_id")
    assert len(got) == n // 2  # only even-i images have QA rows
    for _, row in got.iterrows():
        i = int(row["image_id"].split("-")[1])
        # decode the stored bytes (jpeg rows are lossy — the engine sees
        # decoded pixels, so the oracle must too)
        pix = decode_image(datagen.image_row(i)["bytes"])
        pred = (pix.astype(np.float32).mean(axis=2, keepdims=True) / 255.0 > 0.5).astype(np.float32)
        qa_arr = decode_image(bytes(qa_pdf.loc[row["image_id"], "qa_bytes"]))
        exp = masking.mask_chain_oracle(pred, qa_arr, "s2")
        assert np.array_equal(decode_image(bytes(row["masked_bytes"])), exp)


def test_hls_lut_matches_reference_bitstring():
    lut = masking.hls_bad_lut("00001111")
    for v in range(256):
        bit_val = list(format(v, "b").zfill(8))
        ref_bad = len([1 for i, j in zip(bit_val, list("00001111")) if i == "1" and j == "1"]) > 0
        assert lut[v] == ref_bad, v


def test_overlap_average_reconstructs_pointwise_model(spark):
    # window the input, run pseudo-inference per window, reassemble —
    # must equal whole-image pseudo-inference exactly (model is pointwise)
    from geospatial_studio_pipelines_spark.operators import tiling

    imgs = datagen.images_df(spark, 12)
    wins = tiling.with_windows(imgs)

    def crop_and_infer(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]))
                win = raster.crop_window(
                    arr, int(row["win_col_off"]), int(row["win_row_off"]), int(row["win_w"]), int(row["win_h"])
                )
                pred = (win.astype(np.float32).mean(axis=2, keepdims=True) / 255.0 > 0.5).astype(np.float32)
                rows.append(
                    {
                        "image_id": row["image_id"],
                        "w": row["w"],
                        "h": row["h"],
                        "win_col_off": row["win_col_off"],
                        "win_row_off": row["win_row_off"],
                        "win_pred_bytes": encode_image(pred, "raw"),
                    }
                )
            yield pd.DataFrame(rows)

    win_preds = wins.mapInPandas(
        crop_and_infer,
        "image_id string, w int, h int, win_col_off int, win_row_off int, win_pred_bytes binary",
    )
    merged = mosaic.overlap_average(win_preds).toPandas().set_index("image_id")
    full = raster.pseudo_inference(datagen.images_df(spark, 12)).select("image_id", "pred_bytes").toPandas()
    for _, row in full.iterrows():
        exp = decode_image(bytes(row["pred_bytes"]))
        got = decode_image(bytes(merged.loc[row["image_id"], "merged_bytes"]))
        assert np.allclose(got, exp), row["image_id"]


def test_decibels_and_scaling(spark):
    arr = np.array([[[100.0, 10.0, 1.0]]], dtype=np.float32)
    df = spark.createDataFrame(
        [("x", encode_image(arr, "raw"))], "image_id string, bytes binary"
    )
    out = raster.to_decibels(df).collect()[0]
    got = decode_image(bytes(out["db_bytes"]))
    assert np.allclose(got[0, 0], [20.0, 10.0, 1.0])  # band 2 untouched
    out2 = raster.scale_bands(df, [2.0, 0.5, 1.0]).collect()[0]
    got2 = decode_image(bytes(out2["scaled_bytes"]))
    assert np.allclose(got2[0, 0], [200.0, 5.0, 1.0])


def test_decode_stats_matches_numpy(spark):
    imgs = datagen.images_df(spark, 20)
    got = raster.decode_stats(imgs).toPandas()
    agg = got.groupby("band")[["psum", "psumsq", "pcount"]].sum()
    mean = agg["psum"] / agg["pcount"]
    var = agg["psumsq"] / agg["pcount"] - mean**2
    # numpy oracle
    allpix = {b: [] for b in range(3)}
    for i in range(20):
        pix = decode_image(datagen.image_row(i)["bytes"])  # lossy-aware oracle
        for b in range(3):
            allpix[b].append(pix[:, :, b].ravel())
    for b in range(3):
        v = np.concatenate(allpix[b]).astype(np.float64)
        assert np.isclose(mean[b], v.mean())
        assert np.isclose(var[b], v.var(), rtol=1e-9)
