"""As-of nearest-date join and kNN vs single-node oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.operators import asof, footprints, knn


@pytest.fixture(scope="module")
def images_fp(spark):
    return footprints.with_footprint(datagen.images_df(spark, 200)).cache()


def test_asof_matches_reference_loop(spark, images_fp):
    # primary = S2L2A, secondary = S1GRD; match within the same coarse cell
    from geospatial_studio_pipelines_spark.operators import tiling

    df = tiling.with_cell(images_fp, res=0).select("image_id", "modality", "date", "cell_id")
    prim = df.filter(F.col("modality") == "S2L2A").drop("modality")
    sec = df.filter(F.col("modality") == "S1GRD").drop("modality")
    got = asof.asof_nearest_date_join(
        prim, sec, on=["cell_id"], pre_days=30, post_days=30, suffix="_sec"
    ).select("image_id", "image_id_sec").collect()
    got_pairs = {(r.image_id, r.image_id_sec) for r in got}

    ppdf = prim.toPandas()
    spdf = sec.toPandas()
    pairs = asof.asof_oracle_pandas(ppdf, spdf, on=["cell_id"], pre_days=30, post_days=30)
    exp_pairs = {(ppdf.iloc[pi]["image_id"], spdf.iloc[si]["image_id"]) for pi, si in pairs}
    assert got_pairs == exp_pairs
    assert len(got_pairs) > 0  # non-degenerate


def test_asof_tie_prefers_earlier(spark):
    prim = spark.createDataFrame(
        [("p1", "2024-06-10")], "id string, date string"
    ).withColumn("date", F.to_date("date"))
    sec = spark.createDataFrame(
        [("s-before", "2024-06-09"), ("s-after", "2024-06-11"), ("s-far", "2024-06-20")],
        "id string, date string",
    ).withColumn("date", F.to_date("date"))
    got = asof.asof_nearest_date_join(prim, sec, on=[], suffix="_s").collect()
    assert len(got) == 1 and got[0]["id_s"] == "s-before"


def test_asof_drops_out_of_window(spark):
    prim = spark.createDataFrame([("p1", "2024-06-10")], "id string, date string").withColumn(
        "date", F.to_date("date")
    )
    sec = spark.createDataFrame([("s1", "2024-06-15")], "id string, date string").withColumn(
        "date", F.to_date("date")
    )
    assert asof.asof_nearest_date_join(prim, sec, on=[]).count() == 0


@pytest.mark.parametrize("k", [4, 8])
def test_knn_matches_bruteforce(spark, images_fp, k):
    pts = images_fp.select("image_id", "lat", "lon")
    got = knn.knn_join(pts, k=k).toPandas()
    exp = knn.knn_oracle(pts.toPandas(), k=k)
    g = set(map(tuple, got[["image_id", "nid", "rank"]].itertuples(index=False)))
    e = set(map(tuple, exp[["image_id", "nid", "rank"]].itertuples(index=False)))
    assert g == e
    assert len(got) == 200 * k


def test_knn_escalation_path(spark):
    # 20 points spread worldwide at a fine res → first ring is empty, forces
    # the radius escalation + brute-force fallback to do the work
    pdf = datagen.images_pdf(20)
    phash = pdf["phash"].to_numpy()
    pdf["lon"] = -180.0 + (phash % 360_000) / 1000.0
    pdf["lat"] = -60.0 + ((phash // 360_000) % 120_000) / 1000.0
    pts = spark.createDataFrame(pdf[["image_id", "lat", "lon"]])
    got = knn.knn_join(pts, k=3, res=12).toPandas()
    exp = knn.knn_oracle(pdf, k=3)
    g = set(map(tuple, got[["image_id", "nid", "rank"]].itertuples(index=False)))
    e = set(map(tuple, exp[["image_id", "nid", "rank"]].itertuples(index=False)))
    assert g == e


def test_knn_straggler_pass_never_broadcasts_big_table(spark, monkeypatch):
    """Past POINTS_BROADCAST_MAX_BYTES the straggler brute-force pass must
    broadcast the (small) query side, not the point table — forced by
    setting the cap to 0; results must equal the normal path's."""
    pdf = datagen.images_pdf(20)
    phash = pdf["phash"].to_numpy()
    pdf["lon"] = -180.0 + (phash % 360_000) / 1000.0
    pdf["lat"] = -60.0 + ((phash // 360_000) % 120_000) / 1000.0
    pts = spark.createDataFrame(pdf[["image_id", "lat", "lon"]])
    monkeypatch.setattr(knn, "POINTS_BROADCAST_MAX_BYTES", 0)
    got = knn.knn_join(pts, k=3, res=12).toPandas()
    exp = knn.knn_oracle(pdf, k=3)
    g = set(map(tuple, got[["image_id", "nid", "rank"]].itertuples(index=False)))
    e = set(map(tuple, exp[["image_id", "nid", "rank"]].itertuples(index=False)))
    assert g == e


def test_disk_offsets_match_grid_disk():
    """The codegen disk expansion (constant adds on the packed cell id)
    must enumerate exactly ``hexgrid.grid_disk``'s cell set — pins the r7
    replacement of the per-round Arrow UDF with a pure expression."""
    import numpy as np

    from geospatial_studio_pipelines_spark.index import hexgrid
    from geospatial_studio_pipelines_spark.operators.knn import _disk_offsets

    for res, q, r in ((5, 10, -7), (8, 0, 0), (3, -1000, 1000)):
        cell = int(hexgrid._pack(np.int64(res), np.int64(q), np.int64(r)))
        for radius in (1, 2, 8):
            want = set(hexgrid.grid_disk(np.int64(cell), radius).tolist())
            got = {cell + (dq << 29) + dr for dq, dr in _disk_offsets(radius)}
            assert got == want, (res, q, r, radius)
