#!/usr/bin/env python
"""One-off profiler: time sub-stages of the PBSM partitioned_spatial_join at
a given core count (fresh JVM). Usage: python tools/profile_pjoin.py <cores> [n_probe]"""
import json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.functions import spatial as S
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join, tiling

cores = int(sys.argv[1])
n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
INPUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
spark = spark_session(app_name=f"prof-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores,
                      extra_conf={"spark.sql.join.preferSortMergeJoin": "false"})
meta_dir = os.path.join(INPUT, "images_meta")


def dir_bytes(path):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))


spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(262144, dir_bytes(meta_dir) // max(cores * 4, 64))))
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")


def numeric_footprints(df):
    df = df.select("id", "w", "h", "phash").withColumns(
        {"lon": S.center_lon(F.col("phash")), "lat": S.center_lat(F.col("phash"))})
    bbox = S.footprint_bbox(F.col("lat"), F.col("lon"), F.col("w"), F.col("h"), 10.0)
    return df.withColumns(
        {"minx": bbox[0], "miny": bbox[1], "maxx": bbox[2], "maxy": bbox[3]})


def mat(df):
    df.write.format("noop").mode("overwrite").save()


# warmup
small = footprints.with_footprint(datagen.images_df(spark, 4 * cores, partitions=cores))
mat(spatial_join.broadcast_spatial_join(small, datagen.aoi_pdf(16)))

fp = numeric_footprints(spark.read.parquet(meta_dir).filter(F.col("id") < n_part))
aoi_num = datagen.aoi_df(spark, 500).withColumn(
    "aoi_id", F.substring("aoi_id", 5, 4).cast("long"))

res, n_salts = 3, 8
timings = {}

t0 = time.time(); mat(fp); timings["scan_footprints"] = time.time() - t0

img_cells = tiling.explode_cover_cells_expr(
    fp.select("id", "minx", "miny", "maxx", "maxy"), res
).withColumn("salt", S.salt(F.col("id"), n_salts))
t0 = time.time(); n_img_cells = img_cells.count(); timings["img_cells_count"] = time.time() - t0

acells = spatial_join.aoi_cover_cells(aoi_num, res).withColumn(
    "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
t0 = time.time(); n_aoi_cells = acells.count(); timings["aoi_cells_count"] = time.time() - t0
n_full = acells.filter("full").count()

j = img_cells.join(acells.hint("shuffle_hash"), ["cell_id", "salt"])
j = j.filter(
    (F.col("minx") <= F.col("aoi_maxx")) & (F.col("maxx") >= F.col("aoi_minx"))
    & (F.col("miny") <= F.col("aoi_maxy")) & (F.col("maxy") >= F.col("aoi_miny")))
t0 = time.time(); n_bbox = j.count(); timings["join_bbox_count"] = time.time() - t0
rx = F.greatest(F.col("minx"), F.col("aoi_minx"))
ry = F.greatest(F.col("miny"), F.col("aoi_miny"))
j2 = j.filter(S.hex_cell(ry, rx, res) == F.col("cell_id"))
t0 = time.time(); n_dedup = j2.count(); timings["refpoint_count"] = time.time() - t0
n_boundary = j2.filter(~F.col("full")).count()

full = spatial_join.partitioned_spatial_join(fp, aoi_num, res=res, n_salts=n_salts, id_col="id")
t0 = time.time(); mat(full); timings["full_job"] = time.time() - t0
t0 = time.time(); mat(full); timings["full_job_2"] = time.time() - t0

print("PROF::" + json.dumps({
    "cores": cores, "n_img_cells": n_img_cells, "n_aoi_cells": n_aoi_cells,
    "n_aoi_full": n_full, "n_bbox_cand": n_bbox, "n_dedup": n_dedup,
    "n_boundary": n_boundary,
    **{k: round(v, 2) for k, v in timings.items()}}))
spark.stop()
