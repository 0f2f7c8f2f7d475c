#!/usr/bin/env python
"""Quick timing of partitioned_spatial_join at a given core count (fresh JVM).
Usage: python tools/time_pjoin.py <cores> [n_probe]"""
import json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.functions import spatial as S
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join

cores = int(sys.argv[1])
n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
INPUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
spark = spark_session(app_name=f"time-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores,
                      extra_conf={"spark.sql.join.preferSortMergeJoin": "false",
                                  "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get("SP_ADV", "16m"),
                                  "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get("SP_PF", "false")})
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


# warmup: python workers, codegen, numpy imports
small = footprints.with_footprint(datagen.images_df(spark, 4 * cores, partitions=cores))
mat(spatial_join.broadcast_spatial_join(small, datagen.aoi_pdf(16)))
fp = numeric_footprints(spark.read.parquet(meta_dir).filter(F.col("id") < n_part))
aoi_num = datagen.aoi_df(spark, 500).withColumn(
    "aoi_id", F.substring("aoi_id", 5, 4).cast("long"))
j = spatial_join.partitioned_spatial_join(fp, aoi_num, res=int(os.environ.get("PJOIN_RES", "3")), n_salts=8, id_col="id")
mat(j.limit(0))  # plan + codegen warm, no execution of the heavy stages

runs = []
for _ in range(2):
    t0 = time.time()
    mat(j)
    runs.append(round(time.time() - t0, 2))
print("TIME::" + json.dumps({"cores": cores, "n": n_part, "runs": runs,
                             "best": min(runs)}))
spark.stop()
