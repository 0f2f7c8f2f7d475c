#!/usr/bin/env python
"""Per-stage diagnosis of partitioned_spatial_join via Spark event logs.
Usage: python tools/stage_profile.py <cores> [n_probe]
Prints STAGES:: JSON: per stage wall time, executorRunTime (core-seconds),
executorCpuTime, GC time, shuffle bytes — the numbers that say WHERE the
8->32 scaling stalls."""
import glob, json, os, shutil, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.functions import spatial as S
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join

cores = int(sys.argv[1])
n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
INPUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
EVDIR = f"/tmp/gsp_eventlog_{cores}"
os.makedirs(EVDIR, exist_ok=True)
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)
spark = spark_session(app_name=f"stageprof-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=int(os.environ.get("SP_SHUF", 2 * cores)),
                      extra_conf={"spark.sql.join.preferSortMergeJoin": "false",
                                  "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get("SP_ADV", "16m"),
                                  "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get("SP_PF", "false"),
                                  "spark.eventLog.enabled": "true",
                                  "spark.eventLog.compress": "false",
                                  "spark.eventLog.rolling.enabled": "false",
                                  "spark.eventLog.dir": EVDIR})
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


small = footprints.with_footprint(datagen.images_df(spark, 4 * cores, partitions=cores))
mat(spatial_join.broadcast_spatial_join(small, datagen.aoi_pdf(16)))
fp = numeric_footprints(spark.read.parquet(meta_dir).filter(F.col("id") < n_part))
aoi_num = datagen.aoi_df(spark, 500).withColumn(
    "aoi_id", F.substring("aoi_id", 5, 4).cast("long"))
j = spatial_join.partitioned_spatial_join(
    fp, aoi_num, res=int(os.environ.get("PJOIN_RES", "5")),
    n_salts=int(os.environ.get("PJOIN_SALTS", "1")), id_col="id")
mat(j.limit(0))

t0 = time.time()
mat(j)
wall = time.time() - t0
MARK = time.time()  # stages submitted after this belong to the timed run
t0 = time.time()
mat(j)
wall2 = time.time() - t0
spark.stop()

# parse event log
stages = {}
for path in glob.glob(EVDIR + "/**/*", recursive=True):
    if os.path.isdir(path) or "appstatus" in path:
        continue
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time", 0) / 1000.0
            comp = si.get("Completion Time", 0) / 1000.0
            acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}
            stages[sid] = {
                "name": si["Stage Name"].split(" ")[0],
                "tasks": si["Number of Tasks"],
                "wall_s": round(comp - sub, 2),
                "run_cs": round(float(acc.get("internal.metrics.executorRunTime", 0)) / 1000.0, 1),
                "cpu_cs": round(float(acc.get("internal.metrics.executorCpuTime", 0)) / 1e9, 1),
                "gc_s": round(float(acc.get("internal.metrics.jvmGCTime", 0)) / 1000.0, 1),
                "shuf_write_mb": round(float(acc.get("internal.metrics.shuffle.write.bytesWritten", 0)) / 1e6, 1),
                "shuf_read_mb": round(float(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0) / 1e6
                                      + float(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0) / 1e6, 1),
                "sub": sub,
            }
# keep only stages from the SECOND timed run
last = [s for s in stages.values() if s["sub"] >= MARK - 0.5]
for s in last:
    del s["sub"]
print("STAGES::" + json.dumps({"cores": cores, "wall1": round(wall, 2),
                               "wall2": round(wall2, 2), "stages": last}))
