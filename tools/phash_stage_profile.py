#!/usr/bin/env python
"""Per-stage diagnosis of the dedup-family scaling job (phash_near_dups,
the B9 shape over pre-materialized input) via Spark event logs.
Usage: python tools/phash_stage_profile.py <cores> [n_rows]
Prints STAGES:: JSON mirroring tools/stage_profile.py: per stage wall
time, executorRunTime / CpuTime (core-seconds), GC, shuffle bytes — the
numbers that say WHERE a 4->16 scaling shortfall lives (exchange write,
bucket self-join, pair agg, or scheduling constants)."""
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F

from geospatial_studio_pipelines_spark.operators import dedup
from geospatial_studio_pipelines_spark.session import spark_session

cores = int(sys.argv[1])
n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
INPUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
EVDIR = f"/tmp/gsp_eventlog_phash_{cores}"
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)
spark = spark_session(
    app_name=f"phashprof-{cores}", master=f"local[{cores}]",
    shuffle_partitions=int(os.environ.get("SP_SHUF", max(64, 4 * cores))),
    extra_conf={"spark.sql.join.preferSortMergeJoin": "false",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                    os.environ.get("SP_ADV", "16m"),
                "spark.sql.adaptive.coalescePartitions.parallelismFirst":
                    os.environ.get("SP_PF", "false"),
                "spark.eventLog.enabled": "true",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
                "spark.eventLog.dir": EVDIR})
meta_dir = os.path.join(INPUT, "images_meta")


def dir_bytes(path):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))


dedup_dir = os.path.join(INPUT, f"dedup_ids_{n_rows}")
if not os.path.exists(dedup_dir):  # exact-sized input, as the scaling bench uses
    (spark.range(0, n_rows, numPartitions=64)
          .write.mode("overwrite").parquet(dedup_dir))
target = max(cores * 4, 64)
spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(262144, dir_bytes(dedup_dir) // target)))


def mat(df):
    df.write.format("noop").mode("overwrite").save()


# warmup: codegen + banding machinery on a tiny input
mat(dedup.hamming_near_dups(
    spark.range(2000).select(
        F.col("id"),
        F.xxhash64("id").bitwiseAND(F.lit(2**62 - 1)).alias("ph")),
    "ph", id_col="id", bits=62, max_hamming=3, bands=4))

df = (spark.read.parquet(dedup_dir)
      .select("id", F.xxhash64("id").bitwiseAND(F.lit(2**62 - 1)).alias("ph")))
j = dedup.hamming_near_dups(df, "ph", id_col="id", bits=62, max_hamming=3,
                            bands="auto", n_rows=n_rows)

t0 = time.time()
mat(j)
wall = time.time() - t0
MARK = time.time()  # stages submitted after this belong to the timed run
t0 = time.time()
mat(j)
wall2 = time.time() - t0
spark.stop()

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
last = [s for s in stages.values() if s["sub"] >= MARK - 0.5]
gap = [s for s in stages.values() if s["sub"] < MARK - 0.5]
for s in last:
    del s["sub"]
print("STAGES::" + json.dumps({"cores": cores, "n_rows": n_rows,
                               "wall1": round(wall, 2), "wall2": round(wall2, 2),
                               "stages_run1_count": len(gap),
                               "stages": last}))
