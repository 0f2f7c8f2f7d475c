#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: ≥0.8 from N → 4N executors).

No real cluster exists in this sandbox, so per the round brief the same job
runs at two parallelism levels — local[8] and local[32] (32 physical cores,
SMT off) — on identical pre-materialized parquet input, and we report
throughput at both plus efficiency:

    efficiency = throughput(32) / (4 × throughput(8))

Methodology (what makes the number honest):
  * input is generated ONCE (untimed) and written to parquet; both
    parallelism levels read the exact same files,
  * parquet split size is set so every job runs ≥4 task waves at the high
    core count (stragglers amortize; one-wave runs measure the max task,
    not the mean),
  * each job runs twice per JVM after a warmup job (Python-worker fork +
    numpy import + codegen excluded); the min is reported — steady-state
    throughput, the quantity that scales on a real cluster,
  * measured jobs carry real per-row CPU (image decode, R-tree probes,
    exact point-in-polygon), matching the north metric (images/sec,
    tiles/sec) — not fixed-overhead-dominated micro-queries.

Jobs:
  image_decode_stats — read 40k encoded images → decode (DCT/PNG) →
      per-band partial stats → groupBy(band) final agg. The per-task data
      path of the reference (fetch→impute→stats, SURVEY §3.3); CPU-bound
      Arrow UDF, tiny shuffle.
  image_tile_join    — 16M image-metadata rows → footprint exprs →
      adaptive hex cell (tiling) → broadcast packed-R-tree exact
      intersects join vs 500 AOIs. Zero shuffle; the flagship slice.
  partitioned_join   — 2M footprints × 500 AOIs through the shuffle
      strategy: covering-cell explode, salted equi-join on (cell_id,salt),
      exact geometry, pair dedupe. Exercises exchange + AQE.

Results land in BENCH/BASELINE.md. Each parallelism level runs in its own
subprocess (one JVM per master setting; sequential, identical inputs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
N_BYTES = int(os.environ.get("SPARK_GRAFT_SCALE_BYTES_IMAGES", "40000"))
N_META = int(os.environ.get("SPARK_GRAFT_SCALE_META_IMAGES", "16000000"))
N_PART_JOIN = int(os.environ.get("SPARK_GRAFT_SCALE_PART_IMAGES", "2000000"))
N_AOIS = 500
REPS = 2

SETUP_WORKER = r"""
import json, os, sys
sys.path.insert(0, __REPO__)
import numpy as np, pandas as pd
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen

input_dir, n_bytes, n_meta = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
marker = os.path.join(input_dir, "MARKER.json")
want = {"n_bytes": n_bytes, "n_meta": n_meta, "v": 2}
if os.path.exists(marker) and json.load(open(marker)) == want:
    print("RESULT::{}")
    sys.exit(0)

spark = spark_session(app_name="scale-setup", master="local[32]")
datagen.images_df(spark, n_bytes, partitions=256).write.mode("overwrite").parquet(
    os.path.join(input_dir, "images_bytes"))

def gen_meta(batches):
    for pdf in batches:
        i = pdf["id"].to_numpy(dtype=np.int64)
        phash = ((i.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**63)).astype(np.int64)
        yield pd.DataFrame({
            "image_id": [f"img-{int(v):08d}" for v in i],
            "w": np.array(datagen._WIDTHS, dtype=np.int32)[i % 4],
            "h": np.array(datagen._HEIGHTS, dtype=np.int32)[(i // 4) % 4],
            "phash": phash,
        })

(spark.range(0, n_meta, numPartitions=256)
      .mapInPandas(gen_meta, "image_id string, w int, h int, phash long")
      .write.mode("overwrite").parquet(os.path.join(input_dir, "images_meta")))
json.dump(want, open(marker, "w"))
print("RESULT::{}")
spark.stop()
"""

MEASURE_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, __REPO__)
from pyspark.sql import functions as F
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.operators import footprints, raster, spatial_join, tiling

cores, input_dir, n_part, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = spark_session(app_name=f"scale-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)

def materialize(df):
    df.write.format("noop").mode("overwrite").save()

def dir_bytes(path):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))

def set_splits(path, waves=4):
    # ≥`waves` task waves at this core count so stragglers amortize
    target = max(cores * waves, 64)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(262144, dir_bytes(path) // target)))

bytes_dir = os.path.join(input_dir, "images_bytes")
meta_dir = os.path.join(input_dir, "images_meta")
aois = datagen.aoi_pdf(__NAOIS__)

# warmup: fork Python workers, import numpy/pandas, trigger codegen + Arrow
small = footprints.with_footprint(datagen.images_df(spark, 4 * cores, partitions=cores))
materialize(raster.decode_stats(datagen.images_df(spark, 4 * cores, partitions=cores)))
materialize(spatial_join.broadcast_spatial_join(small, datagen.aoi_pdf(16)))

def job_decode():
    set_splits(bytes_dir)
    df = spark.read.parquet(bytes_dir)
    stats = raster.decode_stats(df)
    return stats.groupBy("band").agg(
        F.sum("psum").alias("s"), F.sum("psumsq").alias("ss"),
        F.sum("pcount").alias("n"), F.min("pmin").alias("mn"), F.max("pmax").alias("mx"))

def job_tile_join():
    set_splits(meta_dir)
    fp = tiling.with_cell(footprints.with_footprint(spark.read.parquet(meta_dir)))
    return spatial_join.broadcast_spatial_join(fp, aois, extra_cols=("cell_id", "res"))

def job_partitioned():
    set_splits(meta_dir)
    # image_id is zero-padded, so the string predicate pushes down to parquet
    cutoff = f"img-{n_part:08d}"
    fp = footprints.with_footprint(
        spark.read.parquet(meta_dir).filter(F.col("image_id") < cutoff))
    return spatial_join.partitioned_spatial_join(
        fp, datagen.aoi_df(spark, __NAOIS__), res=5, n_salts=8)

results = {}
for name, fn in [("image_decode_stats", job_decode),
                 ("image_tile_join", job_tile_join),
                 ("partitioned_join", job_partitioned)]:
    best = None
    for _ in range(reps):
        t0 = time.time()
        materialize(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results[name + "_s"] = best

print("RESULT::" + json.dumps(results))
spark.stop()
"""


def fill_template(script: str) -> str:
    return script.replace("__REPO__", repr(REPO)).replace("__NAOIS__", str(N_AOIS))


def run_worker(script: str, args: list[str], timeout: int = 3600) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::") :])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


JOB_N = {
    "image_decode_stats": ("images", N_BYTES),
    "image_tile_join": ("images", N_META),
    "partitioned_join": ("images", N_PART_JOIN),
}


def main():
    lo, hi = 8, 32
    run_worker(fill_template(SETUP_WORKER), [INPUT_DIR, str(N_BYTES), str(N_META)])
    r_lo = run_worker(fill_template(MEASURE_WORKER), [str(lo), INPUT_DIR, str(N_PART_JOIN), str(REPS)])
    r_hi = run_worker(fill_template(MEASURE_WORKER), [str(hi), INPUT_DIR, str(N_PART_JOIN), str(REPS)])
    report = {"cores_lo": lo, "cores_hi": hi, "input_dir": INPUT_DIR}
    for key in r_lo:
        job = key.removesuffix("_s")
        unit, n = JOB_N[job]
        t_lo, t_hi = r_lo[key], r_hi[key]
        thr_lo, thr_hi = n / t_lo, n / t_hi
        eff = thr_hi / ((hi / lo) * thr_lo)
        report[job] = {
            "n": n,
            "unit": unit,
            f"t{lo}_s": round(t_lo, 2),
            f"t{hi}_s": round(t_hi, 2),
            f"throughput_{lo}": round(thr_lo, 1),
            f"throughput_{hi}": round(thr_hi, 1),
            "efficiency": round(eff, 3),
        }
    print(json.dumps(report, indent=2))
    _write_md(report)


def _write_md(report: dict) -> None:
    lo, hi = report["cores_lo"], report["cores_hi"]
    lines = [
        "# BENCH/BASELINE.md — scaling-efficiency evidence",
        "",
        "North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N",
        f"executors. Sandbox substitute (per round brief): identical job at local[{lo}]",
        f"vs local[{hi}] (32 physical cores, SMT off) on the same pre-materialized",
        f"parquet input; efficiency = thr({hi}) / ({hi // lo} · thr({lo})).",
        "",
        "| job | n rows | t(8) s | t(32) s | thr(8) /s | thr(32) /s | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, v in report.items():
        if not isinstance(v, dict):
            continue
        lines.append(
            f"| {key} | {v['n']} | {v[f't{lo}_s']} | {v[f't{hi}_s']} | "
            f"{v[f'throughput_{lo}']} | {v[f'throughput_{hi}']} | {v['efficiency']} |"
        )
    lines += [
        "",
        "Jobs: `image_decode_stats` = parquet scan → image decode (DCT/PNG codecs)",
        "→ per-band partial stats → groupBy(band) final agg (CPU-bound Arrow UDF);",
        "`image_tile_join` = 16M metadata rows → footprint exprs → adaptive hex",
        "cell tiling → broadcast packed-R-tree exact intersects join vs 500 AOIs",
        "(zero-shuffle map-side path); `partitioned_join` = salted covering-cell",
        "equi-join + exact geometry + pair dedupe (two shuffles, AQE).",
        "",
        "Method: input generated once (untimed) and read by both JVMs; parquet",
        "split size set for ≥4 task waves; per-JVM warmup job (worker fork,",
        "numpy import, codegen excluded); min of 2 reps = steady-state throughput.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
