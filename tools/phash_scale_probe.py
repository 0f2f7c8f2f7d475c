#!/usr/bin/env python
"""One-off 10x scale probe of the Manku auto-geometry cost model (round-6
directive): run B9 (hamming_near_dups, bands="auto") at 40M rows — 10x the
official bench size the model's constants were fitted at — and record in
BENCH_NOTES: completion, wall time, the chosen m, and the ACTUAL candidate
count vs choose_hamming_blocks' prediction. A hot-bucket-guard trip or OOM
here is a finding, not a failure. Measurement helper, not engine code."""
import json
import os
import sys
import time
from math import comb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SPARK_GRAFT_BENCH_PHASH_ROWS", "40000000"))
BITS, H = 62, 3


def main():
    from pyspark.sql import functions as F

    from geospatial_studio_pipelines_spark.operators import dedup
    from geospatial_studio_pipelines_spark.session import spark_session

    m = dedup.choose_hamming_blocks(N, BITS, H)
    tables = comb(m, H)
    layout = dedup._hamming_block_layout(BITS, m)
    widths = sorted(w for _, w in layout)
    key_width = sum(widths[: m - H])
    predicted = tables * (N * (N - 1) / 2.0) / (2.0 ** key_width)
    print(f"n={N} auto m={m} tables={tables} worst key_width={key_width} "
          f"predicted random candidates={predicted:.3g}", flush=True)

    spark = spark_session(app_name="phash-40m-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    ph = spark.range(0, N, numPartitions=256).select(
        F.col("id").alias("image_id"),
        F.xxhash64("id").bitwiseAND(F.lit(2**62 - 1)).alias("phash"),
    )

    t0 = time.time()
    out = dedup.hamming_near_dups(
        ph, "phash", id_col="image_id", bits=BITS, max_hamming=H, bands="auto"
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_pairs = out.count()
    print(f"completed: wall={wall:.1f}s pairs={n_pairs}", flush=True)

    # actual candidate count: sum over (band, key) buckets of C(cnt, 2) —
    # the quantity the cost model predicts (audit job, untimed)
    banded = dedup.banded_signatures(
        ph, "phash", id_col="image_id", bits=BITS, bands=m, max_hamming=H,
        hot_bucket_limit=None,
    )
    actual = (
        banded.groupBy("band", "key").count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand"))
        .first()["cand"]
    )
    print(json.dumps({
        "n_rows": N, "chosen_m": m, "tables": tables,
        "worst_key_width": key_width,
        "predicted_candidates": round(predicted),
        "actual_candidates": int(actual),
        "wall_s": round(wall, 1), "pairs": n_pairs,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
