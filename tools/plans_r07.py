#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query → plans/r07/<q>_<tag>.txt.

Usage: python tools/plans_r07.py <before|after> [query ...]

Builds each query exactly as bench.py's run_one does (same fixtures, same
operator calls) but only compiles the plan — no execution except the
untimed fixture setup the bench itself performs (index build, checkpointed
inputs). Oracle-registry queries not in the bench suite can be captured too
by naming them explicitly.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "cell_assignment",
    "bbox_spatial_join",
    "knn",
    "image_tile_join",
    "image_pipeline",
    "minhash_near_dups",
    "ann_topk",
    "ingest_validate",
    "phash_near_dups",
    "phash_index_probe",
]


def build(spark, name):
    """Mirror bench.py's run_one construction for `name`."""
    from pyspark.sql import functions as F

    from geospatial_studio_pipelines_spark import contracts, datagen
    from geospatial_studio_pipelines_spark.operators import footprints, spatial_join
    from geospatial_studio_pipelines_spark.sources import ingest

    if name == "image_tile_join":
        images = footprints.with_footprint(datagen.images_df(spark, 2000))
        aois = datagen.aoi_pdf(500)
        return spatial_join.broadcast_spatial_join(images, aois)
    if name == "ingest_validate":
        import bench

        path = bench._ensure_ingest_dir()
        df = ingest.read_binary_dir(spark, path, glob="*.bin")
        return df.groupBy("fmt").agg(
            F.count("*").alias("n"),
            F.sum((F.col("w") > 0).cast("long")).alias("n_valid"),
        )
    if name == "phash_near_dups":
        from geospatial_studio_pipelines_spark.operators import dedup

        def base_of(c):
            return F.xxhash64(c).bitwiseAND(F.lit(2**62 - 1))

        n = 4_000_000
        ph = spark.range(0, n, numPartitions=64).select(
            F.col("id").alias("image_id"),
            F.when(
                F.col("id") % 64 == 0, base_of(F.col("id") + 1).bitwiseXOR(F.lit(1))
            ).otherwise(base_of(F.col("id"))).alias("phash"),
        ).localCheckpoint(eager=True)
        return dedup.hamming_near_dups(
            ph, "phash", id_col="image_id", bits=62, max_hamming=3, bands="auto"
        )
    if name == "phash_index_probe":
        import bench
        from geospatial_studio_pipelines_spark.operators import hamming_index

        def base_of(c):
            return F.xxhash64(c).bitwiseAND(F.lit(2**62 - 1))

        # reuse the bench's persisted index (build it if absent, untimed)
        import json
        import shutil

        marker = os.path.join(bench.PHASH_IDX_DIR, "MARKER.json")
        want = {"n": bench.N_PHASH, "v": 1}
        try:
            have = json.load(open(marker))
        except (OSError, ValueError):
            have = None
        if have != want:
            shutil.rmtree(bench.PHASH_IDX_DIR, ignore_errors=True)
            corpus = spark.range(0, bench.N_PHASH, numPartitions=64).select(
                F.col("id").alias("image_id"), base_of(F.col("id")).alias("phash")
            )
            hamming_index.write_hamming_index(
                corpus, "gsp_bench_phash_idx", os.path.join(bench.PHASH_IDX_DIR, "idx"),
                hash_col="phash", bits=62, bands=4, max_hamming=3,
            )
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(want, fh)
            os.replace(tmp, marker)
        probe = spark.range(0, bench.N_PROBE, numPartitions=16).select(
            (F.col("id") + 100_000_000).alias("image_id"),
            base_of(F.col("id") * (bench.N_PHASH // bench.N_PROBE) % bench.N_PHASH)
            .bitwiseXOR(F.lit((1 << 3) | (1 << 44))).alias("phash"),
        ).localCheckpoint(eager=True)
        return hamming_index.probe_hamming_index(
            spark, "gsp_bench_phash_idx", os.path.join(bench.PHASH_IDX_DIR, "idx"),
            probe, probe_rows=bench.N_PROBE,
        )
    fn = {
        "cell_assignment": contracts.q_cell_assignment,
        "bbox_spatial_join": contracts.q_bbox_spatial_join,
        "knn": contracts.q_knn,
        "image_pipeline": contracts.q_image_pipeline,
        "minhash_near_dups": contracts.q_jaccard_near_dups,
        "ann_topk": contracts.q_ann_topk,
    }.get(name)
    if fn is None:
        fn = contracts.QUERIES[name][0]
    return fn(spark, SF_DIR)


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    from geospatial_studio_pipelines_spark.session import spark_session

    spark = spark_session(app_name=f"gsp-plans-{tag}", master=f"local[{CPUS}]")
    for name in names:
        df = build(spark, name)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
