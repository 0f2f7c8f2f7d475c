#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Queries (the BASELINE.md bench plan):
  B1 cell_assignment      — hex cell encode + count (pure codegen path)
  B2 bbox_spatial_join    — footprints × broadcast AOIs intersects join
  B3 knn                  — k=4 cell-ring kNN over customer points
  B4 image_tile_join      — synthetic image table: decode-free footprint →
                            adaptive cells → broadcast R-tree exact join
  B5 image_pipeline       — decode → pseudo-infer → mask → vectorize (UDF path)
  B6 minhash_near_dups    — shingle → minhash → LSH band join → jaccard
  B7 ann_topk             — brute-force cosine top-5 over embeddings

Each query materializes via the noop sink (full compute, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geospatial_studio_pipelines_spark import contracts, datagen  # noqa: E402
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join  # noqa: E402
from geospatial_studio_pipelines_spark.session import spark_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "20000"))
N_AOIS = int(os.environ.get("SPARK_GRAFT_BENCH_AOIS", "500"))


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark):
    out = {}

    def run(name, fn):
        t0 = time.time()
        _materialize(fn())
        out[name] = round(time.time() - t0, 3)

    # warmup (untimed): fork Python workers, trigger codegen + Arrow init so
    # the first timed query doesn't absorb session startup
    _materialize(contracts.q_cell_assignment(spark, SF_DIR))

    run("cell_assignment", lambda: contracts.q_cell_assignment(spark, SF_DIR))
    run("bbox_spatial_join", lambda: contracts.q_bbox_spatial_join(spark, SF_DIR))
    run("knn", lambda: contracts.q_knn(spark, SF_DIR))

    # pre-materialize the synthetic image table (untimed) so image_tile_join
    # measures the footprint→cell→R-tree join, not the PNG/DCT encode of the
    # generator
    images = footprints.with_footprint(datagen.images_df(spark, N_IMAGES)).persist()
    _materialize(images)
    aois = datagen.aoi_pdf(N_AOIS)
    run("image_tile_join", lambda: spatial_join.broadcast_spatial_join(images, aois))
    images.unpersist()
    run("image_pipeline", lambda: contracts.q_image_pipeline(spark, SF_DIR))
    run("minhash_near_dups", lambda: contracts.q_jaccard_near_dups(spark, SF_DIR))
    run("ann_topk", lambda: contracts.q_ann_topk(spark, SF_DIR))
    return out


def main():
    spark = spark_session(app_name="gsp-bench", master=f"local[{CPUS}]")
    queries = bench_queries(spark)
    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "spatial-join+tiling suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "cpus": CPUS,
        "bench_images": N_IMAGES,
        "images_per_sec": round(N_IMAGES / queries["image_tile_join"], 1),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
