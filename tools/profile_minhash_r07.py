#!/usr/bin/env python
"""Stage-level profile of the minhash_near_dups bench query (guide §1):
times each internal phase of dedup.ngram_jaccard_pairs at sf0.1 in one JVM,
twice, so fixed costs vs steady-state separate out."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from geospatial_studio_pipelines_spark import contracts  # noqa: E402
from geospatial_studio_pipelines_spark.functions.text import shingle_hashes  # noqa: E402
from geospatial_studio_pipelines_spark.operators import dedup  # noqa: E402
from geospatial_studio_pipelines_spark.session import spark_session  # noqa: E402


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.3f}s")
    return out


def main():
    spark = spark_session(app_name="profile-minhash", master="local[32]")
    sc = spark.sparkContext
    # warmup like bench
    contracts.q_cell_assignment(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for rep in range(2):
        print(f"== rep {rep}")
        d = contracts.load(spark, SF_DIR, "documents").select("doc_id", "text")
        dup = d.filter(F.col("doc_id") < 30).withColumn("doc_id", F.col("doc_id") + 1_000_000)
        both = d.unionByName(dup)

        sc.setJobDescription("est")
        est = t("sum(length) est", lambda: both.agg(F.sum(F.length("text"))).first()[0])
        print("   est bytes:", est)

        sc.setJobDescription("sets collect")
        sets_df = both.select(
            F.col("doc_id"),
            F.array_sort(F.array_distinct(shingle_hashes(F.col("text")))).alias("sh"),
        ).withColumn("n", F.size("sh"))
        sets_df = sets_df.persist()
        rows = t("collect sets (shingle+sort+distinct)", lambda: sets_df.select("doc_id", "sh").collect())
        print("   rows:", len(rows), "total elems:", sum(len(r[1]) for r in rows))

        sc.setJobDescription("candidate pairs")
        pairs = dedup.minhash_candidate_pairs(sets_df, "doc_id", "text", shingle_col="sh")
        pairs = t("banding join + checkpoint", lambda: pairs.localCheckpoint(eager=True))
        print("   pairs:", pairs.count())
        sets_df.unpersist()

        sc.setJobDescription("full query")
        t("FULL q_jaccard_near_dups noop", lambda: contracts.q_jaccard_near_dups(spark, SF_DIR)
          .write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
