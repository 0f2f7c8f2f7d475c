"""Approximate-nearest-neighbor search over an embedding column.

Two strategies over ``embeddings(vec_id, embedding array<float>, label)``:

* ``brute_force_topk`` — exact cosine top-k via broadcast pair scan +
  window rank. The dot products run as ``aggregate(zip_with(...))``
  expressions — whole-stage-codegen JVM arithmetic, no Python. Correct
  baseline at any k; O(n²) pairs, so only for modest n or as the per-bucket
  kernel below.
* ``lsh_topk`` — random-hyperplane LSH: ``n_planes`` sign bits per vector
  (computed in one vectorized pandas UDF matmul), candidates = vectors
  sharing a bucket in any of ``n_tables`` tables, exact cosine + rank on the
  candidates, brute-force fallback for queries with < k candidates. This is
  the 10^12-scale path: bucket sizes are ~n/2^n_planes, each bucket joins
  locally (IVF-style), and the fallback bounds the recall loss at exactly-k
  semantics.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_expr


def _rank_topk(pairs: DataFrame, k: int) -> DataFrame:
    sim = F.round(cosine_expr("va", "vb"), 6)
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b").asc())
    return (
        pairs.select("id_a", "id_b", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    emb: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k for every vector (self-query). Returns
    (id_a, id_b, cos_sim rounded 1e-6, rank); ties break by id_b."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
    return _rank_topk(pairs, k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def with_lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add (table, bucket) rows per vector: sign-bit signature per table.
    One Arrow-batched matmul per partition — the vectorized-UDF hot path."""
    planes = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = []
            for t, pl in enumerate(planes):
                # strict left-to-right accumulation over the vector index —
                # NOT `mat @ pl` (BLAS blocks/reorders the summation): this
                # keeps every dot product bit-identical to a SQL engine's
                # sequential list-sum, so the bucket assignment itself is
                # reproducible by the DuckDB oracle (lsh_bucket_sql).
                dots = np.zeros((mat.shape[0], pl.shape[1]))
                for j in range(mat.shape[1]):
                    dots += mat[:, j : j + 1] * pl[j]
                bucket = ((dots > 0) * (1 << np.arange(n_planes))).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "embedding": pdf[vec_col].to_numpy(),
                            "table": t,
                            "bucket": bucket.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return emb.mapInPandas(
        sig, f"vec_id long, embedding array<float>, table int, bucket long"
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket-join candidates, exact-rank them, brute-force only
    the under-filled queries. Rows identical in shape to brute_force_topk."""
    buckets = with_lsh_bucket(emb, dim, n_planes, n_tables, vec_col).cache()
    a = buckets.select(
        F.col("table"), F.col("bucket"), F.col(id_col).alias("id_a"), F.col("embedding").alias("va")
    )
    b = buckets.select(
        F.col("table"), F.col("bucket"), F.col(id_col).alias("id_b"), F.col("embedding").alias("vb")
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "va", "vb")
    )
    ranked = _rank_topk(cand, k)
    filled = ranked.groupBy("id_a").count().filter(F.col("count") >= k).select("id_a")
    good = ranked.join(filled, "id_a", "left_semi")
    # fallback: queries with too few candidates get exact search
    missing = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")).join(
        filled, "id_a", "left_anti"
    )
    allb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    fb_pairs = missing.join(F.broadcast(allb), F.col("id_a") != F.col("id_b"))
    fallback = _rank_topk(fb_pairs, k)
    out = good.unionByName(fallback)
    buckets.unpersist()
    return out


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs through LSH buckets — the 10^12-scale
    path: candidates are only pairs sharing a hyperplane bucket in ≥1 table
    (expected bucket size n/2^n_planes → per-bucket local pair work), then
    exact cosine ≥ threshold on candidates. Deterministic end-to-end (fixed
    seed + ordered dot accumulation), so a SQL oracle can reproduce the
    exact pair set — see ``lsh_bucket_sql``. Recall < 1 by construction —
    the 4-planes × 8-tables default gives ≈1-(1-(1-θ/π)⁴)⁸ ≈ 0.99 recall at
    the near-dup regime (cos ≥ 0.9, pytest-gated); raise ``n_tables`` (or
    lower ``n_planes``) to trade compute for recall."""
    buckets = with_lsh_bucket(emb, dim, n_planes, n_tables, vec_col)
    a = buckets.select("table", "bucket", F.col(id_col).alias("id_a"), F.col("embedding").alias("va"))
    b = buckets.select("table", "bucket", F.col(id_col).alias("id_b"), F.col("embedding").alias("vb"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(cosine_expr("va", "vb"), 6)
    return cand.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def lsh_bucket_sql(vec_expr: str, table: int, dim: int = 64, n_planes: int = 6, seed: int = 42) -> str:
    """DuckDB expression reproducing ``with_lsh_bucket``'s bucket id for one
    table: Σ_p 2^p · [dot(vec, plane_p) > 0], dots accumulated left-to-right
    (bit-identical to the numpy kernel's ordered loop)."""
    pl = hyperplanes(dim, n_planes, seed + table)
    bits = []
    for p in range(n_planes):
        coeffs = ", ".join(repr(float(v)) for v in pl[:, p])
        dot = (
            f"list_aggregate(list_transform(list_zip({vec_expr}, [{coeffs}]), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Fraction of exact top-k pairs recovered by the ANN result."""
    e = exact.select("id_a", "id_b")
    a = approx.select("id_a", "id_b")
    hit = e.join(a, ["id_a", "id_b"], "left_semi").count()
    total = e.count()
    return hit / total if total else 1.0
