"""End-to-end training-corpus cleaning as a composable public operator.

The pipeline the LLM-data literature runs daily at 10^12-doc scale:

    quality gate → language ID → exact dedup → near-dup drop

Previously this lived only inside ``contracts.q_corpus_clean*`` as oracle
queries; :func:`clean_corpus` makes it callable without reading the
contract file, with the SAME semantics (both queries now delegate here, so
the DuckDB oracle rows gate this module directly).

Scale shape (each stage and why it survives 100 TB):

* scoring — pure codegen expressions (``functions.text``), no UDF, no
  shuffle; the quality filter runs before anything pays a shuffle.
* exact dedup — groupBy on the FULL 128-bit md5 fingerprint (a 64-bit
  truncation expects ~2.7e4 birthday collisions at 10^12 docs, each one a
  silently deleted unique doc) + keeper semi-join. Two hash exchanges on
  slim columns.
* near-dup pairs — MinHash-banded candidates verified by exact n-gram
  jaccard (``dedup.ngram_jaccard_pairs``): single shingling pass, one
  banding shuffle, canonical-collision pair dedup.
* drop policy — ``"pairs"``: drop the HIGHER id of every ≥threshold pair
  (deterministic one-pass; no guarantee about chains). ``"cc"``: connected
  components over the pair graph, keep the MIN id per component — the
  standard transitive-closure keeper selection (A~B, B~C drops B and C in
  favor of A even though A,C were never paired). CC runs over the PAIR
  GRAPH only (≪ corpus) with pointer-doubled min-label propagation,
  O(log diameter) rounds, one pair-graph-sized shuffle per round.

Reference parity: the reference has no dedup/cleaning at all (it processes
unique tasked imagery); this surface is mandated by the build brief's
training-data-pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from . import dedup

__all__ = ["score_documents", "exact_unique", "clean_corpus"]


def score_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stage 1: per-document metadata — language guess, quality score, and
    the full-md5 fingerprint. Pure codegen expressions; no shuffle."""
    return docs.select(
        id_col,
        text_col,
        T.lang_id(F.col(text_col)).alias("lang_id"),
        T.quality_score(F.col(text_col)).alias("quality"),
        T.fingerprint(F.col(text_col)).alias("fp"),
    )


def exact_unique(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 2: exact dedup — keep the MIN id per fingerprint group via a
    keeper semi-join (never collects; both sides shuffle on slim keys)."""
    keepers = scored.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return scored.join(keepers, id_col, "left_semi")


def clean_corpus(
    docs: DataFrame,
    policy: str = "cc",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Run the full cleaning pipeline; returns the SURVIVING corpus as
    ``(id_col, text_col, lang_id, quality)``.

    ``policy="cc"`` — connected-components keeper selection (transitive
    closure, keep min id per component). ``policy="pairs"`` — one-pass drop
    of the higher id of every near-dup pair. Both policies are oracle-gated
    end-to-end against DuckDB (``corpus_clean`` / ``corpus_clean_cc``
    CORRECTNESS rows run through this function).
    """
    if policy not in ("cc", "pairs"):
        raise ValueError(f"unknown policy {policy!r}: use 'cc' or 'pairs'")
    scored = score_documents(docs, id_col=id_col, text_col=text_col)
    uniq = exact_unique(scored.filter(F.col("quality") >= min_quality), id_col)
    pairs = dedup.ngram_jaccard_pairs(
        uniq.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        threshold=jaccard_threshold,
    )
    if policy == "pairs":
        # no .distinct(): the left-anti join below is insensitive to
        # right-side duplicates, so deduping dropped ids was a pure extra
        # exchange over the pair set (r7; pinned by a plan-contract test)
        dropped = pairs.select(F.col("id_b").alias(id_col))
    else:
        cc = dedup.connected_components(pairs)
        dropped = (
            cc.filter(F.col("component") != F.col("doc_id"))
            .select(F.col("doc_id").alias(id_col))
        )
    return uniq.join(dropped, id_col, "left_anti").select(
        id_col, text_col, "lang_id", "quality"
    )
