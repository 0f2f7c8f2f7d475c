"""Public clean_corpus operator (operators/cleaning.py): policy semantics on
a corpus engineered to distinguish them (exact dup, a near-dup chain where
one-pass and components policies genuinely differ, a low-quality doc), plus
stage composability. End-to-end value parity with DuckDB is covered by the
corpus_clean / corpus_clean_cc CORRECTNESS rows, which delegate here."""

import pytest
from pyspark.sql import functions as F

from geospatial_studio_pipelines_spark.operators import cleaning


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest where tall trees grow beside the river"
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, BASE),                                   # keeper of the chain
        (2, BASE.replace("runs", "walks")),          # near-dup of 1
        (3, BASE.replace("runs", "walks").replace("river", "creek")),  # near-dup of 2 (chain)
        (4, BASE),                                   # exact dup of 1
        (5, "completely different text about spark dataframes, shuffles and "
            "broadcast joins in a distributed query engine running at scale"),
        (6, "!!! ??? ..."),                          # fails the quality gate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_cc_policy_transitive(corpus):
    """Components policy: 2 and 3 both fold into 1's component even though
    (1,3) may never be a direct ≥threshold pair."""
    got = {r.doc_id for r in cleaning.clean_corpus(corpus, policy="cc").collect()}
    assert got == {1, 5}


def test_clean_corpus_pairs_policy_one_pass(corpus):
    """One-pass policy drops the higher id of each ≥threshold pair; doc 4
    (exact dup) never reaches the near-dup stage — exact dedup removed it."""
    got = {r.doc_id for r in cleaning.clean_corpus(corpus, policy="pairs").collect()}
    assert 1 in got and 5 in got and 4 not in got and 6 not in got
    # one-pass keeps no chain guarantee: survivors ⊆ {1, 5} ∪ maybe-chain-middles
    assert got - {1, 2, 3, 5} == set()


def test_clean_corpus_output_schema(corpus):
    out = cleaning.clean_corpus(corpus, policy="cc")
    assert out.columns == ["doc_id", "text", "lang_id", "quality"]


def test_clean_corpus_rejects_unknown_policy(corpus):
    with pytest.raises(ValueError, match="policy"):
        cleaning.clean_corpus(corpus, policy="magic")


def test_quality_gate_and_exact_unique_stages(corpus, spark):
    scored = cleaning.score_documents(corpus)
    assert {r.doc_id for r in scored.filter(F.col("quality") < 0.6).collect()} == {6}
    uniq = cleaning.exact_unique(scored)
    ids = {r.doc_id for r in uniq.collect()}
    assert 4 not in ids and 1 in ids  # min-id keeper per fingerprint
    # fingerprints are the FULL md5 digest
    assert all(len(r.fp) == 32 for r in uniq.collect())


def test_clean_corpus_custom_columns(spark):
    rows = [(10, BASE), (11, BASE)]
    df = spark.createDataFrame(rows, "img long, caption string")
    out = cleaning.clean_corpus(df, policy="pairs", id_col="img", text_col="caption")
    assert [r.img for r in out.collect()] == [10]
