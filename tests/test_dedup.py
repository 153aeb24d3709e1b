"""Dedup operators: exact groups, shingles, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcollector.operators.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    shingles,
    simhash64,
    simhash_dup_candidates,
)


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["keep_doc_id"]: r["n_copies"] for r in exact_dup_groups(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["sh"] for r in shingles(df, n=3).collect()}
    assert 1 not in out
    assert out[2] == ["a b c", "b c d"]


def test_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5"), (3, "x y z q r")],
        ["doc_id", "text"],
    )
    out = jaccard_pairs(df, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"], r["jaccard"]) == (1, 2, 1.0)


def test_simhash64_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely unrelated content here"),
        ],
        ["doc_id", "text"],
    )
    h = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()}
    assert h[1] == h[2]          # identical text -> identical hash
    assert h[1] != h[3]          # different text -> (a.s.) different hash
    # deterministic across evaluations
    h2 = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()}
    assert h == h2


def test_simhash_dup_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (5, "alpha beta gamma delta epsilon"),
            (9, "zeta eta theta iota kappa"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_dup_candidates(df).collect()}
    assert pairs == {(1, 2), (1, 5), (2, 5)}


def test_jaccard_df_cap_drops_ubiquitous_shingle(spark):
    """A shingle present in every doc is dropped by the df cap; the
    Observation records the drop for lineage metrics."""
    from pyspark.sql import Observation

    # every doc shares the stop-phrase shingle "a b c"; pairs (1,2)
    # additionally share all of "a b c d e".
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "a b c x y"),
            (4, "a b c p q"),
        ],
        ["doc_id", "text"],
    )
    obs = Observation("jaccard_cap")
    out = jaccard_pairs(df, threshold=0.5, max_df=3, observation=obs).collect()
    # (1,2) still found via their other shingles ("b c d", "c d e",
    # df=2 <= cap); the estimate is conservative: common drops from 3
    # to 2 while set sizes stay 3, so jaccard = 2/(3+3-2) = 0.5
    # instead of the exact 1.0.  Pairs sharing ONLY the dropped
    # stop-phrase shingle ((1,3), (3,4), ...) vanish entirely.
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [(1, 2, 0.5)]
    assert obs.get["shingles_dropped"] == 1
    assert obs.get["postings_total"] >= 1


def test_jaccard_df_cap_disabled_is_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"]
    )
    out = jaccard_pairs(df, threshold=0.5, max_df=None).collect()
    assert out[0]["jaccard"] == 1.0
