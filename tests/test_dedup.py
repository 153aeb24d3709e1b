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


def test_simhash32_portable_matches_python_reference(spark):
    """Bit-for-bit agreement with an independent hashlib implementation
    (the same construction the DuckDB oracle of `simhash_portable`
    pins)."""
    import hashlib

    from sparkcollector.operators.dedup import simhash32_portable

    def ref(text: str) -> int:
        toks = set(text.split(" "))
        hashes = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        out = 0
        for i in range(32):
            vote = sum(1 if (h >> i) & 1 else -1 for h in hashes)
            if vote >= 0:
                out |= 1 << i
        return out

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "alpha beta  gamma",  # double space -> empty token, both sides
        "single",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", simhash32_portable(F.col("text")).alias("h")
        ).collect()
    }
    assert got == {i: ref(t) for i, t in enumerate(texts)}


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


def test_simhash_hamming_pairs_matches_bruteforce(spark):
    """Banded candidate generation finds EXACTLY the pairs a brute-force
    all-pairs bit_count(xor) scan finds, for max_hamming <= n_bands-1
    (pigeonhole guarantee)."""
    from sparkcollector.operators.dedup import simhash64, simhash_hamming_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = [
        (1, base),
        (2, base),                                   # identical -> hamming 0
        (3, base.replace("lazy", "sleepy")),         # tiny edit
        (4, base.replace("quick", "slow").replace("dog", "cat")),
        (5, "completely different text about spark shuffles and parquet files"),
        (6, "another unrelated document discussing iceberg snapshot logs"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_hamming_pairs(df, max_hamming=3, n_bands=4).collect()
    }

    # brute-force oracle: all pairs, bit_count(xor) <= 3
    h = df.select("doc_id", simhash64(F.col("text")).alias("h"))
    a = h.withColumnsRenamed({"doc_id": "doc_a", "h": "ha"})
    b = h.withColumnsRenamed({"doc_id": "doc_b", "h": "hb"})
    brute = {
        (r["doc_a"], r["doc_b"]): r["ham"]
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("ham"),
        )
        .filter(F.col("ham") <= 3)
        .collect()
    }
    assert got == brute
    assert got[(1, 2)] == 0  # identical docs collide exactly


def test_simhash_hamming_pairs_rejects_unguaranteed_distance(spark):
    import pytest

    from sparkcollector.operators.dedup import simhash_hamming_pairs

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="recall only for"):
        simhash_hamming_pairs(df, max_hamming=4, n_bands=4)


def test_dedup_clusters_transitive_closure(spark):
    from sparkcollector.operators.dedup import dedup_clusters

    # chain 1-2, 2-3 plus isolated pair 7-9: components {1,2,3}, {7,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a bigint, doc_b bigint"
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in dedup_clusters(pairs).collect()}
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        7: (7, True),
        9: (7, False),
    }


def test_dedup_clusters_long_chain_converges(spark):
    from sparkcollector.operators.dedup import dedup_clusters

    # path graph 0-1-...-9: diameter 9, all one component labeled 0
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a bigint, doc_b bigint"
    )
    out = dedup_clusters(pairs).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert sum(r["is_canonical"] for r in out) == 1


def test_duplicate_ngram_spans_merges_overlaps(spark):
    from sparkcollector.operators.dedup import duplicate_ngram_spans

    # docs 1 and 2 share the 7-token run "a b c d e f g" (doc 2 shifted);
    # doc 3 is unrelated.  n=5 -> starts {0,1,2} in doc 1 merge into one
    # span [0, 7); doc 2's copy sits at offset 2 -> span [2, 9).
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g x y"),
            (2, "p q a b c d e f g"),
            (3, "m n o r s t u v w"),
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_ngram_spans(df, n=5).collect()
    )
    assert out == [(1, 0, 7, 3), (2, 2, 9, 3)]


def test_duplicate_ngram_spans_distinct_spans_not_merged(spark):
    from sparkcollector.operators.dedup import duplicate_ngram_spans

    # two shared 5-gram runs separated by unique middles -> two spans
    shared1, shared2 = "h1 h2 h3 h4 h5", "t1 t2 t3 t4 t5"
    df = spark.createDataFrame(
        [
            (1, f"{shared1} u1 u2 u3 {shared2}"),
            (2, f"{shared1} v1 v2 v3 {shared2}"),
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(df, n=5).collect()
    )
    assert out == [(1, 0, 5), (1, 8, 13), (2, 0, 5), (2, 8, 13)]


def test_duplicate_ngram_spans_within_doc_repeat_not_cross(spark):
    from sparkcollector.operators.dedup import duplicate_ngram_spans

    # a doc repeating ITS OWN phrase is not cross-doc duplication
    df = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 r5 z r1 r2 r3 r4 r5"), (2, "a b c d e f g h")],
        "doc_id bigint, text string",
    )
    assert duplicate_ngram_spans(df, n=5).count() == 0


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from sparkcollector.skew import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int"
    )
    got = [
        r["z"]
        for r in df.select(zorder_key(F.col("x"), F.col("y"), bits=4).alias("z"))
        .collect()
    ]
    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z
    assert got == [morton(0, 0), morton(1, 0), morton(0, 1), morton(3, 5)]
    # locality sanity: (3,5) interleaves to 0b100111 = 39
    assert got[3] == 39


def test_levenshtein_block_join_blocks_and_thresholds(spark):
    from sparkcollector.operators.dedup import levenshtein_block_join

    df = spark.createDataFrame(
        [
            (1, "a", "the quick brown fox"),
            (2, "a", "the quick brown fix"),   # dist 1 within block
            (3, "a", "completely different"),
            (4, "b", "the quick brown fox"),   # same text, other block
        ],
        "doc_id bigint, source string, text string",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in levenshtein_block_join(
            df, block_col="source", prefix_len=20, max_dist=2
        ).collect()
    )
    # only the within-block near pair survives; cross-block identical
    # text never pairs (blocking), far text exceeds the threshold
    assert got == [(1, 2, 1)]


def test_binpack_files_cumulative_split(spark):
    """floor(exclusive_prefix/target) grouping: groups exceed target by
    at most one file; an oversized file gets its own group; packing is
    independent per partition column."""
    from sparkcollector.skew import binpack_files

    rows = [
        ("s1", 1, 500), ("s1", 2, 600), ("s1", 3, 700),
        ("s1", 4, 2000), ("s1", 5, 100),
        ("s2", 1, 100),
    ]
    df = spark.createDataFrame(rows, ["src", "fid", "sz"])
    got = {
        (r["src"], r["fid"]): r["group_id"]
        for r in binpack_files(
            df, "sz", "fid", target_bytes=1500, partition_col="src"
        ).collect()
    }
    # prefixes s1: 0,500,1100,1800,3800 -> groups 0,0,0,1,2
    assert got == {
        ("s1", 1): 0, ("s1", 2): 0, ("s1", 3): 0,
        ("s1", 4): 1, ("s1", 5): 2,
        ("s2", 1): 0,
    }


def test_range_partition_bounds_quartiles(spark):
    from sparkcollector.skew import range_partition_bounds

    # 100 rows of value v repeated v times-ish: known quartiles
    data = [(v,) for v in range(1, 101)]
    df = spark.createDataFrame(data, "n long")
    got = {
        r["boundary"]: r["bound"]
        for r in range_partition_bounds(df, "n", k=4).collect()
    }
    assert got == {1: 25, 2: 50, 3: 75}


def test_join_skew_report_identifies_hot_key(spark):
    from sparkcollector.skew import join_skew_report

    left = spark.createDataFrame(
        [(7,)] * 50 + [(1,)] * 2 + [(2,)] * 3, "k long"
    )
    right = spark.createDataFrame([(7,), (7,), (1,), (9,)], "k long")
    rows = join_skew_report(left, right, "k", k=2).collect()
    assert rows[0]["k"] == 7
    assert rows[0]["est_rows"] == 100  # 50 * 2
    assert rows[1]["k"] == 1 and rows[1]["est_rows"] == 2
    # key 9 never appears (no left rows), key 2 (no right rows)
    assert all(r["k"] in (7, 1) for r in rows)


def test_dedup_rate_by_source(spark):
    from sparkcollector.operators.dedup import dedup_rate_by_source

    rows = [
        ("crawl", "same text"), ("crawl", "same text"), ("crawl", "other"),
        ("books", "unique one"), ("books", "unique two"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in dedup_rate_by_source(df).collect()}
    assert got["crawl"]["n_docs"] == 3 and got["crawl"]["n_distinct"] == 2
    assert got["crawl"]["n_duplicates"] == 1
    assert got["books"]["dup_rate"] == 0.0


def test_partition_balance_report_uniform_keys(spark):
    from sparkcollector.skew import partition_balance_report

    df = spark.createDataFrame([(i,) for i in range(6400)], "k long")
    rows = partition_balance_report(df, "k", n_partitions=8).collect()
    assert len(rows) == 8
    assert sum(r["n_rows"] for r in rows) == 6400
    # md5 spreads uniformly: every partition within 2x of the mean
    sk = rows[0]["skew_factor"]
    assert sk < 2.0
    assert all(abs(r["vs_mean"]) < 2.0 for r in rows)


def test_dedup_keep_best_policy(spark):
    from sparkcollector.operators.dedup import dedup_keep_best

    rows = [
        (1, "same text", 5.0), (2, "same text", 9.0),  # keep id 2
        (3, "same text", 9.0),                          # tie -> min id 2
        (4, "unique", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    got = {r["doc_id"]: r for r in dedup_keep_best(df, "score").collect()}
    assert set(got) == {2, 4}
    assert got[2]["n_copies"] == 3 and got[2]["kept_score"] == 9.0


def test_dedup_keep_best_string_ids(spark):
    # content ids are commonly strings (urls, uuids); the min-id
    # tie-break must use the id's native ordering, not numeric negation
    from sparkcollector.operators.dedup import dedup_keep_best

    rows = [
        ("url-b", "same text", 9.0), ("url-a", "same text", 9.0),
        ("url-c", "same text", 2.0), ("url-z", "unique", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, score double")
    got = {r["doc_id"]: r for r in dedup_keep_best(df, "score").collect()}
    assert set(got) == {"url-a", "url-z"}
    assert got["url-a"]["n_copies"] == 3 and got["url-a"]["kept_score"] == 9.0


def test_dup_cluster_histogram_shares(spark):
    from sparkcollector.operators.dedup import dup_cluster_histogram

    rows = [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "text string")
    got = {r["cluster_size"]: r for r in dup_cluster_histogram(df).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[2]["n_clusters"] == 1
    assert got[1]["n_clusters"] == 1
    assert abs(sum(r["corpus_share"] for r in got.values()) - 1.0) < 1e-9


def test_join_strategy_advisor_rules(spark):
    from pyspark.sql import functions as F

    from sparkcollector.skew import join_strategy_advisor

    left = spark.createDataFrame(
        [(i % 10, 1000) for i in range(100)], "k long, b long"
    )
    small = spark.createDataFrame([(i, 10) for i in range(10)], "k long, b long")
    r = join_strategy_advisor(
        left, small, "k", F.col("b"), F.col("b")
    ).collect()[0]
    assert r["strategy"] == "broadcast_right"
    # neither side fits + hot key -> salted
    hot = spark.createDataFrame(
        [(7, 1000)] * 90 + [(i, 1000) for i in range(10)], "k long, b long"
    )
    big = spark.createDataFrame(
        [(i % 10, 1000) for i in range(50)], "k long, b long"
    )
    r2 = join_strategy_advisor(
        hot, big, "k", F.col("b"), F.col("b"), broadcast_threshold=100
    ).collect()[0]
    assert r2["strategy"] == "shuffle_salted"
    assert r2["big_side_skew"] > 8.0


def test_fulltext_edit_dups_blocks_and_caps(spark):
    from sparkcollector.operators.dedup import fulltext_edit_dups

    pfx = "p" * 32
    rows = [
        (1, pfx + " tail one"),
        (2, pfx + " tail two"),      # dist 3 from doc 1
        (3, "q" * 32 + " other"),    # different block
        # hot block of 3 > max_block=2 -> dropped entirely
        (4, "h" * 32 + " a"),
        (5, "h" * 32 + " b"),
        (6, "h" * 32 + " c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = fulltext_edit_dups(
        df, block_prefix=32, max_dist=16, max_block=2
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"], r["dist"]) == (1, 2, 3)


def test_containment_pairs_quote_inclusion(spark):
    from sparkcollector.operators.dedup import containment_pairs

    rows = [
        (1, "a b c d"),              # 2 shingles, both inside doc 2
        (2, "a b c d e f"),          # 4 shingles
        (3, "x y z w v u"),          # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_pairs(df, threshold=0.6).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["common"]) == (1, 2, 2)
    # short doc fully contained: cont_a = 1.0 while jaccard is only 0.5
    assert r["cont_a"] == 1.0 and r["cont_b"] == 0.5
    assert r["max_containment"] == 1.0


def test_ngram_novelty_first_occurrence(spark):
    from sparkcollector.operators.dedup import ngram_novelty

    rows = [
        (1, "a b c d"),        # shingles {abc, bcd}: both first here
        (2, "a b c d e"),      # {abc, bcd, cde}: only cde novel
        (3, "a b c d"),        # all seen -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert got[1]["n_novel"] == 2 and got[1]["novelty_rate"] == 1.0
    assert got[2]["n_novel"] == 1 and abs(got[2]["novelty_rate"] - 1 / 3) < 1e-3
    assert got[3]["n_novel"] == 0 and got[3]["novelty_rate"] == 0.0


def test_incremental_dedup_cross_side_only(spark):
    from sparkcollector.operators.dedup import incremental_dedup

    corpus_text = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (1, corpus_text),                     # corpus
        (2, corpus_text + " extra tail"),     # corpus near-dup of 1
        (10, corpus_text),                    # new: exact dup of corpus
        (11, "completely different words that match nothing at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_new"]: r for r in incremental_dedup(df, 5, threshold=0.5).collect()}
    # 10 matches corpus; best (jaccard 1.0) is doc 1, tie-break not needed
    assert 10 in got and got[10]["dup_of"] == 1 and got[10]["jaccard"] == 1.0
    # 11 is novel -> absent; corpus pair (1,2) must NOT appear
    assert 11 not in got and set(got) == {10}


def test_incremental_dedup_keep_best_tie_break(spark):
    from sparkcollector.operators.dedup import incremental_dedup

    t = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, t), (2, t), (20, t)]  # two identical corpus docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = incremental_dedup(df, 10, threshold=0.5).collect()
    assert len(got) == 1
    # equal jaccard 1.0 to docs 1 and 2 -> min id wins
    assert got[0]["dup_of"] == 1 and got[0]["jaccard"] == 1.0


def test_winnowing_guarantee_shared_substring(spark):
    from sparkcollector.operators.dedup import winnowing_fingerprints

    # docs 1/2 share a 60-char run (>> k+w-1 = 11) -> must pair;
    # doc 3 is unrelated -> no pair with 1 or 2
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "intro text one " + shared + " outro alpha"),
        (2, "совсем different start " + shared + " ending beta"),
        (3, "nothing in common here at all, entirely distinct words "
            "zebra quokka xylophone marimba accordion"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["shared_fingerprints"]
           for r in winnowing_fingerprints(
               df, "doc_id", "text", min_shared=3).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 3
    assert (1, 3) not in out and (2, 3) not in out


def test_winnowing_short_docs_skipped(spark):
    from sparkcollector.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, text string"
    )
    assert winnowing_fingerprints(df, "doc_id", "text").count() == 0


def test_cdc_chunks_survive_insertion(spark):
    from sparkcollector.operators.dedup import cdc_chunk_dedup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill nearby every day "
            "and the birds sing in the tall green trees above")
    edited = "INSERTED PREFIX " + base  # shifts every byte
    other = ("completely unrelated content about database engines "
             "and query optimizers and shuffle partitioning nothing "
             "shared with the fox document at all in any way")
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(
        df, "doc_id", "text").collect()}
    # content-defined boundaries realign after the insertion: the
    # edited doc still shares most chunks with the original
    assert out[1]["dup_ratio"] > 0.5
    assert out[2]["dup_ratio"] > 0.4
    assert out[3]["dup_ratio"] == 0.0


def test_cdc_fixed_chunking_counterfactual(spark):
    """The same insertion breaks FIXED chunking completely — the
    reason content-defined exists."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill nearby every day "
            "and the birds sing in the tall green trees above")
    edited = "INSERTED PREFIX " + base
    fixed = lambda s: {s[i:i + 32] for i in range(0, len(s), 32)}  # noqa: E731
    assert len(fixed(base) & fixed(edited)) <= 1


def test_jaro_winkler_reference_values(spark):
    from sparkcollector.operators.dedup import jaro_winkler_pairs

    # canonical Winkler 1990 worked examples + boost-threshold edges
    rows = [
        (1, "MARTHA", "MARHTA"),      # 0.961111
        (2, "DIXON", "DICKSONX"),     # 0.813333
        (3, "JELLYFISH", "SMELLYFISH"),  # no common prefix: jaro only
        (4, "abc", "xyz"),            # 0
        (5, "abc", "abc"),            # 1
        (6, "abcd", "abzzzzzzzz"),    # jaro 0.5667 < 0.7: NO boost
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    out = {r["id"]: r for r in jaro_winkler_pairs(df, "a", "b").collect()}
    assert abs(out[1]["jw_similarity"] - 0.961111) < 1e-6
    assert abs(out[2]["jw_similarity"] - 0.813333) < 1e-6
    assert abs(out[3]["jw_similarity"] - 0.896296) < 1e-6
    assert out[4]["jw_similarity"] == 0.0
    assert out[5]["jw_similarity"] == 1.0 and out[5]["jw_match"]
    assert abs(out[6]["jw_similarity"] - 0.566667) < 1e-6
    assert not out[6]["jw_match"]
