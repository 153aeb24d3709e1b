"""Text analysis + multiline reassembly semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcollector.operators.reassembly import reassemble_multiline
from sparkcollector.operators.textstats import (
    FP_BASE,
    FP_MOD,
    char_fingerprint,
    language_id,
    quality_band,
    quality_features,
    token_count_bpe,
    word_fingerprints,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], ["text"])


def test_language_id(spark):
    cases = {
        "the cat and the dog is in it": "en",
        "der hund ist nicht mit der katze": "de",
        "le chat est dans les jardins pour un moment": "fr",
        "el perro y el gato en una casa": "es",
        "zzz qqq xxx": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], ["text"])
    got = {
        r["text"]: r["lang"]
        for r in df.select("text", language_id(F.col("text")).alias("lang")).collect()
    }
    assert got == cases


def test_token_count_bpe(spark):
    r = _one(spark, "hello, world! x2").select(
        token_count_bpe(F.col("text")).alias("n")
    ).collect()[0]
    # hello , world ! x 2  -> 6
    assert r["n"] == 6


def test_quality_features_and_band(spark):
    text = "the cat sat on the mat with a hat " * 4  # 36 words, repetitive
    f = quality_features(_one(spark, text.strip())).collect()[0]
    assert f["n_words"] == 36
    assert 0 < f["stopword_ratio"] < 1
    assert f["distinct_ratio"] == round(8 / 36, 4)
    band = (
        _one(spark, text.strip())
        .select(
            quality_band(
                F.lit(36), F.lit(0.3), F.lit(round(8 / 36, 4))
            ).alias("b")
        )
        .collect()[0]["b"]
    )
    assert band == "ok"
    short = quality_band(F.lit(3), F.lit(0.3), F.lit(0.9))
    assert _one(spark, "x").select(short.alias("b")).collect()[0]["b"] == "len_outlier"


def test_char_fingerprint_matches_python(spark):
    text = "abc xyz"
    expected = 0
    for ch in text:
        expected = (expected * FP_BASE + ord(ch)) % FP_MOD
    got = _one(spark, text).select(char_fingerprint(F.col("text")).alias("fp")).collect()[0]["fp"]
    assert got == expected


def test_word_fingerprints_window_count(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _one(spark, text).select(
        F.size(word_fingerprints(F.col("text"), k=5)).alias("n")
    ).collect()[0]["n"]
    assert got == 6  # 10 - 5 + 1
    # identical windows hash identically
    t2 = "a b c d e a b c d e"
    fps = _one(spark, t2).select(word_fingerprints(F.col("text"), k=5).alias("f")).collect()[0]["f"]
    assert fps[0] == fps[5]


def test_reassemble_multiline(spark):
    lines = [
        ("f1", 1, "START record one"),
        ("f1", 2, "  continuation a"),
        ("f1", 3, "  continuation b"),
        ("f1", 4, "START record two"),
        ("f2", 1, "orphan head line"),
        ("f2", 2, "START solo"),
    ]
    df = spark.createDataFrame(lines, ["file", "offset", "line"])
    out = {
        (r["file"], r["record_id"]): r
        for r in reassemble_multiline(df, r"^START").collect()
    }
    assert out[("f1", 1)]["record"] == "START record one\n  continuation a\n  continuation b"
    assert out[("f1", 1)]["n_lines"] == 3
    assert out[("f1", 2)]["record"] == "START record two"
    # head fragment before any start-match becomes record 0
    assert out[("f2", 0)]["record"] == "orphan head line"
    assert out[("f2", 1)]["record"] == "START solo"


def test_tokenizer_fertility_exact_ratios(spark):
    from sparkcollector.operators.textstats import tokenizer_fertility

    # "the and of" -> en, 3 words, 3 bpe tokens; "hello, world" -> und
    df = spark.createDataFrame(
        [("the and of",), ("xx yy, zz!",)], "text string"
    )
    got = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = got["en"]
    assert en["total_words"] == 3 and en["total_tokens"] == 3
    assert en["fertility"] == 1.0
    und = got["und"]
    assert und["total_words"] == 3 and und["total_tokens"] == 5


def test_quality_ensemble_votes(spark):
    from sparkcollector.operators.textstats import quality_ensemble

    good = (
        "the quick brown fox and the lazy dog ran to the old barn "
        "while birds sang softly over green fields near a quiet river"
    )
    short = "too short"
    loops = "spam " * 60  # length ok but duplication fails + no stopwords
    df = spark.createDataFrame(
        [(1, good.strip()), (2, short), (3, loops.strip())],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_ensemble(df).collect()}
    assert got[1]["keep"] and got[1]["votes"] == 4
    assert not got[2]["keep"] and not got[2]["len_ok"]
    assert not got[3]["keep"] and not got[3]["dup_ok"]


def test_code_prose_ratio_cues(spark):
    from sparkcollector.operators.textstats import code_prose_ratio

    code_doc = "def main():\n    x = compute()\nreturn x;\nplain words"
    prose_doc = "this is simply prose\nwith two lines"
    df = spark.createDataFrame(
        [(1, code_doc), (2, prose_doc)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in code_prose_ratio(df).collect()}
    assert got[1]["n_code_lines"] == 3 and got[1]["n_lines"] == 4
    assert got[2]["n_code_lines"] == 0 and got[2]["code_ratio"] == 0.0


def test_conv_language_purity_mixed(spark):
    from sparkcollector.operators.textstats import conv_language_purity

    rows = [
        ("c1", "the cat and the dog is here"),
        ("c1", "der hund ist nicht mit der katze"),
        ("c1", "the dog and the cat in it"),
        ("c2", "el perro y el gato en una casa"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    got = {r["conv_id"]: r for r in conv_language_purity(df).collect()}
    c1 = got["c1"]
    assert c1["mixed"] and c1["n_langs"] == 2
    assert c1["dominant_lang"] == "en"
    assert abs(c1["dominant_share"] - 2 / 3) < 1e-6
    assert not got["c2"]["mixed"] and got["c2"]["dominant_lang"] == "es"


def test_nonascii_audit_flags(spark):
    from sparkcollector.operators.textstats import nonascii_audit

    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, "ééééé"), (3, "mix é end")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nonascii_audit(df, max_share=0.3).collect()}
    assert got[1]["n_nonascii"] == 0 and not got[1]["suspect"]
    assert got[2]["nonascii_share"] == 1.0 and got[2]["suspect"]
    assert got[3]["n_nonascii"] == 1 and not got[3]["suspect"]


def test_charclass_profile_shares(spark):
    from sparkcollector.operators.textstats import charclass_profile

    # "ab 12!" -> 6 chars: 2 letters, 2 digits, 1 space, 1 other
    df = spark.createDataFrame(
        [("s", "ab 12!")], "source string, text string"
    )
    r = charclass_profile(df, "source").collect()[0]
    assert r["n_chars"] == 6
    assert abs(r["letter_share"] - round(2 / 6, 6)) < 1e-9
    assert abs(r["digit_share"] - round(2 / 6, 6)) < 1e-9
    assert abs(r["space_share"] - round(1 / 6, 6)) < 1e-9
    assert abs(r["other_share"] - round(1 / 6, 6)) < 1e-9


def test_word_entropy_by_source_closed_form(spark):
    from sparkcollector.operators.textstats import word_entropy_by_source

    rows = [
        (1, "s", "a a b b"),      # H = 1 bit
        (2, "s", "a a a a"),      # H = 0 bits
        (3, "t", "a b c d"),      # H = 2 bits
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in word_entropy_by_source(df, low_bits=1.5).collect()}
    assert got["s"]["n_docs"] == 2
    assert abs(got["s"]["mean_entropy_bits"] - 0.5) < 1e-6
    assert got["s"]["low_entropy_share"] == 1.0       # both below 1.5
    assert abs(got["t"]["mean_entropy_bits"] - 2.0) < 1e-6
    assert got["t"]["low_entropy_share"] == 0.0


def test_mattr_diversity_hand_computed(spark):
    from sparkcollector.operators.textstats import mattr_diversity

    rows = [(1, "a b a b a b"),    # w=2: five windows, all distinct=2
            (2, "a a a a"),        # w=2: three windows, distinct=1
            (3, "a b a")]          # shorter than window -> plain TTR
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           mattr_diversity(df, window=2).collect()}
    assert got[1]["mattr"] == 1.0 and got[1]["n_tokens"] == 6
    assert got[2]["mattr"] == 0.5
    assert got[3]["n_tokens"] == 3
    got3 = mattr_diversity(df, window=5).collect()
    ttr = {r["doc_id"]: r["mattr"] for r in got3}
    assert abs(ttr[3] - round(2 / 3, 6)) < 1e-12


def test_secret_entropy_scan_flags_random_not_padding(spark):
    from sparkcollector.operators.textstats import secret_entropy_scan

    rows = [
        (1, "hello a1b2c3d4e5f60718293a4b5c6d7e8f world"),  # hex-ish, high H
        (2, "pad xxxxxxxxxxxxxxxxxxxxxxxx pad"),            # zero entropy
        (3, "no candidates here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = secret_entropy_scan(df, "text").collect()
    by_id = {r["id"]: r for r in got}
    assert by_id[1]["is_secret"] and by_id[1]["entropy_bits"] > 3.0
    assert not by_id[2]["is_secret"] and by_id[2]["entropy_bits"] == 0.0
    assert 3 not in by_id and len(got) == 2


def test_good_turing_known_table(spark):
    from sparkcollector.operators.textstats import good_turing

    # corpus: a a a b b c d e -> N_1=3 (c,d,e), N_2=1 (b), N_3=1 (a), N=8
    df = spark.createDataFrame([("a a a b b c d e",)], "text string")
    got = {r["r"]: r for r in good_turing(df, "text").collect()}
    assert got[1]["n_r"] == 3 and got[2]["n_r"] == 1 and got[3]["n_r"] == 1
    assert got[1]["n_total"] == 8
    # r*=1: (1+1)*N_2/N_1 = 2/3; r*=2: 3*N_3/N_2 = 3; r=3: no N_4 -> NULL
    assert abs(got[1]["r_star"] - 2 / 3) < 1e-5
    assert abs(got[2]["r_star"] - 3.0) < 1e-6
    assert got[3]["r_star"] is None
    assert abs(got[1]["p_r"] - 3 / 8) < 1e-6


def test_readability_indices_known_text(spark):
    from sparkcollector.operators.textstats import readability_indices

    # 2 sentences, 6 words, letters=26, poly: "dictionary" (4 groups),
    # "beautiful" (eau+i+u? -> groups: eau, i, u = 3)
    df = spark.createDataFrame(
        [(1, "the dictionary is big. beautiful code."), (2, "   ")],
        "id long, text string",
    )
    got = {r["id"]: r for r in readability_indices(df, "text").collect()}
    r = got[1]
    assert r["n_sentences"] == 2 and r["n_words"] == 6
    assert r["n_polysyllables"] == 2
    import math
    assert abs(r["smog"] - (1.043 * math.sqrt(2 * 30 / 2) + 3.1291)) < 1e-3
    assert got[2]["smog"] is None and got[2]["n_words"] is None


def test_acronym_pairs_validates_initials(spark):
    from sparkcollector.operators.textstats import acronym_pairs

    rows = [
        (1, "we train a Large Language Model (LLM) on data"),
        (2, "random words here (XYZ) that do not match"),
        (3, "two hits: Central Processing Unit (CPU) and a "
            "Solid State Drive (SSD) too"),
        (4, "lowercase large language model (LLM) still matches"),
        (5, "no parens at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["acronym"]): r["expansion"]
           for r in acronym_pairs(df, "doc_id", "text").collect()}
    assert out[(1, "LLM")] == "Large Language Model"
    assert out[(3, "CPU")] == "Central Processing Unit"
    assert out[(3, "SSD")] == "Solid State Drive"
    assert out[(4, "LLM")] == "large language model"
    assert not any(k[0] in (2, 5) for k in out)
