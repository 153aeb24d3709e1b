"""Text analysis for training-data pipelines: language ID, quality
scoring, tokenization, content fingerprinting.

All pure Catalyst (split / regexp_extract_all / aggregate HOFs) so the
work stays JVM-side and scales with the scan; nothing here shuffles.

These are the training-data ops the build brief mandates beyond the
reference's own operator set; the quality/ratio style follows the
reference's filter-metric spirit (ratios + threshold bands) while the
fingerprint is a Rabin-Karp-style rolling polynomial hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (public-knowledge word lists).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es": ("el", "la", "y", "de", "que", "en", "un", "una", "es", "los"),
}

TOKEN_RE = r"[a-zA-Z]+|\d+|[^a-zA-Z\d\s]"
"""BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
the standard GPT-2-style pre-tokenization shape, minus unicode classes."""

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def language_id(text: Column) -> Column:
    """Best-scoring language by stopword-hit count; 'und' (undetermined)
    when no profile scores >0.  Ties break by profile order."""
    toks = tokens(F.lower(text))

    def hit(words: tuple[str, ...]):
        # NB: no extra lambda params — PySpark HOFs bind a Column to
        # every parameter of the lambda, including defaults.
        return lambda t: t.isin(*words)

    scores = [
        (lang, F.size(F.filter(toks, hit(words))))
        for lang, words in LANG_PROFILES.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((s > 0) & (s == best_score), lang).otherwise(out)
    return out


def token_count_bpe(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality feature columns.

    n_words, n_chars, mean_word_len, stopword_ratio (en), punct_ratio,
    digit_ratio, distinct_ratio — the standard cheap quality filters.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    stop = F.size(F.filter(F.transform(toks, F.lower), lambda x: x.isin(*LANG_PROFILES["en"])))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"\d"), 0))
    return df.select(
        "*",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        F.round((n_chars - n_words + 1).cast("double") / n_words, 4).alias(
            "mean_word_len"
        ),
        F.round(stop.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(n_digit.cast("double") / n_chars, 4).alias("digit_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_words, 4).alias(
            "distinct_ratio"
        ),
    )


def quality_band(
    n_words: Column,
    stopword_ratio: Column,
    distinct_ratio: Column,
    min_words: int = 20,
    max_words: int = 200,
) -> Column:
    """Coarse keep/flag banding over the features (filter-processor
    style: first matching exclusion wins, default ok)."""
    return (
        F.when(~n_words.between(min_words, max_words), "len_outlier")
        .when(distinct_ratio < 0.2, "repetitive")
        .when(stopword_ratio > 0.6, "boilerplate")
        .otherwise("ok")
    )


def char_fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over characters (Rabin-Karp shape):
    acc = (acc*31 + ascii(char)) mod 1e9+7.  Pure integer arithmetic —
    stays within long range at every step, reproducible anywhere."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def word_fingerprints(text: Column, k: int = 5) -> Column:
    """Array of k-word window fingerprints (document fingerprinting /
    winnowing input): hash each word, then roll a k-window polynomial.

    Window i covers words [i, i+k); output length = n_words - k + 1.
    """
    word_hashes = F.transform(
        tokens(text), lambda w: F.pmod(F.xxhash64(w), F.lit(FP_MOD))
    )
    n = F.size(word_hashes)
    return F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.aggregate(
            F.slice(word_hashes, i + 1, k),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * FP_BASE + h) % FP_MOD,
        ),
    )


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility audit by detected language — tokens per
    word and characters per token under the BPE-ish pre-tokenizer
    (the efficiency report run before locking a vocab: high fertility
    marks languages the tokenizer serves poorly, a standard
    multilingual-corpus health metric).

    Ratios are computed as ONE division of two exact integer sums per
    language (engine-portable — no averaging of per-doc floats), in a
    single grouped pass over per-doc integer counts.
    """
    t = F.col(text_col)
    per_doc = df.select(
        language_id(t).alias("lang"),
        F.size(tokens(t)).cast("long").alias("n_words"),
        token_count_bpe(t).cast("long").alias("n_bpe"),
        F.length(t).cast("long").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe").alias("total_tokens"),
        F.round(F.sum("n_bpe") / F.sum("n_words"), 6).alias("fertility"),
        F.round(F.sum("n_chars") / F.sum("n_bpe"), 6).alias(
            "chars_per_token"
        ),
    )


def quality_ensemble(
    df: DataFrame,
    text_col: str = "text",
    min_votes: int = 3,
) -> DataFrame:
    """Ensemble quality vote (Gopher-style rule composition: no single
    heuristic is trusted alone — a doc stays if it passes at least
    ``min_votes`` of the independent signals):

      1. length band: 20..2000 whitespace tokens
      2. stopword presence: >= 5% of tokens are English stopwords
      3. low duplication: distinct/total token ratio >= 0.5
      4. sane word length: mean token length in [2, 12] chars

    All four signals are in-row array HOFs — zero shuffle; the vote
    is a sum of casts.  Output keeps each signal so a curator can
    audit WHY a doc dropped.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / n
    s1 = (n >= 20) & (n <= 2000)
    s2 = stop.cast("double") / n >= 0.05
    s3 = distinct_ratio >= 0.5
    s4 = (mean_len >= 2.0) & (mean_len <= 12.0)
    votes = (
        s1.cast("int") + s2.cast("int") + s3.cast("int") + s4.cast("int")
    )
    return df.select(
        "*",
        s1.alias("len_ok"),
        s2.alias("stopword_ok"),
        s3.alias("dup_ok"),
        s4.alias("wordlen_ok"),
        votes.alias("votes"),
        (votes >= min_votes).alias("keep"),
    )


def code_prose_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Code-vs-prose line mix per document (the modality split a
    pretraining mixture needs per doc, without a classifier): a line
    "looks like code" if it matches cheap syntactic cues — leading
    indentation, braces/semicolon endings, assignment with ``=``,
    ``def``/``import``-style keywords.

    Pure in-row line HOFs (split + filter), zero shuffle; the cues
    are a heuristic tier — a real classifier slots in upstream, this
    is the cheap always-on audit.
    """
    lines = F.split(F.col(text_col), "\n")
    is_code = (
        lambda l: l.rlike(
            r"^(\s{2,}|\t)"
            r"|[{};]\s*$"
            r"|^\s*(def |import |return |class |for |if |while )"
            r"|^\s*\w+\s*=\s*\S"
        )
    )
    n_lines = F.size(lines)
    n_code = F.size(F.filter(lines, is_code))
    return df.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        n_code.cast("long").alias("n_code_lines"),
        F.round(n_code.cast("double") / n_lines, 6).alias("code_ratio"),
    )


def conv_language_purity(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Conversation language purity (multilingual-QA flag: a
    conversation whose turns disagree on language is either
    code-switching or corrupted): per conversation — distinct
    detected languages, the dominant language and its turn share,
    and the mixed flag.

    Language ID per turn is in-row HOFs; per-(conv, lang) counts
    collapse before the deterministic dominant-argmax (max count,
    ties to the alphabetically-first language).
    """
    lang = language_id(F.col(text_col))
    counts = df.select(
        F.col(conv_col), lang.alias("_lang")
    ).groupBy(conv_col, "_lang").agg(F.count("*").alias("_n"))
    # dominant = max count, ties to alphabetically-first language:
    # min over (-n, lang) structs is that argmax, deterministically
    per_conv = counts.groupBy(conv_col).agg(
        F.count("*").alias("n_langs"),
        F.sum("_n").alias("_turns"),
        F.min(
            F.struct(
                (-F.col("_n")).alias("negn"), F.col("_lang").alias("l")
            )
        ).alias("_b"),
    )
    return per_conv.select(
        conv_col,
        "n_langs",
        F.col("_b")["l"].alias("dominant_lang"),
        F.round(
            (-F.col("_b")["negn"]).cast("double") / F.col("_turns"), 6
        ).alias("dominant_share"),
        (F.col("n_langs") > 1).alias("mixed"),
    )


def nonascii_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_share: float = 0.3,
) -> DataFrame:
    """Non-ASCII share audit (the mojibake / encoding-corruption
    detector: legitimate multilingual text has SOME non-ASCII, a
    double-decoded mess is drenched in it): per doc — character
    count, non-ASCII count and share, plus the over-threshold flag.

    The count comes from length(text) - length(ascii-only filter)
    via regexp_replace — pure codegen string ops, zero shuffle.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    ascii_only = F.regexp_replace(t, r"[^\x00-\x7F]", "")
    n_non = n_chars - F.length(ascii_only)
    share = F.when(
        n_chars > 0, n_non.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        n_chars.cast("long").alias("n_chars"),
        n_non.cast("long").alias("n_nonascii"),
        F.round(share, 6).alias("nonascii_share"),
        (share > max_share).alias("suspect"),
    )


def charclass_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Character-class mix per group: shares of letters, digits,
    spaces, and everything else (punctuation/symbols/non-ASCII) in
    the byte stream.  The cheapest structural fingerprint of a feed —
    a log-like source shows a digit/punct spike, templated prose a
    flat profile; drift here catches format changes before any parser
    breaks.

    Counting is length-difference arithmetic over ``regexp_replace``
    (JVM regex, whole-stage codegen) — no explode, no UDF; ONE keyed
    aggregate with map-side partials.
    """
    t = F.col(text_col)
    n = F.length(t)
    letters = n - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    spaces = n - F.length(F.regexp_replace(t, "[ ]", ""))
    g = df.groupBy(F.col(group_col).alias(group_col)).agg(
        F.sum(n).cast("long").alias("n_chars"),
        F.sum(letters).cast("long").alias("n_letters"),
        F.sum(digits).cast("long").alias("n_digits"),
        F.sum(spaces).cast("long").alias("n_spaces"),
    )
    nch = F.col("n_chars").cast("double")
    return g.select(
        group_col,
        "n_chars",
        F.round(F.col("n_letters") / nch, 6).alias("letter_share"),
        F.round(F.col("n_digits") / nch, 6).alias("digit_share"),
        F.round(F.col("n_spaces") / nch, 6).alias("space_share"),
        F.round(
            (nch - F.col("n_letters") - F.col("n_digits")
             - F.col("n_spaces")) / nch,
            6,
        ).alias("other_share"),
    )


def word_entropy_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    low_bits: float = 4.0,
) -> DataFrame:
    """Per-source word-entropy profile: mean per-doc unigram entropy
    (bits) and the share of docs below ``low_bits`` — the
    compressibility screen that separates templated/boilerplate feeds
    (few distinct words, low H) from natural prose, cheaper than any
    LM score.

    Per-doc entropy is closed-form in grouped sums:
    H = log2(n) - sum(c*log2 c)/n over the (doc, word) counts — two
    keyed shuffles (token counts with map-side combine, then the doc
    roll-up), then one bounded per-source aggregate.
    """
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    c = w.groupBy("doc_id", "source", "w").agg(
        F.count("*").cast("double").alias("c")
    )
    ln2 = 0.6931471805599453
    d = c.groupBy("doc_id", "source").agg(
        F.sum("c").alias("_n"),
        F.sum(F.col("c") * F.log("c")).alias("_s"),
    )
    h = d.select(
        "source",
        (
            F.log("_n") / ln2 - F.col("_s") / (F.col("_n") * ln2)
        ).alias("_h"),
    )
    return h.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("_h"), 5).alias("mean_entropy_bits"),
        F.round(
            F.avg((F.col("_h") < low_bits).cast("double")), 5
        ).alias("low_entropy_share"),
    )


def mattr_diversity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """MATTR — moving-average type-token ratio (Covington & McFall
    2010), the length-independent lexical-diversity score the raw TTR
    (`doc_token_stats`) can't give (TTR decays with doc length): mean
    over all length-``window`` sliding token windows of
    distinct/window; docs shorter than the window fall back to plain
    TTR (the standard convention).

    All window distinct-counts are integers summed exactly, so the
    single final division is the only float op — hash-stable with no
    fold-order concern.  The O(n·w) scan folds IN-ROW over the token
    array via HOFs (no explode, no self-join); per-doc token counts
    are bounded by doc length, never corpus size.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    nwin = n - window + 1
    s = F.aggregate(
        F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.size(F.array_distinct(F.slice(toks, i, window))),
    )
    short = F.size(F.array_distinct(toks)).cast("double") / n
    mattr = F.when(n <= 0, F.lit(None).cast("double")).when(
        n <= window, short
    ).otherwise(
        s.cast("double") / (F.lit(float(window)) * nwin.cast("double"))
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(mattr, 6).alias("mattr"),
    )


def secret_entropy_scan(
    df: DataFrame,
    text_col: str,
    pattern: str = "[A-Za-z0-9+/=_-]{20,}",
    bits_threshold: float = 3.0,
) -> DataFrame:
    """High-entropy credential-candidate scan over free text.

    Leaked API keys / tokens are long runs of near-uniform symbols;
    prose is not.  Extracts every candidate run matching ``pattern``
    (``regexp_extract_all`` — JVM regex, no Python) and computes the
    per-token Shannon entropy in bits over its character distribution
    with array higher-order functions: H = -sum_c p_c*log2(p_c) where
    p_c folds over ``array_distinct`` of the chars — a pure per-row
    expression, ZERO shuffles added, O(len * alphabet) per token.
    Flags tokens with H >= ``bits_threshold`` (hex keys ~3.9 bits,
    base64 ~5.7, 'xxxx...' padding 0).

    Returns one row per candidate token: (input cols..., token,
    entropy_bits (round 6), is_secret).
    """
    toks = df.withColumn(
        "token",
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)),
    )
    toks = toks.withColumn(
        "_chars", F.filter(F.split(F.col("token"), ""), lambda x: x != "")
    )
    ent = F.expr(
        "aggregate(array_distinct(_chars), cast(0.0 as double), (acc, c) ->"
        " acc - (size(filter(_chars, x -> x = c))"
        "        / cast(size(_chars) as double))"
        "     * log2(size(filter(_chars, x -> x = c))"
        "        / cast(size(_chars) as double)))"
    )
    return (
        # + 0.0 folds IEEE -0.0 (a zero-entropy token is literally
        # -sum(0.0)) to +0.0 so both engines render it identically.
        toks.withColumn("entropy_bits", F.round(ent, 6) + 0.0)
        .withColumn("is_secret", F.col("entropy_bits") >= bits_threshold)
        .drop("_chars")
    )


def good_turing(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """Simple Good-Turing frequency-of-frequencies table over tokens.

    Unseen-mass estimation for vocabulary statistics: how much
    probability should a language model reserve for words never seen
    in this corpus slice?  Turing's estimator re-weights each observed
    count r to r* = (r+1) * N_{r+1} / N_r where N_r = number of
    distinct tokens seen exactly r times; the unseen mass is N_1 / N.

    Shape: tokenize (split + explode, JVM), ONE shuffle to word
    counts, one to the count-of-counts table (|distinct r| rows —
    tiny), then a self-join on r+1 that AQE broadcasts.  No collect.

    Returns per r: n_r, r_star (NULL when N_{r+1}=0 — the standard
    table truncation), p_r = unsmoothed share.  Total token count N is
    repeated on every row (column ``n_total``) so downstream math
    needs no second pass.
    """
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    nr = wc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = nr.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("_n")
    )
    nxt = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_next")
    )
    out = (
        nr.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round(
                (F.col("r") + 1.0)
                * F.col("_n_next")
                / F.col("n_r"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("r") * F.col("n_r") / F.col("_n").cast("double"), 6
            ).alias("p_r"),
            F.col("_n").cast("long").alias("n_total"),
        )
    )
    return out


def readability_indices(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """SMOG, Coleman-Liau, and ARI readability per document.

    Completes ``flesch_reading_ease`` with the three other classic
    grade-level formulas — quality-scoring features for corpus
    filtering.  All counts are per-row array/regex expressions (zero
    shuffles added): sentences = non-empty [.!?] segments, words =
    whitespace tokens, letters = [A-Za-z] count, polysyllables =
    words with >= 3 vowel groups (the standard no-dictionary syllable
    proxy).

    SMOG        = 1.043 * sqrt(polysyllables * 30 / sentences) + 3.1291
    ColemanLiau = 0.0588 * L - 0.296 * S - 15.8
                  (L = letters per 100 words, S = sentences per 100 words)
    ARI         = 4.71 * chars_per_word + 0.5 * words_per_sentence - 21.43

    Returns input + n_sentences, n_words, n_polysyllables, smog,
    coleman_liau, ari (indices round 4).  Empty texts yield NULLs.
    """
    t = F.col(text_col)
    sents = F.size(
        F.filter(
            F.split(t, r"[.!?]"), lambda x: F.trim(x) != ""
        )
    )
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    letters = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    poly = F.size(
        F.filter(
            words,
            lambda w: F.size(F.regexp_extract_all(w, F.lit("[aeiou]+"), 0))
            >= 3,
        )
    )
    ok = (n_words > 0) & (sents > 0)
    nw = n_words.cast("double")
    ns = sents.cast("double")
    smog = 1.043 * F.sqrt(poly.cast("double") * 30.0 / ns) + 3.1291
    cl = (
        0.0588 * (letters.cast("double") * 100.0 / nw)
        - 0.296 * (ns * 100.0 / nw)
        - 15.8
    )
    ari = (
        4.71 * (letters.cast("double") / nw) + 0.5 * (nw / ns) - 21.43
    )
    return (
        df.withColumn("n_sentences", F.when(ok, sents.cast("long")))
        .withColumn("n_words", F.when(ok, n_words.cast("long")))
        .withColumn("n_polysyllables", F.when(ok, poly.cast("long")))
        .withColumn("smog", F.when(ok, F.round(smog, 4)))
        .withColumn("coleman_liau", F.when(ok, F.round(cl, 4)))
        .withColumn("ari", F.when(ok, F.round(ari, 4)))
    )


def dga_score(df: DataFrame, domain_col: str) -> DataFrame:
    """DGA (domain-generation-algorithm) heuristic score — pure Catalyst.

    The SIEM enrichment the collector's forwarded DNS/proxy logs feed:
    malware C2 domains come from generators and look like line noise
    (high character entropy, digits interleaved, long consonant runs),
    while human domains are pronounceable words.  Features over the
    second-level label:

    - ``char_entropy``: Shannon entropy of the character distribution,
      computed IN-ROW over the (distinct-char x count) arrays — no
      explode, no shuffle, O(L^2) per row with L <= 63 (DNS label cap).
    - ``digit_ratio``, ``vowel_ratio``, ``max_consonant_run`` (regexp
      run-length).  Vowel DEFICIT is the strongest word-vs-generator
      signal: English labels sit near 0.35 vowels, hex/base32
      generators near 0-0.2.
    - ``dga_score = 0.2*char_entropy + 4*digit_ratio +
      2*max(0, 0.3 - vowel_ratio) + 0.15*max_consonant_run``;
      ``is_dga`` at the 1.6 threshold — separates hex/base32
      generators from dictionary domains with margin (tune per fleet).

    A 10^12-row scan stays one codegen'd map stage.
    """
    sld = F.lower(F.regexp_extract(F.col(domain_col), r"^([^.]+)", 1))
    d = "_sld"
    chars = (
        f"transform(sequence(1, length({d})), i -> substr({d}, i, 1))"
    )
    ent = (
        f"-aggregate(transform(array_distinct({chars}), c ->"
        f" size(filter({chars}, x -> x = c)) / cast(length({d}) as double)),"
        f" cast(0.0 as double), (acc, p) -> acc + p * log2(p))"
    )
    runs = (
        f"coalesce(array_max(transform(regexp_extract_all({d},"
        f" '[b-df-hj-np-tv-z]+', 0), r -> length(r))), 0)"
    )
    out = (
        df.withColumn(d, sld)
        .withColumn(
            "char_entropy",
            F.when(F.length(d) > 0, F.round(F.expr(ent), 6)),
        )
        .withColumn(
            "digit_ratio",
            F.when(
                F.length(d) > 0,
                F.round(
                    F.length(F.regexp_replace(F.col(d), "[^0-9]", ""))
                    / F.length(d).cast("double"),
                    6,
                ),
            ),
        )
        .withColumn(
            "vowel_ratio",
            F.when(
                F.length(d) > 0,
                F.round(
                    F.length(F.regexp_replace(F.col(d), "[^aeiou]", ""))
                    / F.length(d).cast("double"),
                    6,
                ),
            ),
        )
        .withColumn("max_consonant_run", F.expr(runs))
    )
    score = F.round(
        0.2 * F.col("char_entropy")
        + 4 * F.col("digit_ratio")
        + 2 * F.greatest(F.lit(0.0), F.lit(0.3) - F.col("vowel_ratio"))
        + 0.15 * F.col("max_consonant_run"),
        6,
    )
    return out.withColumn("dga_score", score).withColumn(
        "is_dga", F.col("dga_score") > 1.6
    ).drop(d)


def acronym_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Schwartz-Hearst acronym/expansion pairs — glossary extraction.

    The corpus-curation helper behind entity normalization: a
    parenthesized token of 2-6 capitals following words whose
    initials spell it ("Large Language Model (LLM)") defines the
    expansion.  Candidate "(ABC)" spans via ``regexp_extract_all``;
    the preceding |acronym| words via an in-row array slice; the
    initials check via a fold over the zipped letters — all Catalyst,
    zero exchanges until the (doc, acronym, expansion) explode.

    Returns one row per validated pair: id, acronym, expansion.
    """
    t = F.col(text_col)
    # candidates with their char offset so the preceding words can be
    # located: split text at each '(ACRO)' occurrence
    cand = (
        f"regexp_extract_all({text_col},"
        r" '([\\w ,-]{0,80})\\(([A-Z]{2,6})\\)', 0)"
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.expr(cand)).alias("_span"),
    )
    acro = F.regexp_extract(F.col("_span"), r"\(([A-Z]{2,6})\)", 1)
    before = F.regexp_extract(F.col("_span"), r"^(.*)\(", 1)
    words = F.expr(
        "filter(split(trim(_before), ' +'), w -> w <> '')"
    )
    parsed = base.withColumn("_acro", acro).withColumn(
        "_before", F.trim(before)
    ).withColumn("_words", words)
    k = F.length("_acro")
    tail = F.expr("slice(_words, -cast(length(_acro) as int), cast(length(_acro) as int))")
    parsed = parsed.filter(F.size("_words") >= k).withColumn(
        "_tail", tail
    )
    ok = F.expr(
        "aggregate(sequence(1, cast(length(_acro) as int)), true,"
        " (acc, i) -> acc and upper(substr(try_element_at(_tail, i),"
        " 1, 1)) = substr(_acro, i, 1))"
    )
    return parsed.filter(ok).select(
        F.col("_id").alias(id_col),
        F.col("_acro").alias("acronym"),
        F.array_join("_tail", " ").alias("expansion"),
    ).distinct()
