"""Training-corpus curation operators.

The reference pipeline ends at telemetry sinks; a 100 TB transcript /
document corpus feeding model training needs four more first-class
operations, built here Catalyst-first:

* :func:`decontaminate` — remove training documents that overlap a
  held-out benchmark set (n-gram collision ratio), the standard
  test-set decontamination pass.
* :func:`repetition_stats` — Gopher-style repetition quality signals
  (duplicate-word ratio, most-frequent-n-gram mass) used to drop
  degenerate/boilerplate text.
* :func:`stratified_sample` — deterministic per-stratum subsampling
  (domain/source rebalancing) via portable md5 bucketing: the same
  row set is kept on ANY engine, any cluster size, any run.
* :func:`chunk_text` — fixed-size overlapping word-window chunking
  (RAG / pretraining block prep) as a generator expression, no UDF.
* :func:`vocabulary` — top-k vocabulary induction (occurrence + doc
  frequency) without a distinct-expand.
* :func:`tfidf_top_terms` — per-document TF-IDF keyword extraction.

Scale notes (10^9-document corpora):

* decontaminate is a distinct-gram left-semi/anti pattern: both sides
  are projected to (doc_id, gram) DISTINCT before the join, so a hot
  gram contributes one row per document, never a cross product.  The
  benchmark side is typically tiny (thousands of docs) — AQE will
  broadcast it at runtime; no forced hint, same policy as the dedup
  tier.
* repetition_stats shuffles (doc_id, gram) pairs once; both aggregates
  are partial-aggregated map-side.
* stratified_sample and chunk_text are pure map ops — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (array HOFs, no UDF)."""
    if n == 1:
        return words
    # transform over start indices 0..len-n (1-based slice below)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training docs whose distinct word-``n``-gram overlap with
    the benchmark corpus exceeds ``threshold``.

    Returns the KEPT training rows as
    ``(doc_id, n_grams, n_contaminated, contamination)`` — callers
    join back on ``doc_id`` for the full record (cheaper than carrying
    text through the gram shuffle).
    """
    def grams_of(df: DataFrame) -> DataFrame:
        words = F.split(F.col(text_col), " ")
        return (
            df.select(F.col(id_col), F.explode(_word_ngrams(words, n)).alias("gram"))
            .distinct()
        )

    tg = grams_of(train)
    bench_grams = grams_of(benchmark).select("gram").distinct()
    flagged = (
        tg.join(bench_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    per_doc = tg.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    scored = per_doc.join(flagged, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )
    contamination = F.col("n_contaminated") / F.col("n_grams")
    return scored.withColumn(
        "contamination", F.round(contamination, 6)
    ).filter(contamination <= threshold)


def repetition_stats(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    * ``dup_word_ratio`` — 1 - distinct(words)/len(words)
    * ``top_ngram_frac`` — occurrences of the most frequent word
      ``n``-gram over total n-grams (boilerplate detector)

    One (doc_id, gram) shuffle; word stats ride along map-side.
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.explode(_word_ngrams(words, n)).alias("gram"),
    )
    per_gram = base.groupBy(id_col, "n_words", "n_distinct", "gram").agg(
        F.count("*").alias("c")
    )
    return per_gram.groupBy(id_col, "n_words", "n_distinct").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    ).select(
        id_col,
        F.round(1 - F.col("n_distinct") / F.col("n_words"), 6).alias(
            "dup_word_ratio"
        ),
        F.round(F.col("top_c") / F.col("total_c"), 6).alias("top_ngram_frac"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "source",
    key_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum subsampling: keep a row iff its md5
    bucket (portable across engines) falls under its stratum's rate.
    The domain-rebalancing pass of a corpus pipeline — e.g. keep 10%
    of a dominant crawl source, 100% of books."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(bucket < rate * buckets)


def vocabulary(
    df: DataFrame,
    top_k: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary induction: the ``top_k`` words by total
    occurrence count, with document frequency — the first pass of any
    tokenizer/vocab build over a training corpus.

    Returns ``(word, n_occurrences, n_docs)`` ordered by count desc,
    word asc (deterministic tie-break).

    Scale: per-doc term counts first (shuffle keyed on
    ``(doc_id, word)``, partial-aggregated map-side), THEN the global
    roll-up on ``word`` — doc frequency is a plain ``count(*)`` over
    that intermediate, avoiding the distinct-expand a
    ``count_distinct(doc_id)`` would plan.  The final top-k is
    ``TakeOrdered`` (heap per partition + driver merge), never a full
    sort of the vocabulary.
    """
    words = F.split(F.col(text_col), " ")
    per_doc = (
        df.select(F.col(id_col), F.explode(words).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_doc.groupBy("word")
        .agg(F.sum("c").alias("n_occurrences"), F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(top_k)
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` keywords by TF-IDF
    (``tf * ln(N / df)``) — the classic keyword-extraction /
    relevance-weighting pass.

    Returns ``(doc_id, word, score, rank)`` with ``rank`` 1..k by
    score desc, word asc (deterministic tie-break); words that appear
    in EVERY document score 0 and still rank (ln(N/N)=0), matching the
    textbook formula.

    Scale: three keyed shuffles — ``(doc_id, word)`` term counts,
    ``word`` doc-frequency roll-up, ``doc_id`` window rank — all
    partial-aggregated or single-key; the corpus size ``N`` is a 1-row
    aggregate (AQE broadcasts it).  No UDF anywhere.
    """
    words = F.split(F.col(text_col), " ")
    tf = (
        df.select(F.col(id_col), F.explode(words).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(docfreq, "word")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "word", "score", "rank")
    )


def chunk_text(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping word-window chunks: offsets 0, stride, 2*stride …
    while < n_words; each chunk is ``size`` words (shorter at the
    tail).  Pure generator expression — a map op with zero shuffles,
    the RAG/pretraining block-prep shape."""
    words = F.split(F.col(text_col), " ")
    offsets = F.sequence(F.lit(0), F.size(words) - 1, F.lit(stride))
    chunk = F.transform(
        offsets,
        lambda off, i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice(words, off + 1, size), " ").alias("chunk"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunk).alias("c")
    ).select(id_col, F.col("c.chunk_idx"), F.col("c.chunk"))


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII scrubbing pass over a document corpus.

    Replaces emails, IPv4 addresses, US-style phone numbers, and
    32-hex secrets with typed placeholder tokens and counts each
    category per document (the audit trail a curation pipeline keeps).
    Mirrors the redaction processor's value-blocking semantics
    (redactionprocessor README: blocked_values regexes masked in
    place) applied to free text instead of attribute maps.

    Pure Catalyst ``regexp_replace``/``regexp_extract_all`` — the
    patterns are deliberately written in the common subset of Java
    regex and RE2 so any engine applies the identical mask.  Per-row
    narrow transform: no shuffle, fully codegen'd, scales linearly.
    """
    pats = [
        ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
        ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
        ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
        ("secret", r"\b[0-9a-f]{32}\b", "<SECRET>"),
    ]
    out = df
    clean = F.col(text_col)
    for name, pat, token in pats:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))),
        )
        clean = F.regexp_replace(clean, pat, token)
    return out.select(
        id_col,
        clean.alias("clean_text"),
        "n_email",
        "n_ip",
        "n_phone",
        "n_secret",
    )


def domain_mix(
    df: DataFrame,
    target_weights: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Rebalance a corpus toward a target domain mixture.

    Unlike :func:`stratified_sample` (fixed per-stratum rates), the
    keep rate here is DATA-DEPENDENT: given target mixture weights
    w_d, the output size is maximized subject to every domain hitting
    exactly its weight and no domain being oversampled — the binding
    domain is the one with the smallest n_d / w_d, kept at 100%, and
    every other domain is downsampled to match
    (rate_d = min_k(n_k / w_k) * w_d / n_d — the standard waterfilling
    mixture solve for training-data recipes).

    Two tiny aggregates (per-domain counts then a global min — both
    map-side-combined, bytes of data), a broadcast-size join of the
    per-domain rate back onto the corpus (AQE broadcasts it: the rate
    table has one row per domain), then the same portable md5-bucket
    filter as :func:`stratified_sample` so the kept row set is
    engine- and cluster-size-independent.  No full-table shuffle.
    """
    w = F.create_map(
        *[F.lit(x) for kv in target_weights.items() for x in kv]
    )
    counts = (
        df.filter(F.col(strata_col).isin(*target_weights.keys()))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n_d"))
        .withColumn("w_d", w[F.col(strata_col)])
    )
    binding = counts.agg(
        F.min(F.col("n_d") / F.col("w_d")).alias("scale")
    )
    rates = counts.crossJoin(binding).select(
        strata_col,
        F.least(F.lit(1.0), F.col("scale") * F.col("w_d") / F.col("n_d")).alias(
            "keep_rate"
        ),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )
    return (
        df.join(rates, strata_col)
        .filter(bucket < F.col("keep_rate") * buckets)
        .drop("keep_rate")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: chunk each group's token stream into
    fixed-length training sequences.

    Documents are concatenated in ``id_col`` order within each group
    (shard) and the resulting token stream is cut into consecutive
    ``seq_len``-token sequences, splitting documents at boundaries —
    the standard pretraining pack (concat-then-chunk).  Output is one
    row per (document × sequence it touches):

    ``(group, seq_id, doc_id, seq_start, doc_start, n_tok)`` — the doc
    contributes its tokens ``[doc_start, doc_start + n_tok)`` at offset
    ``seq_start`` of sequence ``seq_id``.  A trainer joins this span
    table back to the tokenized text to materialize batches; the span
    table itself is the lineage record that makes the pack auditable.

    Token counts are whitespace word counts here (swap in a real
    tokenizer's count column upstream if available).

    Scale: ONE shuffle — the cumulative-sum window partitioned by
    ``group_col`` (groups = shards, thousands of them, so the window
    parallelizes; no global ordering is ever required).  The explode
    emits ceil(n_tok/seq_len)+1 ≈ 1-2 rows per doc.  All arithmetic is
    codegen'd; no UDF.
    """
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    toks = df.select(
        group_col,
        F.col(id_col),
        n_tok.alias("n"),
    ).withColumn("off", F.coalesce(F.sum("n").over(w), F.lit(0)))
    first_seq = (F.col("off") / seq_len).cast("bigint")
    last_seq = ((F.col("off") + F.col("n") - 1) / seq_len).cast("bigint")
    spans = toks.filter(F.col("n") > 0).select(
        group_col,
        id_col,
        "n",
        "off",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * seq_len
    doc_start = F.greatest(seq_lo - F.col("off"), F.lit(0))
    seq_start = F.greatest(F.col("off") - seq_lo, F.lit(0))
    n_in_seq = (
        F.least(F.col("off") + F.col("n"), seq_lo + seq_len)
        - F.greatest(F.col("off"), seq_lo)
    )
    return spans.select(
        group_col,
        F.col("seq_id"),
        id_col,
        seq_start.cast("int").alias("seq_start"),
        doc_start.cast("int").alias("doc_start"),
        n_in_seq.cast("int").alias("n_tok"),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle into N output shards.

    The pretraining-data shuffle: every doc gets a pseudo-random but
    fully deterministic position — shard = md5(seed‖id) mod N, rank =
    md5-order within the shard — so any engine, any cluster size, any
    run derives the IDENTICAL order (the property that makes training
    runs reproducible and resumable).  Seed changes reshuffle globally.

    Scale: no global sort.  One shuffle for the per-shard rank window;
    with n_shards in the thousands each window partition is
    |corpus|/N docs, and writers emit shard files independently.  A
    global position, when needed, is ``shard * ceil(|corpus|/N) +
    rank`` after a per-shard count — never a single-partition
    row_number over the whole corpus.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    out = df.withColumn("_h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return out.withColumn("shard_rank", F.row_number().over(w)).drop("_h")


def dimension_cardinality(
    df: DataFrame,
    dims: list[str],
    rel_sd: float = 0.02,
) -> DataFrame:
    """Per-dimension cardinality audit (exact + HyperLogLog).

    The collector guards against dimension explosion — a runaway tag
    (e.g. a request id leaked into a dimension) multiplies timeseries
    cardinality and melts the metrics backend.  This audit reports,
    per dimension column: exact distinct count, HLL approximate count
    (``approx_count_distinct``, the sketch that replaces the exact
    count at 100 TB — mergeable, fixed memory), null count, and the
    top value's share (a skew signal).

    One pass over the data per dimension batch: all measures are
    map-side partial aggregates stacked with a single unpivot; the
    top-share needs one extra (dim, value) shuffle.  At scale, drop
    the exact column and keep HLL only — the schema is the contract.
    """
    measures = []
    for d in dims:
        measures += [
            F.lit(d),
            F.struct(
                F.countDistinct(F.col(d)).alias("exact_distinct"),
                F.approx_count_distinct(F.col(d), rel_sd).alias("hll_distinct"),
                F.sum(F.col(d).isNull().cast("long")).alias("nulls"),
            ),
        ]
    wide = df.agg(F.map_from_arrays(
        F.array(*measures[0::2]), F.array(*measures[1::2])
    ).alias("m"))
    audit = (
        wide.select(F.explode("m").alias("dim", "s"))
        .select("dim", "s.exact_distinct", "s.hll_distinct", "s.nulls")
    )
    top = None
    for d in dims:
        c = (
            df.groupBy(F.lit(d).alias("dim"), F.col(d).cast("string").alias("v"))
            .agg(F.count("*").alias("c"))
            .groupBy("dim")
            .agg((F.max("c") / F.sum("c")).alias("top_share"))
        )
        top = c if top is None else top.unionByName(c)
    return audit.join(top, "dim")


def lm_score(
    df: DataFrame,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    floor_logprob: float = -20.0,
    round_digits: int = 6,
) -> DataFrame:
    """CCNet-style language-model quality score: mean unigram
    log-probability per document.

    CCNet/RedPajama filter web text by LM perplexity; with no external
    model available, the standard self-supervised stand-in is a unigram
    LM estimated from the corpus itself (or from ``lm``, a reference
    corpus with the same schema): ``logprob(w) = ln(count(w) / total)``,
    and a document scores the mean over its token occurrences.  Low
    scores flag gibberish / rare-token soup; suspiciously high scores
    flag boilerplate.  Out-of-vocabulary tokens (only possible when
    ``lm`` is a different corpus) take ``floor_logprob``.

    Scale: tokens are one explode (narrow); the LM is a (word, count)
    aggregate whose size is the vocabulary — millions of rows at 100 TB,
    far under the fact table — so the score join is a fine shuffle join
    and AQE broadcasts it when it fits; no forced hint (an aggregate of
    a fact table is never safe to force-broadcast).  The 1-row total
    joins via crossJoin of an aggregate — AQE handles it.  Output is
    rounded to 6 decimals so the score is engine-portable.
    """
    tokens = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    src = tokens if lm is None else lm.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    counts = src.groupBy("word").agg(F.count("*").alias("c"))
    total = src.agg(F.count("*").alias("n_total"))
    logprobs = counts.crossJoin(total).select(
        "word", F.log(F.col("c") / F.col("n_total")).alias("logprob")
    )
    scored = tokens.join(logprobs, "word", "left").select(
        id_col,
        F.coalesce("logprob", F.lit(float(floor_logprob))).alias("logprob"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logprob"), round_digits).alias("mean_logprob"),
    )


def normalize_url(url: Column, https: bool = True) -> Column:
    """Canonicalize a URL for web-corpus dedup (pure Catalyst).

    The first pass of every web-scale pipeline (CommonCrawl curation)
    is URL canonicalization so the same page fetched under trivially
    different URLs dedups exactly:

    * drop the fragment (``#...``),
    * normalize the scheme to https (http/https are the same page for
      dedup purposes) and lowercase it,
    * lowercase the host and strip a leading ``www.``,
    * drop default ports (``:80``/``:443``),
    * drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
      ``ref``) and sort the survivors for order-insensitivity,
    * strip a trailing ``/`` and a dangling ``?``.

    All regexp/array HOFs — per-row narrow compute, codegen'd, zero
    shuffle, no UDF.  URLs with a non-http(s) scheme (ftp:, mailto:,
    data:, ...) pass through UNCHANGED — canonicalizing them with http
    rules would produce garbage dedup keys.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "https://" if https else "http://")
    # lowercase the authority (scheme already normalized), keep path case
    host = F.lower(F.regexp_extract(u, r"^https?://([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^https?://[^/?]*", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        F.lit("https://" if https else "http://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    is_http = url.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://")
    has_scheme = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    return F.when(is_http | ~has_scheme, canonical).otherwise(url)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one document per canonical URL (the min id — deterministic
    on any engine/cluster), with the duplicate count.

    One shuffle on the canonical URL string; the groupBy is a plain
    hash-agg with map-side partials.
    """
    return (
        df.withColumn("canonical_url", normalize_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dups"),
        )
    )


def sft_pairs(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """Extract (prompt, response) training pairs from transcripts: each
    ``response_role`` turn pairs with the NEAREST PRECEDING
    ``prompt_role`` turn in its conversation (tool/system turns in
    between are skipped, as SFT pair extraction does).

    One window over (group, order) — ``last_value ... ignore nulls`` —
    so the whole op is a single shuffle on the conversation key; on a
    conv_id-bucketed table (the 100 TB layout) even that shuffle
    disappears.  Responses with no preceding prompt are dropped.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prompt = F.last(
        F.when(F.col(role_col) == prompt_role, F.col(text_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.withColumn("prompt", prompt)
        .filter((F.col(role_col) == response_role) & F.col("prompt").isNotNull())
        .select(
            group_col,
            F.col(order_col).alias("response_turn"),
            "prompt",
            F.col(text_col).alias("response"),
        )
    )


def quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_top: float,
    order_col: str | None = None,
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of rows per group by score —
    RELATIVE quality filtering (per-domain thresholds), the fix for the
    classic absolute-threshold failure mode where one domain's median
    beats another domain's p99 and a global cut wipes out the weaker
    domain entirely.

    Uses ``cume_dist`` (rows <= mine / rows in group): keep rows with
    ``cume_dist >= 1 - keep_top``.  cume_dist is tie-stable and has the
    same definition in every SQL engine, so the kept set is
    deterministic and engine-portable.  One shuffle on the group key;
    at 10^9 docs per domain the window is a sort within each domain's
    partitions — for truly huge groups switch the threshold to
    ``approx_percentile`` per group and a semi-join (sketch path).
    """
    from pyspark.sql.window import Window

    order = [F.col(score_col)] + (
        [F.col(order_col)] if order_col is not None else []
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("score_cume", F.round(F.cume_dist().over(w), 6))
        .filter(F.col("score_cume") >= 1.0 - keep_top)
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set — the
    retrieval scorer for corpus search / hard-negative mining.

    Shuffle-free except one 1-row corpus-stats aggregate: per-term
    frequencies come from array HOFs over the split text (``size(
    filter(words, w -> w = t))`` — no explode, no (doc, word) shuffle),
    doc length from ``size(words)``; N / avgdl / per-term df are a
    single 1-row aggregate crossJoined back (AQE broadcasts it).  The
    score sums terms in LITERAL LIST ORDER, so double addition is
    deterministic and engine-portable.  Uses the Lucene idf form
    ``ln(1 + (N - df + .5)/(df + .5))`` (always positive).
    """
    if not terms:
        raise ValueError("bm25_scores requires a non-empty term list")
    words = F.split(F.col(text_col), " ")
    proj = [F.col(id_col), F.size(words).alias("_dl")]
    for i, t in enumerate(terms):
        proj.append(
            F.size(F.filter(words, lambda w: w == F.lit(t))).alias(f"_tf{i}")
        )
    per_doc = df.select(*proj)
    aggs = [
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    ] + [
        F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
        for i in range(len(terms))
    ]
    stats = per_doc.agg(*aggs)
    scored = per_doc.crossJoin(stats)
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - dfreq + 0.5) / (dfreq + 0.5)
        )
        term = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
        score = term if score is None else score + term
    return scored.select(
        id_col, F.round(score, round_digits).alias("bm25")
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    posting_cap: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Positional inverted index: one row per (term, doc) posting with
    the 0-based token positions — the structure behind phrase search
    and fast substring-contamination checks over a corpus.

    Shuffle order is the scale guard: document frequency comes from a
    plain per-term AGGREGATE (map-side partials — safe for any term),
    and the ``max_df`` stop-term drop is applied BEFORE the per-term
    ranking window, so a boilerplate term with 10^9 postings never
    reaches a single reducer's sort (the same bounded-posting-list
    policy as the Jaccard dedup tier).  ``posting_cap`` then keeps the
    ``posting_cap`` SMALLEST doc ids per surviving term (deterministic
    on any engine).  With ``max_df=None`` the window must still rank
    every posting — pass a cap at 100 TB.
    """
    from pyspark.sql.window import Window

    tokens = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    # sort positions NUMERICALLY before casting to string ("2" < "10")
    postings = tokens.groupBy("term", id_col).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda x: x.cast("string"),
            ),
        ).alias("pos_str")
    )
    freq = postings.groupBy("term").agg(F.count("*").alias("doc_freq"))
    if max_df is not None:
        freq = freq.filter(F.col("doc_freq") <= max_df)
    guarded = postings.join(freq, "term")
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    out = (
        guarded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= posting_cap)
        .drop("_rn")
    )
    return out.select("term", "doc_freq", id_col, "pos_str")


def _bpe_merge_step(left: str, right: str):
    """Greedy left-to-right non-overlapping merge fold for one BPE
    pair — ONE definition shared by training (`bpe_learn`) and replay
    (`bpe_segment`): the replay-reproduces-training contract holds
    only because both run literally this fold.  A factory (not
    default-arg lambdas) because PySpark HOF lambdas must take exactly
    the declared arguments."""

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return step


def bpe_learn(
    df: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn byte-pair-encoding merges from a corpus (Sennrich-style
    tokenizer induction): start from character sequences per word,
    repeatedly merge the globally most frequent adjacent symbol pair.

    Genuinely iterative — each round depends on the previous round's
    re-segmentation — so it runs as a driver loop of ``n_merges``
    rounds, each round fully declarative:

    * adjacent-pair counts: array HOF -> explode -> ONE (left, right)
      shuffle, weighted by word frequency (the corpus collapses to its
      word-frequency table first, so round cost scales with |vocab|,
      not corpus size — the standard BPE trick);
    * top pair: ``orderBy(freq desc, pair asc).limit(1)`` (TakeOrdered,
      deterministic tie-break) — a 1-row driver collect per round, the
      same justified shape as IVF training;
    * re-segmentation: a left-fold ``aggregate`` over each symbol array
      doing the greedy left-to-right non-overlapping merge — no UDF;
      ``localCheckpoint`` truncates lineage per round (the
      ``dedup_clusters`` policy).

    Returns ``[(left, right, freq), ...]`` in merge order.  Word
    frequencies use whitespace tokens; re-running with the returned
    merges via :func:`bpe_segment` reproduces the segmentation.
    """
    wf = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .select(F.split("word", "").alias("seq"), "wc")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = wf.select(
            "wc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("seq") - 2),
                    lambda i: F.struct(
                        F.element_at("seq", i + 1).alias("l"),
                        F.element_at("seq", i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
        ).filter(F.size("seq") >= 2)
        top = (
            pairs.groupBy("p")
            .agg(F.sum("wc").alias("freq"))
            .orderBy(F.desc("freq"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right, int(top[0]["freq"])))
        wf = wf.select(
            F.aggregate(
                "seq",
                F.array().cast("array<string>"),
                _bpe_merge_step(left, right),
            ).alias("seq"),
            "wc",
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply learned BPE merges to text: per word, replay the merge
    list in order with the same greedy left-fold used during training.
    Pure Catalyst (len(merges) chained HOFs over each word's symbol
    array) — a narrow map, zero shuffle; the learned merges are
    config, exactly how a production tokenizer ships its merges.txt.
    """
    def apply_merges(seq: Column) -> Column:
        for left, right, _ in merges:
            seq = F.aggregate(
                seq, F.array().cast("array<string>"),
                _bpe_merge_step(left, right),
            )
        return seq

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(words, lambda w: apply_merges(F.split(w, "")))
        ),
    )


def conversation_features(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation feature vector over a transcript table — the
    signals a transcript-quality filter or a training-mix sampler
    reads: turn counts, assistant/tool balance, mean turn length,
    tool diversity, first/last timestamps.

    ONE grouped pass, every measure a map-side partial aggregate (the
    distinct-tool count is the only expand, bounded by the tool
    vocabulary).  Timestamps are emitted second-truncated as strings so
    the row is engine-portable.
    """
    return df.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col(role_col) == "assistant").cast("long")).alias(
            "n_assistant"
        ),
        F.sum((F.col(tool_col) != "none").cast("long")).alias("n_tool_turns"),
        F.countDistinct(F.col(tool_col)).alias("n_tools"),
        F.round(F.avg(F.length(F.col(text_col)).cast("double")), 4).alias(
            "avg_chars"
        ),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each row draws a deterministic uniform ``u`` from the portable md5
    hash of (seed, id) and scores ``u^(1/w)``; the ``k`` largest scores
    are the sample — provably equivalent to sequential weighted draws,
    and the BEST way to quality-weight a corpus subsample (weight =
    quality score) while staying reproducible on any engine, any
    cluster size, any run.

    Zero shuffles until the final TakeOrdered (per-partition heaps) —
    no rand() (breaks retry idempotence), no global sort.  Rows with
    non-positive weight are excluded, matching the ES definition.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + 0.5) / 4294967296.0
    w = F.col(weight_col).cast("double")
    es_key = F.pow(u, 1.0 / w)
    return (
        df.filter(w > 0)
        .withColumn("es_key", es_key)
        .orderBy(F.desc("es_key"), id_col)
        .limit(k)
        .drop("es_key")
    )


def split_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Segment documents into (doc, line_idx, line) rows — the input
    shape for line-level corpus cleaning (C4 §2.2 line rules,
    RefinedWeb line-wise dedup).  One narrow posexplode, no shuffle;
    order is carried explicitly in ``line_idx`` so downstream
    reassembly never depends on task order.
    """
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_idx", "line"),
    )


def line_filter(
    lines: DataFrame,
    keep_predicate: str,
    id_col: str = "doc_id",
    idx_col: str = "line_idx",
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """C4-style line-level cleaning: keep only lines satisfying a SQL
    predicate (terminal punctuation, min words, no banned tokens, ...),
    reassemble each document in original line order, and report
    kept/dropped counts.

    ONE grouped pass: the predicate is evaluated per line, kept lines
    are collected as (idx, line) structs, sorted in-row, and rejoined —
    no second shuffle, no join back, no Python.  NULL predicate = drop
    (a rule that cannot be evaluated does not keep the line).
    """
    keep = F.coalesce(F.expr(keep_predicate), F.lit(False))
    kept_struct = F.when(
        keep, F.struct(F.col(idx_col).alias("i"), F.col(line_col).alias("l"))
    )
    return lines.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["l"]
            ),
            sep,
        ).alias("clean_text"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.sum((~keep).cast("long")).alias("n_dropped"),
    )


def line_dedup(
    lines: DataFrame,
    max_doc_freq: int,
    id_col: str = "doc_id",
    idx_col: str = "line_idx",
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """RefinedWeb-style boilerplate removal: drop every occurrence of a
    line that appears in more than ``max_doc_freq`` distinct documents
    (nav bars, cookie banners, license footers), preserving the order
    of surviving lines.

    Plan: one grouped pass computes per-line document frequency; only
    lines EXCEEDING the cap survive that aggregate (boilerplate is by
    definition a small set, so the join side is bounded — same
    df-guard policy as the dedup tier's posting caps); a left join
    flags occurrences and ONE grouped pass reassembles.  No forced
    broadcast: AQE broadcasts the hot-line set only while it fits.
    """
    hot = (
        lines.groupBy(line_col)
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select(line_col, F.lit(True).alias("_hot"))
    )
    flagged = lines.join(hot, line_col, "left")
    keep = F.col("_hot").isNull()
    kept_struct = F.when(
        keep, F.struct(F.col(idx_col).alias("i"), F.col(line_col).alias("l"))
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["l"]
            ),
            sep,
        ).alias("clean_text"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.sum((~keep).cast("long")).alias("n_removed"),
    )


def length_bucket_batches(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
) -> DataFrame:
    """Token-budget dynamic batching with power-of-two padding — the
    batch-assembly pass a trainer's data loader runs (fairseq
    ``batch_by_size`` shape, made deterministic and distributed):
    pad every doc to the next power of two, then within each
    (group, padded length) bucket pack docs in id order,
    ``max(1, budget // padded)`` docs per batch, so every batch's
    padded token total is <= budget (single over-long docs get their
    own batch).

    Pure integer arithmetic — the padded length comes from the bit
    length of ``n-1`` (no float log2, whose libm rounding differs
    across engines).  One window per (group, padded) bucket; buckets
    are numerous and balanced, so the shuffle parallelizes.
    """
    n = (
        F.col(len_col)
        if len_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    docs = df.select(group_col, id_col, n.cast("long").alias("n_tok"))
    padded = F.when(F.col("n_tok") <= 1, F.lit(1)).otherwise(
        # shiftleft()'s bit-count arg must be a literal in the Python
        # API; the SQL form takes a column
        F.expr("shiftleft(1, length(bin(n_tok - 1)))")
    ).cast("long")
    sized = docs.withColumn("padded_len", padded)
    per_batch = F.greatest(
        F.floor(F.lit(budget) / F.col("padded_len")), F.lit(1)
    )
    w = Window.partitionBy(group_col, "padded_len").orderBy(id_col)
    rn = F.row_number().over(w)
    return sized.select(
        group_col,
        id_col,
        "n_tok",
        "padded_len",
        F.floor((rn - 1) / per_batch).cast("long").alias("batch_id"),
    )


def chat_format_lint(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """SFT conversation-structure lint (the validation pass before
    chat-template rendering): per conversation — first/last role,
    turn count, count of consecutive same-role pairs (template
    breakers), and a ``valid`` verdict (opens with system or user,
    no role repeats, closes with an assistant turn).

    One lag window + one grouped aggregate sharing the conversation
    key; first/last roles via struct min/max (deterministic argmin,
    no collect).
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.lag(F.col(role_col)).over(w)
    rep = (prev.isNotNull() & (prev == F.col(role_col))).cast("long")
    agg = (
        df.withColumn("_rep", rep)
        .groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.min(F.struct(F.col(idx_col), F.col(role_col)))[
                role_col
            ].alias("first_role"),
            F.max(F.struct(F.col(idx_col), F.col(role_col)))[
                role_col
            ].alias("last_role"),
            F.sum("_rep").alias("n_role_repeats"),
        )
    )
    valid = (
        F.col("first_role").isin("system", "user")
        & (F.col("n_role_repeats") == 0)
        & (F.col("last_role") == "assistant")
    )
    return agg.withColumn("valid", valid)


def train_val_split(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "s0",
    train_tenths: int = 8,
    val_tenths: int = 1,
) -> DataFrame:
    """Deterministic stratified train/val/test split with EXACT
    per-stratum counts: docs rank by ``md5(seed|id)`` within their
    stratum, the first ``floor(n*train/10)`` are train, the next
    ``floor(n*val/10)`` val, the rest test.  Changing the seed
    re-deals the split; changing the corpus only locally perturbs it.

    Ranking is the md5 order (engine-portable, reproducible on any
    cluster size — the ``shuffle_shards`` argument); ONE window per
    stratum plus its count, sharing the stratum-key exchange.
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h, id_col)
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        id_col,
        F.row_number().over(w).alias("_rank"),
        F.count("*").over(wn).alias("_n"),
    )
    train_n = F.floor(F.col("_n") * train_tenths / 10)
    val_n = F.floor(F.col("_n") * val_tenths / 10)
    split = (
        F.when(F.col("_rank") <= train_n, F.lit("train"))
        .when(F.col("_rank") <= train_n + val_n, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return ranked.select(group_col, id_col, split.alias("split"))


def truncate_middle(
    df: DataFrame,
    head_tokens: int,
    tail_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    marker: str = "...",
) -> DataFrame:
    """Middle truncation to a token budget (the long-context squeeze
    that keeps a document's head and tail — instructions usually
    front-load, conclusions tail-load): docs over
    ``head_tokens + tail_tokens`` whitespace tokens keep the first
    ``head_tokens`` and last ``tail_tokens`` with a marker between;
    shorter docs pass through.

    Pure array slicing in-row — zero shuffle, no UDF.
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    over = n > (head_tokens + tail_tokens)
    squeezed = F.concat_ws(
        " ",
        F.array_join(F.slice(words, 1, head_tokens), " "),
        F.lit(marker),
        F.array_join(
            F.slice(words, n - tail_tokens + 1, tail_tokens), " "
        ),
    )
    out_text = F.when(over, squeezed).otherwise(F.col(text_col))
    return df.select(
        id_col,
        n.cast("long").alias("n_tok"),
        over.alias("truncated"),
        out_text.alias("out_text"),
        F.size(F.split(out_text, " ")).cast("long").alias("out_n_tok"),
    )


def loss_mask_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    train_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """SFT loss-mask span table: per turn, its token offset range in
    the rendered conversation and whether those tokens TRAIN (the
    standard chat-SFT rule: loss on assistant turns only, prompts /
    system / tool output masked).  The trainer joins this span table
    against the packed token stream — the masking twin of
    ``pack_sequences``' lineage output.

    One cumulative-sum window per conversation (keyed, parallel);
    token counts are whitespace words, swap in a tokenizer count
    column upstream.
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    return df.select(
        conv_col,
        idx_col,
        F.col(role_col),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("start_tok"),
        n_tok.alias("n_tok"),
        F.col(role_col).isin(*train_roles).alias("trainable"),
    )


def curriculum_order(
    df: DataFrame,
    band_col: str,
    id_col: str = "doc_id",
    seed: str = "c0",
) -> DataFrame:
    """Exact global curriculum position WITHOUT a global sort:
    training order = easy bands first, random (but seeded,
    reproducible) order inside each band.

    The global index decomposes as ``band offset + within-band md5
    rank``: one keyed window ranks inside each band in parallel, and
    the offsets come from the tiny per-band count table (exclusive
    prefix sum over |bands| rows, broadcast back).  No single-
    partition window ever sees the fact table — the scale-honest
    form of ``row_number() over (order by band, md5)``.
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    wb = Window.partitionBy(band_col).orderBy(h, id_col)
    ranked = df.select(
        band_col, id_col, (F.row_number().over(wb) - 1).alias("_rk")
    )
    sizes = df.groupBy(band_col).agg(F.count("*").alias("_n"))
    wo = (
        Window.orderBy(band_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = sizes.select(
        band_col, F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off")
    )
    return ranked.join(F.broadcast(offsets), band_col).select(
        band_col,
        id_col,
        (F.col("_off") + F.col("_rk")).cast("long").alias("global_pos"),
    )


def code_fence_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fence: str = "```",
) -> DataFrame:
    """Extract fenced code blocks from markdown-ish documents (the
    code-mining pass of a training pipeline): lines between a pair of
    ``fence`` lines form one block; an unclosed trailing fence keeps
    everything after it (matching how markdown renderers treat a
    dangling fence).

    Gaps-and-islands over a line explode: block membership = running
    fence count is ODD; block id = (count+1)/2.  One keyed window +
    one grouped reassembly (array-sorted by line position, no
    collect-to-driver); docs without fences emit nothing.
    """
    lines = F.posexplode(F.split(F.col(text_col), "\n"))
    ex = df.select(F.col(id_col), lines.alias("pos", "line"))
    is_fence = (F.trim(F.col("line")) == fence).cast("long")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ex.select(
        id_col,
        "pos",
        "line",
        F.sum(is_fence).over(w).alias("_fc"),
        is_fence.alias("_isf"),
    )
    inside = (F.col("_fc") % 2 == 1) & (F.col("_isf") == 0)
    blocks = marked.filter(inside).groupBy(
        F.col(id_col), ((F.col("_fc") + 1) / 2).cast("long").alias("block_id")
    ).agg(
        F.count("*").alias("n_lines"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("code"),
    )
    return blocks


def negative_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 2,
    n_shards: int = 8,
    seed: str = "n0",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    doc pairs with ``k`` pseudo-random other docs — rank neighbors at
    offsets 1..k in a seeded md5 ordering — reproducible on any
    engine and cluster size (the ``shuffle_shards`` argument).

    Scale: ranking happens WITHIN md5-assigned shards (each a keyed
    window over corpus/n_shards rows), and negatives wrap around
    inside the shard — no global sort, no cross-shard join; since
    shard assignment is itself pseudo-random, within-shard neighbors
    are unbiased negatives.  Emits nothing for single-doc shards
    (self-pairs are never valid negatives).
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    )
    w = Window.partitionBy("_shard").orderBy("_h", id_col)
    wn = Window.partitionBy("_shard")
    ranked = df.select(
        F.col(id_col), h.alias("_h"), shard.alias("_shard")
    ).select(
        id_col,
        "_shard",
        (F.row_number().over(w) - 1).alias("_rk"),
        F.count("*").over(wn).alias("_n"),
    )
    offs = ranked.select(
        id_col,
        "_shard",
        "_rk",
        "_n",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(k), F.col("_n") - 1))
        ).alias("j"),
    ).filter(F.col("_n") > 1)
    target = (F.col("_rk") + F.col("j")) % F.col("_n")
    lhs = offs.select(
        F.col(id_col).alias("doc_id_a"),
        "_shard",
        "j",
        target.alias("_trk"),
    )
    rhs = ranked.select(
        F.col(id_col).alias("doc_id_b"),
        "_shard",
        F.col("_rk").alias("_trk"),
    )
    return lhs.join(rhs, ["_shard", "_trk"]).select(
        "doc_id_a", "j", "doc_id_b"
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Within-document paragraph dedup (self-repetition cleanup —
    generation loops and scraped boilerplate repeat whole paragraphs
    inside one document): keep each paragraph's FIRST occurrence,
    preserve original order, report kept/dropped counts.

    Pure in-row array work — no explode, no shuffle: positions of
    first occurrences via ``array_position`` inside a filter HOF over
    the paragraph array.
    """
    paras = F.split(F.col(text_col), sep)
    kept = F.filter(
        F.transform(paras, lambda p, i: F.struct(p.alias("p"), i.alias("i"))),
        lambda s: F.array_position(paras, s["p"]) == s["i"] + 1,
    )
    kept_paras = F.transform(kept, lambda s: s["p"])
    return df.select(
        id_col,
        F.size(paras).cast("long").alias("n_paras"),
        F.size(kept_paras).cast("long").alias("n_kept"),
        F.array_join(kept_paras, sep).alias("out_text"),
    )


def kwic_extract(
    df: DataFrame,
    term: str,
    context: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context extraction (the concordance snippets an
    annotation or eval pipeline samples around a term): for docs
    containing ``term`` as a whitespace token, the first occurrence's
    position and its ±``context``-word window.

    Pure in-row array ops (position + bounded slice) — zero shuffle;
    docs without the term emit nothing.
    """
    words = F.split(F.col(text_col), " ")
    pos = F.array_position(words, term)  # 1-based, 0 if absent
    start = F.greatest(pos - context, F.lit(1))
    length = pos + context - start + 1
    snippet = F.array_join(F.slice(words, start, length), " ")
    return (
        df.select(
            id_col,
            pos.cast("long").alias("pos"),
            F.when(pos > 0, snippet).alias("context"),
        )
        .filter(F.col("pos") > 0)
    )


def tool_loop_detect(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    min_run: int = 3,
    ignore: tuple[str, ...] = ("none",),
) -> DataFrame:
    """Agent-loop detection (the transcript-quality signal for stuck
    agents: the same tool invoked ``min_run``+ times consecutively):
    per conversation, the longest consecutive same-tool run, which
    tool, and the loop flag.

    Gaps-and-islands with one conversation-keyed lag window (run id =
    running count of tool CHANGES), one (conv, run) aggregate, one
    deterministic per-conversation argmax — all sharing the
    conversation key; turns using ignored tools (bare text turns)
    break runs but never form one.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    changed = (
        (F.lag(F.col(tool_col)).over(w).isNull())
        | (F.lag(F.col(tool_col)).over(w) != F.col(tool_col))
    ).cast("long")
    wc = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = df.select(
        conv_col,
        F.col(tool_col).alias("_tool"),
        F.sum(changed).over(wc).alias("_run"),
    ).filter(~F.col("_tool").isin(*ignore))
    per_run = runs.groupBy(conv_col, "_run", "_tool").agg(
        F.count("*").alias("_len")
    )
    best = F.max(
        F.struct(
            F.col("_len").alias("l"),
            (-F.col("_run")).alias("nr"),  # earliest run wins ties
            F.col("_tool").alias("t"),
        )
    )
    agg = per_run.groupBy(conv_col).agg(best.alias("_b"))
    return agg.select(
        conv_col,
        F.col("_b")["l"].alias("max_run"),
        F.col("_b")["t"].alias("loop_tool"),
        (F.col("_b")["l"] >= min_run).alias("looping"),
    )


def zipf_slope(
    df: DataFrame,
    top_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf power-law fit over the top-k vocabulary (corpus health:
    natural language sits near slope -1; generated/boilerplate text
    drifts flat or steep): least-squares slope of ln(freq) on
    ln(rank).

    Reuses the ``vocabulary`` roll-up (per-doc term counts collapse
    the corpus before any global step); ranking happens on the top-k
    table (bounded rows), the fit is the same closed form as
    ``trend_slope`` with ln-transformed coordinates.
    """
    from pyspark.sql.window import Window

    vocab = vocabulary(df, top_k=top_k, id_col=id_col, text_col=text_col)
    w = Window.orderBy(F.desc("n_occurrences"), "word")
    pts = vocab.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n_occurrences").cast("double")).alias("y"),
    )
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.select(
        F.col("n").alias("n_terms"),
        F.round(num / den, 6).alias("zipf_slope"),
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling mixture (the mT5/PaLM alpha rule:
    sample domain d with probability ``share_d^alpha`` renormalized —
    alpha < 1 upweights small domains without drowning large ones):
    per domain — raw share, temperature weight, and the effective
    epochs ``w_d * N / n_d`` the domain would be repeated under the
    weights.

    One grouped count + a 1-row total + pure arithmetic; the weight
    normalization sums |domains| doubles in-row via a sorted fold, so
    it is order-deterministic.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    total = counts.agg(
        F.sum("n").alias("_t"),
        F.sort_array(
            F.collect_list(
                F.struct(F.col(group_col).alias("g"), F.col("n").alias("n"))
            )
        ).alias("_all"),
    )
    j = counts.crossJoin(F.broadcast(total))
    share = F.col("n").cast("double") / F.col("_t")
    # denominator folds in sorted group order — deterministic
    denom = F.aggregate(
        "_all",
        F.lit(0.0),
        lambda acc, s: acc
        + F.pow(s["n"].cast("double") / F.col("_t"), F.lit(alpha)),
    )
    w = F.pow(share, F.lit(alpha)) / denom
    return j.select(
        group_col,
        "n",
        F.round(share, 6).alias("share"),
        F.round(w, 6).alias("weight"),
        F.round(w * F.col("_t").cast("double") / F.col("n"), 6).alias(
            "effective_epochs"
        ),
    )


def curation_waterfall(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 2000,
    banned: tuple[str, ...] = ("lorem",),
) -> DataFrame:
    """Curation-pipeline waterfall audit (the per-stage survivor
    counts every data report leads with): raw -> length band ->
    exact dedup (md5 canonical keep) -> banned-token drop, each stage
    applied to the previous stage's survivors, with retention vs the
    previous stage and vs raw.

    Stage survivors are computed as ONE pass of per-doc flags + a
    dedup rank window; the waterfall is then four conditional counts
    in a single aggregate — no per-stage rescans.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    len_ok = (n >= min_tokens) & (n <= max_tokens)
    has_banned = None
    low = F.lower(F.col(text_col))
    for b in banned:
        c = low.contains(b)
        has_banned = c if has_banned is None else (has_banned | c)
    flagged = df.select(
        F.col(id_col),
        len_ok.alias("_len"),
        (~has_banned).alias("_clean"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    # dedup rank among length-survivors only (stage order matters):
    # partitioning by (_h, _len) keeps dropped rows out of the
    # survivors' rank sequence
    w2 = Window.partitionBy("_h", "_len").orderBy(id_col)
    ranked = flagged.withColumn("_rk", F.row_number().over(w2))
    s1 = F.col("_len")
    s2 = s1 & (F.col("_rk") == 1)
    s3 = s2 & F.col("_clean")
    g = ranked.agg(
        F.count("*").alias("n_raw"),
        F.sum(s1.cast("long")).alias("n_len"),
        F.sum(s2.cast("long")).alias("n_dedup"),
        F.sum(s3.cast("long")).alias("n_clean"),
    )
    stages = F.stack(
        F.lit(4),
        F.lit("0_raw"), F.col("n_raw"), F.col("n_raw"),
        F.lit("1_length"), F.col("n_len"), F.col("n_raw"),
        F.lit("2_dedup"), F.col("n_dedup"), F.col("n_len"),
        F.lit("3_banned"), F.col("n_clean"), F.col("n_dedup"),
    ).alias("stage", "n_docs", "n_prev")
    return g.select(stages, F.col("n_raw").alias("_raw")).select(
        "stage",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.col("n_prev"), 6
        ).alias("retention_vs_prev"),
        F.round(
            F.col("n_docs").cast("double") / F.col("_raw"), 6
        ).alias("retention_vs_raw"),
    )


def turn_latency_by_role(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Turn latency by role transition (how long does each speaker
    take to respond? — the conversation-dynamics stat separating
    instant tool returns from slow human replies): per (previous
    role -> role) pair, count and decimal-exact mean gap seconds.

    One conversation-keyed lag window + one pair-keyed aggregate;
    first turns (no predecessor) are excluded.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev_role = F.lag(F.col(role_col)).over(w)
    gap = (epoch - F.lag(epoch).over(w)).cast("decimal(18,6)")
    pairs = df.select(
        prev_role.alias("from_role"),
        F.col(role_col).alias("to_role"),
        gap.alias("_g"),
    ).filter(F.col("from_role").isNotNull())
    return pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum("_g").cast("double") / F.count("*"), 6
        ).alias("mean_gap_s"),
    )


def canonical_dedup_gain(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: str = "<*>",
) -> DataFrame:
    """Dedup gain from canonicalization (how many more duplicates
    does template-masking surface? — the before/after evidence for
    adding a normalization stage): distinct counts under the RAW hash
    vs the CANONICAL hash (numbers / hex ids / quoted values masked,
    whitespace collapsed, casefolded), in one pass.

    Two tiny (hash) aggregates off one projection; the gain is
    ``distinct_raw - distinct_canonical`` — rows that only
    canonicalization collapses.
    """
    t = F.regexp_replace(F.col(text_col), r"[0-9a-f]{8,}", mask)
    t = F.regexp_replace(t, r"\d+", mask)
    t = F.regexp_replace(t, r"'[^']*'", mask)
    t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    hashes = df.select(
        F.md5(F.col(text_col)).alias("_hr"),
        F.md5(t).alias("_hc"),
    )
    raw = hashes.select(F.col("_hr").alias("_h")).groupBy("_h").count()
    canon = hashes.select(F.col("_hc").alias("_h")).groupBy("_h").count()
    g = raw.agg(F.count("*").alias("distinct_raw")).crossJoin(
        canon.agg(F.count("*").alias("distinct_canonical"))
    ).crossJoin(hashes.agg(F.count("*").alias("n_docs")))
    return g.select(
        "n_docs",
        "distinct_raw",
        "distinct_canonical",
        (F.col("distinct_raw") - F.col("distinct_canonical")).alias(
            "extra_dups_found"
        ),
        F.round(
            (F.col("distinct_raw") - F.col("distinct_canonical"))
            .cast("double") / F.col("distinct_raw"),
            6,
        ).alias("gain_rate"),
    )


def stutter_collapse(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-duplicate turn collapse (generation stutter cleanup:
    the same role repeating the same text back-to-back is a retry
    artifact, not conversation): keep the first of each stutter run,
    report per conversation how many turns collapsed.

    One conversation-keyed lag window; a turn drops iff BOTH role and
    text equal the previous turn's.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    same = (
        (F.lag(F.col(role_col)).over(w) == F.col(role_col))
        & (F.lag(F.col(text_col)).over(w) == F.col(text_col))
    )
    marked = df.withColumn(
        "_drop", F.coalesce(same, F.lit(False))
    )
    return marked.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.col("_drop").cast("long")).alias("n_stutters"),
        (F.count("*") - F.sum(F.col("_drop").cast("long"))).alias(
            "n_kept"
        ),
    )


def tool_call_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Tool-call stats parsed from transcript text (the CALL markers
    the regex pipeline extracts: ``CALL <tool>(args=...) ->
    status=<s> dur=<n>ms``): per (tool, status) — call count and
    decimal-exact mean duration.

    One regexp projection + one grouped pass; rows without a CALL
    marker emit nothing.  This closes the loop on the transcript
    construction: the stats recover exactly what the synthesizer
    embedded.
    """
    pat = r"CALL (\w+)\(args=([^)]*)\) -> status=(\w+) dur=(\d+)ms"
    tool = F.regexp_extract(F.col(text_col), pat, 1)
    status = F.regexp_extract(F.col(text_col), pat, 3)
    dur = F.regexp_extract(F.col(text_col), pat, 4).try_cast(
        "decimal(18,6)"
    )
    calls = df.select(
        tool.alias("tool"), status.alias("status"), dur.alias("_d")
    ).filter(F.col("tool") != "")
    return calls.groupBy("tool", "status").agg(
        F.count("*").alias("n_calls"),
        F.round(
            F.sum("_d").cast("double") / F.count("*"), 6
        ).alias("mean_dur_ms"),
    )


def first_response_sla(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    responder: str = "assistant",
    sla_sec: float = 300.0,
) -> DataFrame:
    """Time-to-first-response SLA (how long until the assistant first
    speaks? — the support-desk metric on conversations): per
    conversation — conversation start, first responder turn, the gap,
    and the SLA verdict; conversations the responder never joins are
    breaches by definition (NULL gap, met=false).

    One grouped pass: conditional min for the responder side rides
    the same aggregate as the conversation min.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    g = df.groupBy(conv_col).agg(
        F.min(epoch).alias("_t0"),
        F.min(
            F.when(F.col(role_col) == responder, epoch)
        ).alias("_tr"),
    )
    gap = F.col("_tr") - F.col("_t0")
    return g.select(
        conv_col,
        F.round(gap, 3).alias("first_response_s"),
        F.coalesce(gap <= sla_sec, F.lit(False)).alias("sla_met"),
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    word pairs (the phrase detector run before vocabulary decisions —
    'new york' scoring high PMI is the case for merging it into one
    token): ``pmi = ln(p_xy / (p_x * p_y))`` with ``p_xy`` over bigram
    positions and ``p_x`` over unigram positions, bigrams below
    ``min_count`` dropped (PMI is noise at low counts).

    Tokens split on single spaces (the corpus-wide convention shared
    with ``vocabulary``/``lm_score``).  Bigrams assemble IN-ROW
    (zip of the word array with its tail — no posexplode self-join);
    the only shuffles are the two bounded count aggregates.  Ordering
    ties break on the ROUNDED pmi then lexically, so a last-ulp ln()
    divergence between engines cannot reorder the top-k.
    """
    w = F.split(F.col(text_col), " ")
    pairs = F.arrays_zip(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
    )
    bi = df.select(F.explode(pairs).alias("p")).select(
        F.col("p").getField("0").alias("x"),
        F.col("p").getField("1").alias("y"),
    )
    uni = df.select(F.explode(w).alias("x"))
    cb = bi.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    cu = uni.groupBy("x").agg(F.count("*").alias("c_x"))
    # corpus totals as 1-row aggregates (no driver-side .count() pass)
    nb = cb.agg(F.sum("c_xy").alias("_nb"))
    nu = cu.agg(F.sum("c_x").alias("_nu"))
    # the surviving bigram set is small after min_count; the unigram
    # joins stay keyed (vocabulary can exceed broadcast size at scale)
    j = (
        cb.filter(F.col("c_xy") >= min_count)
        .join(cu.withColumnRenamed("x", "_kx"), F.col("x") == F.col("_kx"))
        .join(
            cu.withColumnRenamed("x", "_ky").withColumnRenamed(
                "c_x", "c_y"
            ),
            F.col("y") == F.col("_ky"),
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
    )
    p_xy = F.col("c_xy").cast("double") / F.col("_nb").cast("double")
    p_x = F.col("c_x").cast("double") / F.col("_nu").cast("double")
    p_y = F.col("c_y").cast("double") / F.col("_nu").cast("double")
    out = j.select(
        "x",
        "y",
        F.col("c_xy").cast("long").alias("n_pair"),
        F.round(F.log(p_xy / (p_x * p_y)), 6).alias("pmi"),
    )
    return out.orderBy(F.desc("pmi"), "x", "y").limit(top_k)


def lognormal_fit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Log-normal fit of document lengths per group (corpus-shape
    audit: organic text lengths are approximately log-normal; a
    truncated or templated source shows up as sigma collapsing or the
    fitted median drifting from the empirical one): MLE ``mu =
    mean(ln len)``, ``sigma = sqrt(mean(ln^2) - mu^2)``, and the
    fitted median ``exp(mu)``.

    One grouped aggregate; double averages rounded to 4 (the
    cross-engine float-sum parity discipline shared with
    ``lm_score``).  Empty texts are excluded (ln 0 undefined).
    """
    ln = F.log(F.length(F.col(text_col)).cast("double"))
    g = (
        df.filter(F.length(text_col) > 0)
        .select(F.col(group_col), ln.alias("_l"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("_l").alias("_m1"),
            F.avg(F.col("_l") * F.col("_l")).alias("_m2"),
        )
    )
    mu = F.col("_m1")
    sigma = F.sqrt(F.col("_m2") - mu * mu)
    return g.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(mu, 4).alias("mu_ln"),
        F.round(sigma, 4).alias("sigma_ln"),
        F.round(F.exp(mu), 4).alias("fitted_median_len"),
    )


def log_odds_terms(
    df: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    alpha0: float = 10.0,
    min_count: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """Distinctive terms per class by weighted log-odds with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    "Fightin' Words") — the screen run before curating per-domain
    vocabularies: raw frequency surfaces stopwords, TF-IDF surfaces
    rarities; the z-scored log-odds surfaces what a class actually
    over-uses relative to the rest of the corpus.

    For word ``w`` in class ``i`` vs the rest ``j``::

        a_w   = alpha0 * y_w / n              (prior ∝ corpus rate)
        delta = ln((y_iw + a_w) / (n_i + alpha0 - y_iw - a_w))
              - ln((y_jw + a_w) / (n_j + alpha0 - y_jw - a_w))
        z     = delta / sqrt(1/(y_iw + a_w) + 1/(y_jw + a_w))

    Scale shape: one (class, word) count shuffle, two bounded word /
    class roll-ups joined back KEYED on word (vocabulary can exceed
    broadcast size at 10^9 docs — AQE decides), corpus totals as
    broadcast 1-row aggregates, and the per-class top-k via a window
    ranked inside each class partition.  Ordering ties break on the
    ROUNDED z then lexically so last-ulp ln()/sqrt() divergence
    between engines cannot reorder the top-k.  Words below
    ``min_count`` in the class are dropped (z is noise there).
    """
    w = df.select(
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("cls", "word").agg(F.count("*").alias("y_iw"))
    wt = cw.groupBy("word").agg(F.sum("y_iw").alias("y_w"))
    ct = cw.groupBy("cls").agg(F.sum("y_iw").alias("n_i"))
    tot = wt.agg(F.sum("y_w").alias("_n"))
    j = (
        cw.filter(F.col("y_iw") >= min_count)
        .join(wt, "word")
        .join(ct, "cls")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("_n").cast("double")
    a_w = F.lit(alpha0) * F.col("y_w").cast("double") / n
    y_iw = F.col("y_iw").cast("double")
    y_jw = F.col("y_w").cast("double") - y_iw
    n_i = F.col("n_i").cast("double")
    n_j = n - n_i
    delta = F.log(
        (y_iw + a_w) / (n_i + F.lit(alpha0) - y_iw - a_w)
    ) - F.log((y_jw + a_w) / (n_j + F.lit(alpha0) - y_jw - a_w))
    var = 1.0 / (y_iw + a_w) + 1.0 / (y_jw + a_w)
    scored = j.select(
        F.col("cls").alias(class_col),
        "word",
        F.col("y_iw").cast("long").alias("n_in_class"),
        F.round(delta / F.sqrt(var), 6).alias("z_logodds"),
    )
    rk = F.row_number().over(
        Window.partitionBy(class_col).orderBy(
            F.desc("z_logodds"), F.asc("word")
        )
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= top_k)
        .select(class_col, "word", "n_in_class", "z_logodds",
                F.col("rk").cast("int").alias("rk"))
    )


def hapax_richness(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Lexical-richness audit per group: token count, type count,
    type-token ratio, and the hapax-legomena share (types occurring
    exactly once).  A templated/boilerplate feed shows a collapsed
    TTR and a starved hapax share; OCR noise or mojibake shows the
    opposite spike — the two cheapest corpus-health dials after raw
    length.

    Two keyed shuffles total — (group, word) counts, then the group
    roll-up — both with map-side partial aggregation; no windows, no
    joins.
    """
    w = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("grp", "word").agg(F.count("*").alias("c"))
    g = cw.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    return g.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("ttr"),
        F.round(
            F.col("n_hapax").cast("double")
            / F.col("n_types").cast("double"),
            6,
        ).alias("hapax_share"),
    )


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple = (100, 1000, 10000),
) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary for each k — the
    chart that sizes a tokenizer/vocab decision ("32k words cover
    97.1% of the stream").  Output: one row per k with the covered
    token count and coverage share.

    Scale shape: the word-count aggregate shuffles once; the ranking
    is a TakeOrdered of max(ks) rows (NEVER a full vocabulary sort —
    Heaps' law makes the vocab sublinear but still unbounded), and
    the conditional roll-up over that bounded top set is one tiny
    aggregate.  The corpus total joins in as a broadcast 1-row
    aggregate, so coverage at k is exact even though only the top
    max(ks) words ship to the final stage.
    """
    w = df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
    c = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = c.agg(F.sum("c").alias("_n"))
    top = c.orderBy(F.desc("c"), F.asc("word")).limit(max(ks))
    rk = F.row_number().over(Window.orderBy(F.desc("c"), F.asc("word")))
    ranked = top.withColumn("rk", rk)  # bounded: <= max(ks) rows
    covered = ranked.agg(
        *[
            F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(0))
            .cast("long")
            .alias(f"_cov{k}")
            for k in ks
        ]
    )
    wide = covered.crossJoin(F.broadcast(tot))
    rows = [
        F.struct(
            F.lit(k).cast("int").alias("k"),
            F.col(f"_cov{k}").alias("covered_tokens"),
            F.round(
                F.col(f"_cov{k}").cast("double") / F.col("_n").cast("double"),
                6,
            ).alias("coverage"),
        )
        for k in ks
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.k", "r.covered_tokens", "r.coverage")


def response_echo_rate(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    responder: str = "assistant",
    prompter: str = "user",
) -> DataFrame:
    """How much of the prompt the responder just parrots back: for
    every responder turn immediately preceded by a prompter turn in
    the same conversation, the word-set Jaccard between the two
    texts, rolled up per tool (mean / max / pair count).  High echo
    is a training-data smell (degenerate SFT pairs, copy-through
    tool wrappers); the per-tool split localizes it.

    One conversation-keyed window (lag) feeds the pair filter; the
    set overlap runs IN-ROW via ``array_intersect``/``array_union``
    on deduped word arrays — no explode, no self-join; the roll-up
    is one bounded aggregate keyed on tool.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    words = F.array_distinct(F.split(F.col(text_col), " "))
    t = df.select(
        F.col(tool_col).alias("tool"),
        F.col(role_col).alias("_role"),
        words.alias("_w"),
        F.lag(F.col(role_col)).over(w).alias("_prev_role"),
        F.lag(words).over(w).alias("_pw"),
    )
    pairs = t.filter(
        (F.col("_role") == responder) & (F.col("_prev_role") == prompter)
    )
    common = F.size(F.array_intersect(F.col("_w"), F.col("_pw")))
    union = F.size(F.array_union(F.col("_w"), F.col("_pw")))
    jac = F.when(
        union > 0, common.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
    return (
        pairs.select("tool", jac.alias("_j"))
        .groupBy("tool")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("_j"), 6).alias("mean_echo"),
            F.round(F.max("_j"), 6).alias("max_echo"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list,
    ks: tuple = (2, 5, 10),
) -> DataFrame:
    """k-anonymity risk audit over a quasi-identifier tuple: for each
    threshold k, how many QI equivalence classes have fewer than k
    rows and what share of all rows sits in them — the release-gate
    number privacy review asks for before a corpus ships (a row in a
    size-1 class is re-identifiable by its QI alone; `scrub_pii`
    masks direct identifiers, this audits the indirect ones).

    One QI-keyed count aggregate (map-side partials), then a single
    bounded conditional roll-up emitting one row per k — the fact
    table never shuffles twice.
    """
    g = df.groupBy(*qi_cols).agg(F.count("*").alias("_c"))
    agg = g.agg(
        F.sum("_c").cast("long").alias("_rows"),
        F.count("*").cast("long").alias("_groups"),
        *[
            F.sum(F.when(F.col("_c") < k, 1).otherwise(0))
            .cast("long")
            .alias(f"_gr{k}")
            for k in ks
        ],
        *[
            F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(0))
            .cast("long")
            .alias(f"_rw{k}")
            for k in ks
        ],
    )
    rows = [
        F.struct(
            F.lit(k).cast("int").alias("k"),
            F.col(f"_gr{k}").alias("groups_at_risk"),
            F.col(f"_rw{k}").alias("rows_at_risk"),
            F.round(
                F.col(f"_rw{k}").cast("double")
                / F.col("_rows").cast("double"),
                6,
            ).alias("row_share_at_risk"),
        )
        for k in ks
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.k", "r.groups_at_risk", "r.rows_at_risk", "r.row_share_at_risk"
    )


def l_diversity_audit(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    ls: tuple = (2, 3),
) -> DataFrame:
    """l-diversity risk audit: for each threshold l, how many QI
    equivalence classes carry FEWER than l distinct values of the
    sensitive attribute, and what share of rows sits in them — the
    audit k-anonymity misses (a 1000-row class where everyone shares
    the same sensitive value discloses it to anyone who can name the
    class; Machanavajjhala et al., ICDE'06).

    One (QI, sensitive) dedup-count pass with map-side partials, one
    QI roll-up carrying both the class row count and its distinct
    sensitive count, then a single bounded conditional roll-up — the
    fact table never shuffles twice.
    """
    per = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count("*").alias("_c")
    )
    g = per.groupBy(*qi_cols).agg(
        F.sum("_c").alias("_rows_g"),
        F.count("*").alias("_l"),
    )
    agg = g.agg(
        F.sum("_rows_g").cast("long").alias("_rows"),
        F.count("*").cast("long").alias("_groups"),
        *[
            F.sum(F.when(F.col("_l") < l, 1).otherwise(0))
            .cast("long")
            .alias(f"_gr{l}")
            for l in ls
        ],
        *[
            F.sum(
                F.when(F.col("_l") < l, F.col("_rows_g")).otherwise(0)
            )
            .cast("long")
            .alias(f"_rw{l}")
            for l in ls
        ],
    )
    rows = [
        F.struct(
            F.lit(l).cast("int").alias("l"),
            F.col(f"_gr{l}").alias("groups_below"),
            F.col(f"_rw{l}").alias("rows_at_risk"),
            F.round(
                F.col(f"_rw{l}").cast("double")
                / F.col("_rows").cast("double"),
                6,
            ).alias("row_share_at_risk"),
        )
        for l in ls
    ]
    return agg.select(
        F.explode(F.array(*rows)).alias("_s")
    ).select("_s.*")


def token_budget_sample(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "s61",
    prefix_buckets: int = 256,
) -> DataFrame:
    """Per-source token-budget prefix sampling: walk each source's
    documents in portable-md5 order and keep a doc iff the tokens
    accumulated BEFORE it are still under ``budget`` — the standard
    "take ~N tokens per domain" pretraining-mix primitive (the doc
    that crosses the budget is kept, so every source reaches it).

    Scale design (the reason this is not one global window): a naive
    ``sum() over (partition by source order by md5)`` puts an entire
    source — possibly 10^11 rows — on ONE task.  Instead the md5 order
    is split by its first byte into ``prefix_buckets`` ranges:

    * per (source, bucket) token totals — one map-side-combined
      aggregate, ``n_sources x 256`` rows;
    * running total across buckets per source — a window over that
      bounded table only;
    * the per-doc cumulative is then bucket-presum + a window WITHIN
      (source, bucket), shrinking the sequential span 256x (and the
      bucket fan-out is a constant, so it can scale with the corpus).

    Row set is identical to the single-window formulation (md5 order
    is refined by id to a total order), deterministic on any engine
    and any cluster size.
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        F.col(group_col),
        F.col(id_col),
        h.alias("_h"),
        F.conv(F.substring(h, 1, 2), 16, 10)
        .cast("int")
        .alias("_b"),
        toks.cast("long").alias("n_tokens"),
    )
    per_bucket = base.groupBy(group_col, "_b").agg(
        F.sum("n_tokens").alias("_bt")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    presum = per_bucket.select(
        group_col,
        "_b",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_pre"),
    )
    win = (
        Window.partitionBy(group_col, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.join(presum, [group_col, "_b"])
        .withColumn(
            "tokens_before",
            F.col("_pre") + F.coalesce(F.sum("n_tokens").over(win), F.lit(0)),
        )
        .filter(F.col("tokens_before") < F.lit(budget))
    )
    return out.select(
        group_col,
        id_col,
        "n_tokens",
        (F.col("tokens_before") + F.col("n_tokens")).alias("cum_tokens"),
    )


def flesch_reading_ease(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source Flesch reading-ease profile:

        206.835 - 1.015 * (words/sentences) - 84.6 * (syllables/words)

    with the standard cheap proxies — words = whitespace tokens,
    sentences = runs of ``[.!?]`` (floored at 1), syllables = vowel
    groups ``[aeiouy]+`` of the lowercased text.  Output per source:
    doc count, mean score, mean words-per-sentence, mean
    syllables-per-word — the readability band the quality-scoring
    ensemble can cut on.

    Everything is codegen'd regex arithmetic (regexp_extract_all +
    size) folded by ONE map-side-combined aggregate; no UDF, no
    shuffle beyond |sources| rows.
    """
    lower = F.lower(F.col(text_col))
    words = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    sylls = F.size(F.regexp_extract_all(lower, F.lit(r"[aeiouy]+"), F.lit(0)))
    per = df.select(
        F.col(group_col),
        words.cast("double").alias("_w"),
        sents.cast("double").alias("_s"),
        sylls.cast("double").alias("_y"),
    ).filter(F.col("_w") > 0)
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("_w") / F.col("_s"))
        - F.lit(84.6) * (F.col("_y") / F.col("_w"))
    )
    return (
        per.select(group_col, "_w", "_s", "_y", score.alias("_f"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_f"), 4).alias("mean_flesch"),
            F.round(F.avg(F.col("_w") / F.col("_s")), 4).alias(
                "mean_words_per_sentence"
            ),
            F.round(F.avg(F.col("_y") / F.col("_w")), 4).alias(
                "mean_syllables_per_word"
            ),
        )
    )


def trigram_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source corpus cross-entropy under a char-trigram unigram LM
    trained on the WHOLE corpus: each doc scores
    mean over its trigram occurrences of -log2 P(tri), with
    P(tri) = corpus_count(tri) / corpus_total — the cheap perplexity
    proxy that ranks sources by "how surprising is this text to the
    rest of the corpus" (templated feeds score low bits, noise and
    off-distribution text score high) without shipping a model.

    Plan: trigrams explode via a generator expression (sequence +
    substring, no UDF), collapse immediately to per-doc trigram COUNTS
    (the only exploded shuffle, map-side combinable), the LM table is
    one further keyed aggregate over the bounded trigram vocabulary,
    and the corpus total is a 1-row broadcast.  The doc-score join is
    keyed on trigram — both sides pre-aggregated, never raw positions.
    """
    t = F.lower(F.col(text_col))
    g = F.expr(
        f"transform(sequence(1, length(lower({text_col})) - 2), "
        f"i -> substring(lower({text_col}), i, 3))"
    )
    e = (
        df.filter(F.length(t) >= 3)
        .select(F.col(id_col), F.col(group_col), F.explode(g).alias("_t"))
    )
    dc = e.groupBy(id_col, group_col, "_t").agg(
        F.count(F.lit(1)).alias("_c")
    )
    lm = dc.groupBy("_t").agg(F.sum("_c").alias("_cc"))
    total = lm.agg(F.sum("_cc").cast("double").alias("_n"))
    doc = (
        dc.join(lm, "_t")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col, group_col)
        .agg(
            (
                F.sum(F.col("_c") * F.log2(F.col("_n") / F.col("_cc")))
                / F.sum("_c")
            ).alias("_bits")
        )
    )
    return (
        doc.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_bits"), 4).alias("mean_bits_per_trigram"),
            F.round(F.min("_bits"), 4).alias("min_bits"),
            F.round(F.max("_bits"), 4).alias("max_bits"),
        )
    )


def blocklist_scan(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source blocklist audit: token-level hit counts against a
    bounded term list (the toxicity / bad-word / policy prefilter
    shape).  Output per source: docs scanned, docs flagged, total
    hits, flagged share.

    The term list compiles INTO THE PLAN as an array literal scanned
    by a codegen'd higher-order filter — for a bounded blocklist this
    beats the broadcast-join formulation (no join, no dim table, whole
    stage codegen); when the pattern table is itself large or changes
    per run, switch to the exploded-token broadcast join that
    ``decontaminate`` uses.  Token split mirrors the quality-score
    family (lowercased whitespace split), so hit semantics line up
    with stopword/token stats.
    """
    lits = F.array(*[F.lit(t) for t in terms])
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hits = F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))
    per = df.select(F.col(group_col), hits.alias("_h"))
    return per.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_h") > 0).cast("int")).cast("long").alias(
            "flagged_docs"
        ),
        F.sum("_h").cast("long").alias("total_hits"),
        F.round(F.avg((F.col("_h") > 0).cast("double")), 4).alias(
            "flagged_rate"
        ),
    )


def heaps_law_fit(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "s67",
    prefix_buckets: int = 256,
) -> DataFrame:
    """Heaps' law fit per source — V = k * N^beta over the cumulative
    (tokens scanned, distinct vocabulary) curve in portable-md5
    ingestion order: the "is this source mined out" saturation number
    (beta near 1 = vocabulary still growing linearly; beta well under
    1 = diminishing novelty; complements ``ngram_novelty``'s per-doc
    share with a corpus-level exponent).

    Plan: one explode builds the per-(source, word) FIRST-occurrence
    doc (min over the md5-order struct — map-side combinable); firsts
    roll up to a per-doc new-word count; both cumulative measures
    (tokens N_d, vocabulary V_d) then use the bucket-presum
    decomposition ``token_budget_sample`` introduced — per-(source,
    md5-prefix-bucket) totals, a window over that bounded table, and
    the sequential span shrinks ``prefix_buckets``-fold instead of one
    task per source.  The log-log OLS fit folds through raw power sums
    in one final keyed aggregate.
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(group_col),
        F.col(id_col),
        h.alias("_h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_b"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long")
        .alias("_nt"),
        F.array_distinct(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("_ws"),
    )
    words = base.select(
        group_col, id_col, "_h", F.explode("_ws").alias("_w")
    )
    firsts = (
        words.groupBy(group_col, "_w")
        .agg(F.min(F.struct("_h", id_col)).alias("_f"))
        .select(group_col, F.col("_f")[id_col].alias(id_col))
        .groupBy(group_col, id_col)
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    docs = base.drop("_ws").join(
        firsts, [group_col, id_col], "left"
    ).withColumn("_v", F.coalesce(F.col("_v"), F.lit(0)))
    per_bucket = docs.groupBy(group_col, "_b").agg(
        F.sum("_nt").alias("_btn"), F.sum("_v").alias("_btv")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    presum = per_bucket.select(
        group_col,
        "_b",
        F.coalesce(F.sum("_btn").over(wb), F.lit(0)).alias("_pn"),
        F.coalesce(F.sum("_btv").over(wb), F.lit(0)).alias("_pv"),
    )
    win = (
        Window.partitionBy(group_col, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        docs.join(presum, [group_col, "_b"])
        .select(
            group_col,
            (F.col("_pn") + F.sum("_nt").over(win)).alias("_N"),
            (F.col("_pv") + F.sum("_v").over(win)).alias("_V"),
        )
    )
    x = F.log(F.col("_N").cast("double"))
    y = F.log(F.col("_V").cast("double"))
    agg = cum.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(x * y).alias("_sxy"),
        F.max("_N").alias("_Nf"),
        F.max("_V").alias("_Vf"),
    )
    beta = (
        F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    return agg.filter(F.col("_n") >= 2).select(
        group_col,
        F.col("_n").cast("long").alias("n_docs"),
        F.col("_Nf").cast("long").alias("n_tokens_total"),
        F.col("_Vf").cast("long").alias("vocab_total"),
        F.round(beta, 4).alias("heaps_beta"),
        F.round(
            F.exp((F.col("_sy") - beta * F.col("_sx")) / F.col("_n")), 4
        ).alias("heaps_k"),
    )


def yules_k(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Yule's K characteristic + Simpson's repeat-rate per group — the
    frequency-spectrum lexical-diversity pair that, unlike the raw
    type-token ratio (``hapax_richness``), is length-invariant:
    ``K = 10^4 * (sum_w c_w^2 - N) / N^2`` and Simpson's
    ``D = sum_w c_w (c_w - 1) / (N (N - 1))`` — the probability two
    sampled tokens are the same word.  High K flags templated or
    looping text (the repetition smell ``repetition_stats`` measures
    positionally, measured distributionally here).

    Same scale shape as ``hapax_richness``: two keyed shuffles —
    (group, word) counts, then the group roll-up of the integer power
    sums — both with map-side partials; the division happens once per
    group.
    """
    w = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("grp", "word").agg(F.count("*").alias("c"))
    g = cw.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_s2"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("_rep"),
    )
    n = F.col("n_tokens").cast("double")
    return g.filter(F.col("n_tokens") >= 2).select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_types",
        F.round(
            F.lit(1.0e4) * (F.col("_s2") - F.col("n_tokens")) / (n * n), 6
        ).alias("yules_k"),
        F.round(
            F.col("_rep").cast("double") / (n * (n - 1.0)), 6
        ).alias("simpson_d"),
    )


def chao1_vocab(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Chao1 unseen-vocabulary estimate + Good-Turing coverage per
    group — "how much vocabulary does this source still hide": with
    ``V`` observed types, ``V1`` hapax and ``V2`` dis legomena, the
    bias-corrected Chao1 richness floor is
    ``V + V1*(V1-1) / (2*(V2+1))`` (defined even when V2 = 0), and the
    Good-Turing sample coverage ``C = 1 - V1/N`` is the probability
    the next token is an already-seen type.  ``heaps_law_fit``
    estimates the growth EXPONENT; this estimates the ASYMPTOTE — the
    pair decides whether a source is mined out.

    Same scale shape as ``hapax_richness``/``yules_k``: two keyed
    shuffles over (group, word) counts then the group roll-up of
    integer spectrum sums; no windows, no joins.
    """
    w = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("grp", "word").agg(F.count("*").alias("c"))
    g = cw.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
    )
    v1 = F.col("v1").cast("double")
    return g.filter(F.col("n_tokens") >= 1).select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_types",
        "v1",
        "v2",
        F.round(
            F.col("n_types")
            + v1 * (v1 - 1.0) / (2.0 * (F.col("v2") + 1.0)),
            4,
        ).alias("chao1_est"),
        F.round(
            F.lit(1.0) - v1 / F.col("n_tokens").cast("double"), 6
        ).alias("gt_coverage"),
    )


def source_vocab_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus-level vocabulary overlap between source pairs — the
    distribution-level dedup screen ABOVE documents ("are these two
    feeds the same crawl?"): each source's top-``top_k`` words by
    frequency (ties broken (count desc, word asc) — deterministic),
    then pairwise intersection / Jaccard over the BOUNDED per-source
    set table.

    Scale shape: one (source, word) count shuffle; top-k retention
    windows partition by source; the pair join touches only the
    |sources|-row set table (in-row ``array_intersect`` — sizes only,
    order-free).  The fact table is never self-joined.
    """
    w = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("grp", "word").agg(F.count("*").alias("c"))
    rk = Window.partitionBy("grp").orderBy(
        F.col("c").desc(), F.col("word").asc()
    )
    top = cw.select(
        "grp", "word", F.row_number().over(rk).alias("_r")
    ).filter(F.col("_r") <= top_k)
    sets = top.groupBy("grp").agg(
        F.sort_array(F.collect_list("word")).alias("_ws")
    )
    a = sets.select(
        F.col("grp").alias("source_a"), F.col("_ws").alias("_wa")
    )
    b = sets.select(
        F.col("grp").alias("source_b"), F.col("_ws").alias("_wb")
    )
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))
    inter = F.size(F.array_intersect("_wa", "_wb"))
    union = F.size("_wa") + F.size("_wb") - inter
    return pairs.select(
        "source_a",
        "source_b",
        inter.cast("long").alias("n_common"),
        F.round(inter.cast("double") / union, 6).alias("jaccard_topk"),
    )


def oov_rate(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus-global
    top-``vocab_size`` vocabulary — the tokenizer-coverage proxy a
    vocab decision needs per FEED (``vocab_coverage_curve`` answers
    it for the corpus as a whole; a source whose OOV rate is 3x the
    others will tokenize into fertility blowup, see
    ``tokenizer_fertility``): share of token OCCURRENCES outside the
    vocabulary.

    One (source, word) count shuffle; the global vocabulary rolls up
    from those counts (map-side partials), retains top-k with a
    deterministic (count desc, word asc) rank, and joins back against
    the bounded per-source word table — AQE decides the broadcast.
    """
    w = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    cw = w.groupBy("grp", "word").agg(F.count("*").alias("c"))
    gw = cw.groupBy("word").agg(F.sum("c").alias("gc"))
    # orderBy + limit compiles to TakeOrderedAndProject — the top-k
    # never materializes a global sort (the vocab_topk discipline).
    vocab = (
        gw.orderBy(F.col("gc").desc(), F.col("word").asc())
        .limit(vocab_size)
        .select("word", F.lit(True).alias("_in_vocab"))
    )
    j = cw.join(vocab, on="word", how="left")
    agg = j.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_oov",
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens"), 6
        ).alias("oov_rate"),
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    threshold: float = 0.2,
) -> DataFrame:
    """t-closeness risk audit (Li, Li & Venkatasubramanian, ICDE'07) —
    the audit `l_diversity_audit` misses: a QI class can be l-diverse
    yet still leak when its SENSITIVE-VALUE DISTRIBUTION skews far
    from the corpus-wide one (e.g. 90% of one diagnosis in a class vs
    10% globally).  For a categorical sensitive attribute the earth-
    mover distance reduces to total-variation distance
    ``½ Σ |p_class − p_global|``; classes with distance > t fail.

    One (QI, sensitive) count pass, the bounded global mix joined back
    (AQE decides the broadcast), and the per-class distance folds
    IN-ROW over the category-sorted cell list — absent categories
    contribute their full global mass, so the fold runs over the FULL
    category list per class (bounded by sensitive-attribute
    cardinality).  Emits one row per QI class.
    """
    qi = [F.col(c) for c in qi_cols]
    per = df.groupBy(*qi, F.col(sensitive_col).alias("_s")).agg(
        F.count("*").alias("_c")
    )
    gm = per.groupBy("_s").agg(F.sum("_c").alias("_gc"))
    tot = gm.agg(F.sum("_gc").alias("_gt"))
    mix = gm.crossJoin(tot).select(
        "_s", (F.col("_gc").cast("double") / F.col("_gt")).alias("_gp")
    )
    cls = per.groupBy(*qi_cols).agg(F.sum("_c").alias("_n"))
    cells = (
        cls.crossJoin(mix)
        .join(per, [*qi_cols, "_s"], "left")
        .select(
            *qi_cols,
            "_n",
            "_s",
            (
                F.coalesce(F.col("_c"), F.lit(0)).cast("double")
                / F.col("_n").cast("double")
            ).alias("_p"),
            "_gp",
        )
    )
    per_cls = cells.groupBy(*qi_cols, "_n").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_s").alias("s"),
                    F.col("_p").alias("p"),
                    F.col("_gp").alias("q"),
                )
            )
        ).alias("_cells")
    )
    tv = (
        F.aggregate(
            F.col("_cells"),
            F.lit(0.0),
            lambda a, e: a + F.abs(e["p"] - e["q"]),
        )
        / 2.0
    )
    return per_cls.select(
        *qi_cols,
        F.col("_n").cast("long").alias("class_rows"),
        F.round(tv, 6).alias("tv_distance"),
        (tv > F.lit(float(threshold))).alias("fails_t"),
    )


_DIRICHLET_MU = 2000.0


def dirichlet_lm_scores(
    df: DataFrame,
    terms: list[str],
    mu: float = _DIRICHLET_MU,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001) — the language-model scorer beside `bm25_scores`:
    ``score(q,d) = Σ_t ln((tf_t + μ·p_t) / (|d| + μ))`` where ``p_t``
    is the collection unigram probability.  Dirichlet smoothing is
    what makes the zero-tf case well-defined (a term absent from the
    doc still contributes its collection mass), so every doc gets a
    finite score.

    Same plan shape as BM25: per-term tf via array HOFs over the
    split text (no explode), collection stats (Σ tf_t and total token
    count — integer-exact sums) in ONE 1-row aggregate crossJoined
    back (AQE broadcasts it), and the score sums terms in LITERAL
    LIST ORDER so double addition is deterministic and
    engine-portable.
    """
    if not terms:
        raise ValueError("dirichlet_lm_scores requires a non-empty term list")
    words = F.split(F.col(text_col), " ")
    proj = [F.col(id_col), F.size(words).alias("_dl")]
    for i, t in enumerate(terms):
        proj.append(
            F.size(F.filter(words, lambda w: w == F.lit(t))).alias(f"_tf{i}")
        )
    per_doc = df.select(*proj)
    aggs = [F.sum("_dl").alias("_toks")] + [
        F.sum(f"_tf{i}").alias(f"_ctf{i}") for i in range(len(terms))
    ]
    stats = per_doc.agg(*aggs)
    scored = per_doc.crossJoin(stats)
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        p_t = F.col(f"_ctf{i}").cast("double") / F.col("_toks").cast("double")
        term = F.log(
            (tf + F.lit(float(mu)) * p_t)
            / (F.col("_dl").cast("double") + F.lit(float(mu)))
        )
        score = term if score is None else score + term
    return scored.select(
        id_col, F.round(score, round_digits).alias("lm_score")
    )


def diversified_topk(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    source_col: str,
    k: int = 10,
    per_source_cap: int = 3,
) -> DataFrame:
    """Diversity-capped top-k re-ranking — the search-diversity
    counterpart of `rrf_fusion`: per query, keep the k best candidates
    subject to AT MOST ``per_source_cap`` per source (the standard
    "don't let one domain monopolise the result page / training
    batch" constraint, the cheap deterministic stand-in for MMR).

    Two window ranks — within (query, source) then within query over
    the survivors — both ordered (score desc, id asc) so ties are
    deterministic.  Each rank is one hash shuffle on its key; no
    self-join, no global sort; at 10^12 candidates the partition
    count follows query cardinality.
    """
    base = df.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(source_col).alias("src"),
    )
    w_src = Window.partitionBy("q", "src").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    w_q = Window.partitionBy("q").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        base.withColumn("_sr", F.row_number().over(w_src))
        .filter(F.col("_sr") <= per_source_cap)
        .withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= k)
        .select("q", "rank", "id", "src", "score")
    )


def rake_keyphrases(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    stopwords: tuple[str, ...] = ("the", "a", "and", "of", "to", "in", "is"),
    k: int = 10,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) per group —
    unsupervised keyphrases for corpus triage: candidate phrases are
    maximal stopword-free token runs; word score = degree/frequency
    where degree sums the lengths of phrases containing the word;
    phrase score sums its word scores; top-k phrases per group by
    (score desc, phrase asc).

    Stopword boundaries come from TWO passes of one global
    regexp_replace (adjacent stopwords share a delimiting space, which
    a single pass would half-consume) — both engines replay the same
    two passes, so the phrase set is identical by construction.
    Word-score sums are decimal-quantized so the per-phrase fold is
    exact on any engine.  Three keyed shuffles (word stats, score
    join, top-k rank), all on (group, token)-grade keys.
    """
    stop_re = "( (?:" + "|".join(stopwords) + ") )"
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    cut = F.regexp_replace(
        F.regexp_replace(padded, stop_re, " | "), stop_re, " | "
    )
    phrases = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(cut, r"\|")).alias("ph_raw"),
    ).select(
        "grp", F.trim(F.col("ph_raw")).alias("phrase")
    ).filter(F.col("phrase") != "")
    words = phrases.select(
        "grp",
        "phrase",
        F.split(F.col("phrase"), " ").alias("ws"),
    ).select(
        "grp",
        "phrase",
        F.size("ws").alias("plen"),
        F.explode("ws").alias("w"),
    )
    wstats = words.groupBy("grp", "w").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    wscore = wstats.select(
        "grp",
        "w",
        F.round(
            F.col("deg").cast("double") / F.col("freq").cast("double"), 8
        )
        .cast("decimal(20,8)")
        .alias("wsc"),
    )
    # one phrase string occurs many times; every occurrence carries the
    # identical decimal word-score sum, so dividing the exact summed
    # total by the occurrence count recovers the per-phrase score with
    # one deterministic double division.
    per_occ = (
        words.select("grp", "phrase", "plen", "w")
        .join(wscore, ["grp", "w"])
        .groupBy("grp", "phrase", "plen")
        .agg(
            F.count("*").alias("occ_words"),
            F.sum("wsc").alias("sum_all"),
        )
    )
    occurrences = phrases.groupBy("grp", "phrase").agg(
        F.count("*").alias("n_occ")
    )
    scored = per_occ.join(occurrences, ["grp", "phrase"]).select(
        "grp",
        "phrase",
        "n_occ",
        (F.col("sum_all").cast("double") / F.col("n_occ").cast("double"))
        .alias("score_d"),
    )
    w_rank = Window.partitionBy("grp").orderBy(
        F.col("score_d").desc(), F.col("phrase").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= k
    ).select(
        F.col("grp").alias(group_col),
        "rank",
        "phrase",
        "n_occ",
        F.round("score_d", 6).alias("score"),
    )


def markdown_structure(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Markdown structure profile — the corpus-prep triage pass that
    decides chunking and code/prose routing before tokenization:
    heading counts by level, fenced code blocks, inline links, bullet
    lines, and the fraction of characters living inside code fences
    (the number that routes a doc to the code or the prose pipeline).

    Unpaired trailing fences count as structure but contribute no code
    span (the (?s) non-greedy pair regex only consumes closed pairs).
    Pure codegen'd regex, zero exchanges.
    """
    t = F.col(text_col)
    code_spans = F.regexp_extract_all(t, F.lit(r"(?s)```(.*?)```"), 1)
    code_chars = F.aggregate(
        code_spans,
        F.lit(0).cast("long"),
        lambda a, s: a + F.length(s),
    )
    total = F.length(t)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(r"(?m)^# ")).cast("int").alias("n_h1"),
        F.regexp_count(t, F.lit(r"(?m)^## ")).cast("int").alias("n_h2"),
        F.regexp_count(t, F.lit(r"(?m)^### ")).cast("int").alias("n_h3"),
        F.size(code_spans).alias("n_code_blocks"),
        F.regexp_count(t, F.lit(r"\[[^\]]*\]\([^)]*\)"))
        .cast("int")
        .alias("n_links"),
        F.regexp_count(t, F.lit(r"(?m)^- ")).cast("int").alias("n_bullets"),
        F.round(
            F.when(
                total > 0, code_chars.cast("double") / total.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("code_char_frac"),
    )


def prompt_injection_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_threshold: int = 4,
) -> DataFrame:
    """Prompt-injection screen for training-corpus ingestion — the
    security filter a web-scale LLM pipeline runs BEFORE text becomes
    training data: instruction-override phrases ("ignore previous
    instructions"), chat-template role markers leaking into plain
    text (<|im_start|>, [INST], <<SYS>>), long base64 blobs (payload
    smuggling), and zero-width/invisible characters (the classic
    hidden-instruction carrier).  Risk score = pinned integer weights
    (override 3, role marker 2, base64 1, any-invisible 2).

    Pure codegen'd regex counts, zero exchanges; the score is integer
    arithmetic end to end.
    """
    t = F.col(text_col)
    override = F.regexp_count(
        t,
        F.lit(
            r"(?i)(ignore|disregard) (all |any )?"
            r"(previous|prior|above) (instructions|prompts)"
            r"|(?i)you are now\b|(?i)reveal your (system )?prompt"
        ),
    ).cast("int")
    role = F.regexp_count(
        t,
        F.lit(r"<\|im_start\|>|\[INST\]|<<SYS>>|### Instruction"),
    ).cast("int")
    b64 = F.regexp_count(
        t, F.lit(r"[A-Za-z0-9+/]{40,}={0,2}")
    ).cast("int")
    invis = F.regexp_count(
        t, F.lit("[​‌‍⁠﻿]")
    ).cast("int")
    score = (
        override * 3
        + role * 2
        + b64
        + F.when(invis > 0, 2).otherwise(0)
    )
    return df.select(
        F.col(id_col),
        override.alias("n_override"),
        role.alias("n_role_markers"),
        b64.alias("n_b64_blobs"),
        invis.alias("n_invisible"),
        score.alias("risk_score"),
        (score >= flag_threshold).alias("flagged"),
    )


def mixed_script_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Homoglyph / mixed-script spoofing audit — Cyrillic 'а' inside a
    Latin word is invisible to readers but poisons dedup keys,
    tokenizers, and URL allowlists; this screen counts per-script
    letters and, the real spoof unit, TOKENS mixing Latin with
    Cyrillic or Greek in one word.

    The per-token check folds in-row over the whitespace split (HOFs,
    no explode); script classes are codegen'd unicode-range regexes.
    Zero exchanges.
    """
    t = F.col(text_col)
    lat = F.regexp_count(t, F.lit("[A-Za-z]")).cast("int")
    cyr = F.regexp_count(t, F.lit("[Ѐ-ӿ]")).cast("int")
    grk = F.regexp_count(t, F.lit("[Ͱ-Ͽ]")).cast("int")
    toks = F.split(t, r"\s+")
    mixed = F.size(
        F.filter(
            toks,
            lambda w: w.rlike("[A-Za-z]")
            & w.rlike("[Ѐ-ӿͰ-Ͽ]"),
        )
    )
    n_toks = F.size(toks)
    return df.select(
        F.col(id_col),
        lat.alias("n_latin"),
        cyr.alias("n_cyrillic"),
        grk.alias("n_greek"),
        mixed.alias("n_mixed_tokens"),
        F.round(
            F.when(
                n_toks > 0,
                mixed.cast("double") / n_toks.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mixed_token_frac"),
        (mixed > 0).alias("suspicious"),
    )


def license_detect(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """License / provenance screen for corpus compliance — the filter
    that keeps GPL'd or CC-NC text out of a permissively-licensed
    training mix: the explicit ``SPDX-License-Identifier`` tag when
    present, else the first boilerplate match in a pinned precedence
    order (Apache-2.0, MIT, GPL, BSD, CC), plus a copyright-line
    gate and a signal count.

    Pure codegen'd regex, zero exchanges.
    """
    t = F.col(text_col)
    spdx = F.regexp_extract(
        t, r"SPDX-License-Identifier: ([A-Za-z0-9.+-]+)", 1
    )
    pats = [
        ("Apache-2.0", r"Licensed under the Apache License, Version 2\.0"),
        ("MIT", r"Permission is hereby granted, free of charge"),
        ("GPL", r"GNU General Public License"),
        ("BSD", r"Redistribution and use in source and binary forms"),
        ("CC", r"Creative Commons"),
    ]
    hits = [(name, t.rlike(pat)) for name, pat in pats]
    detected = F.lit(None).cast("string")
    for name, hit in reversed(hits):
        detected = F.when(hit, F.lit(name)).otherwise(detected)
    n_signals = sum(
        (hit.cast("int") for _, hit in hits),
        (spdx != "").cast("int"),
    )
    has_cr = t.rlike(r"Copyright (\(c\)|©)?\s*\d{4}")
    return df.select(
        F.col(id_col),
        F.when(spdx != "", spdx).alias("spdx_id"),
        F.coalesce(
            F.when(spdx != "", spdx), detected
        ).alias("license"),
        has_cr.alias("has_copyright"),
        n_signals.alias("n_signals"),
    )


def future_window_labels(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    horizon_days: int = 7,
    feature_days: int = 7,
) -> DataFrame:
    """Leakage-safe supervised-label builder — the step that turns an
    event log into training rows: one example per (user, ACTIVE day)
    with a backward feature (events in the trailing ``feature_days``
    window, inclusive of the observation day) and a forward label
    (any activity in the next ``horizon_days``, EXCLUSIVE of the
    observation day).  The feature/label cut at the day boundary is
    the whole point: features never see past the cutoff, labels never
    look behind it.

    Day grid is integer epoch days; the backward window is a RANGE
    frame over that integer (calendar-correct across gaps, unlike a
    row frame); the forward label is one lead over the distinct
    active-day series — no self-join.
    """
    epoch_day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")) / 86400000000
    ).cast("long")
    daily = df.select(
        F.col(user_col).alias("u"), epoch_day.alias("d")
    ).groupBy("u", "d").agg(F.count("*").alias("c"))
    w_feat = (
        Window.partitionBy("u")
        .orderBy("d")
        .rangeBetween(-(int(feature_days) - 1), 0)
    )
    w_next = Window.partitionBy("u").orderBy("d")
    return daily.select(
        F.col("u").alias(user_col),
        F.col("d").alias("epoch_day"),
        F.col("c").cast("long").alias("events_today"),
        F.sum("c").over(w_feat).cast("long").alias("feat_past_events"),
        F.coalesce(
            (F.lead("d", 1).over(w_next) - F.col("d"))
            <= int(horizon_days),
            F.lit(False),
        ).alias("label_active_next"),
    )


def hash_reservoir_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Exact-k uniform sample per group — the distributed reservoir.

    A sequential reservoir needs a scan-order state; at 10^12 rows the
    equivalent is PRIORITY SAMPLING: give every row the seed-free
    portable priority md5(id) and keep the k smallest per group.  The
    k-smallest selection is one keyed window (row_number over priority
    asc, id asc — the id tie-break makes duplicate-id inputs
    deterministic too), so the only movement is the group-key
    exchange; nothing is globally sorted and the choice is stable
    under re-partitioning, resume, and engine swap (DuckDB reproduces
    the exact sample — unlike rand()-based reservoirs).

    Complements ``stratified_sample`` (rate-based) and
    ``weighted_sample``: this one guarantees EXACTLY min(k, n) rows
    per group, the contract eval-set builders need.
    """
    pri = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(pri.asc(), F.col(id_col))
    return (
        df.withColumn("_pri", pri)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_pri")
    )
