"""Near-duplicate detection over a documents table.

Training-data dedup tiers, all pure Catalyst (no Python in the hot
path), each honest about its 100 TB behavior:

* :func:`exact_dup_groups` — hash-groupBy on md5(text): one shuffle of
  (16-byte hash, id), the canonical exact-dedup.
* :func:`shingles` / :func:`jaccard_pairs` — exact n-gram Jaccard.
  Implemented as group-pairs, NOT a self-join: explode shingles once,
  group by a 64-bit shingle hash, keep only shingles in >1 doc, and
  expand each posting list into ordered pairs with nested array
  ``transform``s.  Versus the naive ``e JOIN e ON shingle`` this scans
  and shuffles the exploded table once (ids, not strings) and skips
  the join build side entirely.  Still inherently quadratic in posting
  -list length — which is why the scale path below exists.
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash+LSH
  banding: constant-size signature per doc (one shuffle), candidate
  generation by band-bucket grouping (shuffle of (band, hash) pairs),
  then exact-Jaccard verification of candidates only.  At 100 TB the
  pair blow-up is bounded by bucket sizes, and the verify join touches
  only candidates.
* :func:`simhash64` — 64-bit SimHash of token sets (Hamming-distance
  near-dup key; pairs whose simhash match on all-but-k bits are
  candidates).

Spark-first design notes: posting-list expansion uses
``transform(sequence(...), ...)`` + ``flatten`` so pair generation is
whole-stage-codegen JVM code; no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via md5 hash-groupBy; keeps min id as canonical."""
    return df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash")).agg(
        F.min(id_col).alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, sh: array<string>)."""
    from ..skew import ensure_parallelism

    w = F.split(F.col(text_col), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(n)]
            ),
        )
    )
    # CPU-bound stage: make sure a small single-file scan doesn't
    # serialize it onto one task (no-op on a well-split 100 TB scan).
    return (
        ensure_parallelism(df.select(id_col, text_col))
        .filter(F.size(w) >= n)
        .select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
    )


def shingle_hashes(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct 64-bit n-gram shingle hashes per doc: (id, sh: array<long>).

    The hot-path twin of :func:`shingles`: instead of materializing the
    n-gram *strings* (``concat_ws`` allocates a new string per shingle
    position), each shingle is hashed in place with
    ``xxhash64(w[i], .., w[i+n-1])`` — multi-argument xxhash64 over the
    word slices is injective up to hash collisions (words cannot
    contain the split character), so ``array_distinct`` over the longs
    yields the same set cardinality as over the strings with collision
    probability ~|shingles|^2/2^65.  Downstream consumers
    (:func:`jaccard_pairs`, :func:`minhash_lsh_pairs`) only ever need
    equality/permutation-min over shingles, never the text, so the
    8-byte representation cuts both compute and shuffle width.

    Built in TWO projections on purpose: step 1 hashes each word once
    (``transform(split(text), xxhash64)``), step 2 combines ``n``
    consecutive word hashes per position.  Referencing the word array
    inside step 2's position lambda directly would re-evaluate
    ``split(text)`` once per array ELEMENT — higher-order-function
    lambdas sit outside codegen subexpression elimination, making the
    single-projection form O(len^2) per doc (measured 8x slower at
    sf0.1).  The two-step form stays linear because CollapseProject
    refuses to inline a non-cheap expression referenced more than
    once, so ``hw`` is materialized per row.
    """
    from ..skew import ensure_parallelism

    w = F.split(F.col(text_col), " ")
    base = (
        ensure_parallelism(df.select(id_col, text_col))
        .filter(F.size(w) >= n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.transform(w, lambda t: F.xxhash64(t)).alias("hw"),
        )
    )
    hw = F.col("hw")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(hw) - n),
            lambda i: F.xxhash64(*[F.element_at(hw, i + j + 1) for j in range(n)]),
        )
    )
    return base.select("doc_id", sh.alias("sh"))


def _ordered_pairs(ids: Column) -> Column:
    """All (a, b) with a<b from a sorted id array — JVM-side nested
    transform, no UDF."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids) - i),
                lambda x: F.struct(
                    F.element_at(ids, i).alias("doc_a"), x.alias("doc_b")
                ),
            ),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
    observation=None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs >= threshold.

    Group-pairs plan with ZERO joins: the per-doc shingle-set size is
    carried through the explode as part of the posting-list element, so
    each generated pair already knows (|A|, |B|) and jaccard is
    |A∩B| / (|A|+|B|-|A∩B|) straight off the pair count.  Two shuffles
    total (posting groupBy on an 8-byte shingle hash, then pair
    groupBy); no size-lookup join, no recomputation of the shingle
    stage for a broadcast build.

    ``max_df`` caps posting-list length (document frequency): a
    stop-phrase shingle shared by 10^8 docs would otherwise OOM its
    reducer and expand quadratically.  Dropping ubiquitous shingles is
    standard near-dup practice (they carry no discriminative signal);
    it makes the similarity estimate slightly conservative for pairs
    whose overlap includes a dropped shingle.  Pass a
    ``pyspark.sql.Observation`` as ``observation`` to record how many
    posting lists were dropped (``shingles_dropped`` /
    ``postings_total``) for the run's lineage metrics; pass
    ``max_df=None`` to disable the cap (exact oracle mode).
    """
    # shingles are hashed to 8-byte longs BEFORE exploding (in fact
    # before even materializing the n-gram strings — shingle_hashes
    # hashes the word slices in place): the Generate output and the
    # aggregation key are longs, never shingle strings — at 100 TB the
    # exploded/shuffled volume drops ~5x vs exploding the raw n-grams.
    s = shingle_hashes(df, n=n, text_col=text_col, id_col=id_col)
    # explode_OUTER, deliberately: plain explode triggers
    # InferFiltersFromGenerate, whose `size(sh) > 0 AND isnotnull(sh)`
    # filter is then pushed below the shingle projections with the
    # whole HOF chain inlined — evaluating the O(len) shingle build
    # twice per row, once in its quadratic fully-inlined form (measured
    # 10x slower at sf0.1).  The outer variant skips that inference;
    # it is semantically identical here because shingle_hashes filters
    # size(words) >= n, so `sh` is never empty and no null row can
    # appear.
    e = s.select(
        F.struct(F.col("doc_id").alias("id"), F.size("sh").alias("n")).alias("d"),
        F.explode_outer("sh").alias("h"),
    )
    posting = (
        e.groupBy("h")
        .agg(F.sort_array(F.collect_list("d")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_df is not None:
        if observation is not None:
            posting = posting.observe(
                observation,
                F.sum((F.size("ids") > max_df).cast("long")).alias(
                    "shingles_dropped"
                ),
                F.count(F.lit(1)).alias("postings_total"),
            )
        posting = posting.filter(F.size("ids") <= max_df)
    pair = (
        posting.select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .groupBy(
            F.col("p.doc_a.id").alias("doc_a"),
            F.col("p.doc_a.n").alias("na"),
            F.col("p.doc_b.id").alias("doc_b"),
            F.col("p.doc_b.n").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    j = pair.withColumn(
        "jac",
        F.col("common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("common")),
    ).filter(F.col("jac") >= threshold)
    return j.select("doc_a", "doc_b", F.round("jac", 4).alias("jaccard"))


# ---------------------------------------------------------------------
# MinHash + LSH banding (the 100 TB near-dup path)
# ---------------------------------------------------------------------

def _signature(n_perm: int) -> Column:
    """MinHash signature over the ``sh`` shingle-hash array as ONE
    nested higher-order expression::

        transform(sequence(0, n_perm-1),
                  p -> array_min(transform(sh, x -> xxhash64(p, x))))

    Permutation p is the OUTER lambda variable, so the whole signature
    is two lambda bodies regardless of ``n_perm``.  The unrolled
    formulation (``array(*[array_min(transform(sh, ...)) for i ...])``)
    computes the same longs but emits 64 separate lambda closures —
    Janino spent ~8s compiling that plan per session (pure fixed
    overhead, measured at sf0.001 where data time is nil); the nested
    form compiles in well under a second and runs the same per-row
    work.  Re-hashing the 8-byte shingle hash (fixed-width input) is
    also ~an order of magnitude cheaper than re-hashing the shingle
    string per permutation."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda p: F.array_min(F.transform("sh", lambda x: F.xxhash64(p, x))),
    )


def minhash_signatures(
    sh_df: DataFrame, n_perm: int = 32
) -> DataFrame:
    """(doc_id, sig: array<long>) — ZERO shuffles: the per-permutation
    min over a doc's shingles is an ``array_min(transform(...))`` pair
    per permutation, entirely inside one codegen stage over the
    already-materialized shingle-hash array (`shingle_hashes`).  (The
    explode + groupBy(doc_id) formulation computes the same hashes but
    pays a full shuffle of the exploded table — measured 3x slower at
    sf0.1 and strictly worse at 100 TB, where the exploded shuffle is
    ~30x input size.)
    """
    return sh_df.select("doc_id", _signature(n_perm).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    n_perm: int = 64,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MinHash banding, exact-verified.

    Bands of ``rows_per_band`` signature rows; docs colliding in any
    band become candidates; candidates are verified with EXACT Jaccard
    over their shingle-hash sets (equal to string-set Jaccard up to
    64-bit hash collisions, ~1e-8 at 10^5 shingles), so false positives
    are eliminated and the
    output is the exact pair set up to LSH recall (for r=2, b=32 the
    miss probability of a 0.5-Jaccard pair is (1-0.25)^32 ~ 1e-4,
    while low-background-similarity false candidates are suppressed
    ~20x versus r=1 — banding rows buy precision, bands buy recall).
    """
    s = shingle_hashes(df, n=n, text_col=text_col, id_col=id_col)
    n_bands = n_perm // rows_per_band
    # The signature is materialized as its own projection (it is
    # referenced ``rows_per_band`` times inside the band lambda, so
    # CollapseProject keeps it un-inlined), and the band keys are a
    # single nested-HOF transform over it:
    # ``b -> struct(b, xxhash64(sig[b*r+1], .., sig[b*r+r]))``.
    # Everything stays in two compact lambdas — see :func:`_signature`
    # for why unrolled per-band/per-permutation closures cost seconds
    # of Janino compile per session.  explode_OUTER for the same
    # reason as in :func:`jaccard_pairs`: skip the inferred
    # ``size(..) > 0`` filter, which would otherwise be pushed down
    # with the whole signature expression inlined and evaluated twice;
    # the band array is never empty (n_bands is a literal), so no null
    # row can appear.
    sigd = s.select("doc_id", _signature(n_perm).alias("sig"))
    r = rows_per_band
    band_expr = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                *[F.element_at(F.col("sig"), b * r + j + 1) for j in range(r)]
            ).alias("bh"),
        ),
    )
    bands = sigd.select(
        "doc_id", F.explode_outer(band_expr).alias("bb")
    ).select("doc_id", "bb.band", "bb.bh")
    cand = (
        bands.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # Candidates are a tiny fraction of the corpus (that's the point of
    # LSH) — cut their lineage so the verify joins below don't re-run
    # the signature+banding pipeline once per join side.
    cand = cand.localCheckpoint(eager=True)

    # exact verification over shingle sets, candidates only: semi-join
    # the shingle table down to candidate docs, then join the
    # per-candidate sets back to the pairs ON doc_id.  Deliberately NO
    # broadcast hints: candidate count x shingle-array size is
    # unbounded at 100 TB, so these must be plain shuffle joins on
    # doc_id — AQE downgrades them to broadcast at runtime only when
    # the localCheckpointed candidate stats show they actually fit.
    cand_docs = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    sets = s.join(cand_docs, "doc_id", "left_semi").localCheckpoint(eager=True)
    a = sets.withColumnsRenamed({"doc_id": "doc_a", "sh": "sha"})
    b = sets.withColumnsRenamed({"doc_id": "doc_b", "sh": "shb"})
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jac",
            F.size(F.array_intersect("sha", "shb")).cast("double")
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("jac") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jac", 4).alias("jaccard"))


def _simhash_from_hashes(hashes: Column, n_bits: int) -> Column:
    """SimHash bits from an array of integer token hashes.

    Bit i of the output is the sign of sum over tokens of
    (+1 if bit i of hash(token) else -1).  Computed per bit via
    array aggregates; the shiftright+sum expressions stay inside one
    codegen stage.
    """

    def vote_fn(i: int):
        # closure, NOT a default arg: PySpark HOFs bind a Column to
        # every lambda parameter including defaults.
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for i in range(n_bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(i))
        bit_cols.append(
            F.when(vote >= 0, F.lit(1).cast("long")).otherwise(F.lit(0)).alias(f"b{i}")
        )
    out = F.lit(0).cast("long")
    for i, b in enumerate(bit_cols):
        out = out + F.shiftleft(b, i)
    return out


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash over whitespace tokens, pure Catalyst
    (xxhash64 token hashes — the fast in-engine variant)."""
    toks = F.array_distinct(F.split(text_col, " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash_from_hashes(hashes, 64)


def simhash32_portable(text_col: Column) -> Column:
    """32-bit SimHash with an engine-portable token hash.

    Same sign-of-votes construction as :func:`simhash64` but the token
    hash is the first 8 md5 hex chars as a 32-bit integer —
    reproducible bit-for-bit in any engine with md5
    (``cast('0x' || substr(md5(tok),1,8) as bigint)``), so the whole
    fingerprint is oracle-checkable.  Use :func:`simhash64` in
    production (xxhash64 is one codegen intrinsic vs md5's digest);
    this variant exists to pin the algorithm against an independent
    implementation.
    """
    toks = F.array_distinct(F.split(text_col, " "))
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        ),
    )
    return _simhash_from_hashes(hashes, 32)


def simhash_dup_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Docs sharing an identical 64-bit SimHash (strongest band)."""
    h = df.select(F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sh64"))
    return (
        h.groupBy("sh64")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Banded exact-match candidate generation: the 64-bit SimHash splits
    into ``n_bands`` contiguous 16-bit bands; by pigeonhole, any pair
    within Hamming distance ``n_bands - 1`` collides exactly on at
    least one band, so grouping per band finds ALL such pairs without
    a self-join (recall 1 for ``max_hamming <= n_bands - 1``).
    Candidates are then verified with ``bit_count(a XOR b)`` — one
    codegen expression.  Shuffle volume: ``n_bands`` rows of
    (16-bit key, id, hash) per doc; pair expansion bounded by band
    bucket sizes, same group-pairs shape as :func:`jaccard_pairs`.

    Output: (doc_a, doc_b, hamming).
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banded candidates guarantee recall only for max_hamming <= "
            f"{n_bands - 1} (n_bands - 1); got {max_hamming}"
        )
    bits_per_band = 64 // n_bands
    h = df.select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sh64")
    )
    bands = h.select(
        "doc_id",
        "sh64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sh64", b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh64", "bb.band", "bb.key")
    cand = (
        bands.groupBy("band", "key")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("doc_id").alias("id"), F.col("sh64")))
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
        .select(F.explode(_ordered_pairs_structs(F.col("ids"))).alias("p"))
        .select(
            F.col("p.a.id").alias("doc_a"),
            F.col("p.a.sh64").alias("ha"),
            F.col("p.b.id").alias("doc_b"),
            F.col("p.b.sh64").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _ordered_pairs_structs(items: Column) -> Column:
    """All (a, b) element pairs with index a < index b from a sorted
    struct array — generalization of :func:`_ordered_pairs` to carry
    arbitrary struct payloads through the pair expansion."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(items) - 1),
            lambda i: F.transform(
                F.slice(items, i + 1, F.size(items) - i),
                lambda x: F.struct(
                    F.element_at(items, i).alias("a"), x.alias("b")
                ),
            ),
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Transitive closure of a near-dup pair set into clusters.

    The top of the dedup tier: ``jaccard_pairs`` / ``minhash_lsh_pairs``
    / ``simhash_hamming_pairs`` emit *pairs*; real dedup keeps ONE
    canonical doc per connected component of the pair graph (pairs
    (a,b),(b,c) must collapse a,b,c together, not drop b twice).

    Min-label propagation: every node starts labeled with its own id;
    each round every node takes the min label over itself and its
    neighbors; converged when no label changes.  Rounds = graph
    diameter, and near-dup components are small and dense (docs that
    are all mutual near-dups), so convergence is 2-4 rounds in
    practice; ``max_iter`` bounds pathological chains.  Each round is
    ONE shuffle (a groupBy on node id after an edge join), the same
    per-round cost as the alternating large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    that replaces this loop body if 100 TB graphs with long chains
    ever show up; for dedup workloads the simple loop wins on constant
    factors.  ``localCheckpoint(eager=True)`` truncates lineage each
    round so the plan does not grow exponentially, and the convergence
    test reuses the checkpointed result (no recompute).

    Returns (doc_id, cluster_id, is_canonical) for every doc that
    appears in at least one pair; ``cluster_id`` is the min doc id of
    the component, ``is_canonical`` marks the one row to keep.
    Singleton docs (no pairs) are implicitly canonical and not listed.
    """
    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("id"), F.least("src", "mn").alias("label")
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min over self-label and every neighbor's label, one shuffle
        msgs = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), "label")
        )
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def duplicate_ngram_spans(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level duplicate spans: which TOKEN RANGES of each doc
    also appear in other docs.

    Document-level dedup (exact/MinHash/SimHash above) drops whole
    docs; training corpora also carry *partial* duplication — license
    headers, boilerplate, quoted passages — that substring-level dedup
    removes (Lee et al., "Deduplicating Training Data Makes Language
    Models Better").  This is the distributed approximation of that
    paper's suffix-array pass: every word ``n``-gram occurring in >=
    ``min_docs`` distinct docs marks its ``[start, start+n)`` token
    range, and overlapping/adjacent marked ranges are merged per doc
    into maximal spans (gaps-and-islands), so a duplicated paragraph
    reports as ONE span.

    Returns ``(doc_id, span_start, span_end, n_grams)`` — token-index
    spans plus how many duplicated grams support each span.

    Scale (10^9 docs): grams are xxhash64'd to 8 bytes before the
    shuffle.  For the default ``min_docs=2`` the cross-doc test is
    ``min(doc_id) != max(doc_id)`` — both partials combine map-side,
    so a boilerplate gram present in 10^8 docs costs its reducer O(1)
    memory (a ``countDistinct`` here would funnel every (gram, doc)
    pair of the hot key through one reducer); larger thresholds fall
    back to countDistinct.  Three exchanges total: gram agg, the
    dup-gram semi join (same key — AQE reuses the partitioning), and
    the per-doc island window.  Hash collisions can only merge two
    distinct grams (false dup mark) at ~n_grams^2 / 2^64 odds.
    """
    from ..skew import ensure_parallelism
    from pyspark.sql.window import Window

    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.struct(
            i.alias("start"),
            F.xxhash64(
                F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)])
            ).alias("g"),
        ),
    )
    pos = (
        ensure_parallelism(df.select(id_col, text_col))
        .filter(F.size(w) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("p"))
        .select("doc_id", F.col("p.start").alias("start"), F.col("p.g").alias("g"))
    )
    if min_docs == 2:
        dup = (
            pos.groupBy("g")
            .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .select("g")
        )
    else:
        dup = (
            pos.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= min_docs)
            .select("g")
        )
    hits = pos.join(dup, "g", "left_semi")
    win = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max(F.col("start") + n).over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "new_island",
        (F.col("start") > F.coalesce(prev_end, F.lit(-1))).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + n).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def levenshtein_block_join(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 20,
    max_dist: int = 5,
) -> DataFrame:
    """Blocked string-similarity self-join: candidate pairs share a
    BLOCKING key (e.g. source/domain/first-token) and match when the
    Levenshtein distance of their text prefixes is within
    ``max_dist`` — the classic typo/near-title dedup primitive.

    Blocking is the scale story: the self-join is an equi-join on the
    block key, so pair volume is sum(block_size^2), never corpus^2 —
    the caller picks a block key with bounded group sizes (add a
    :func:`dimension_cardinality` audit when unsure).  The distance
    runs on a fixed-length prefix so the dynamic-programming cost per
    pair is O(prefix_len^2), constant.  Pure Catalyst
    (``levenshtein`` is a JVM builtin); ``a < b`` on the id kills the
    mirror/self pairs.
    """
    left = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_ta"),
    )
    right = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_tb"),
    )
    return (
        left.join(right, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("dist") <= max_dist)
        .select(F.col("_blk").alias(block_col), "id_a", "id_b", "dist")
    )


def dedup_rate_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source duplication dashboard (which ingest feeds are
    wasting tokens?): per source — docs, distinct contents (md5),
    duplicate rows and the dup rate.

    Distinct-content counting goes through a (source, hash) partial
    pass, NOT count_distinct over raw text (the hash is 16 bytes, the
    text is kilobytes — the shuffle shrinks ~100x and map-side
    combine still applies).
    """
    h = F.md5(F.col(text_col))
    per_hash = df.select(F.col(group_col), h.alias("_h")).groupBy(
        group_col, "_h"
    ).agg(F.count("*").alias("_n"))
    return per_hash.groupBy(group_col).agg(
        F.sum("_n").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        (F.sum("_n") - F.count("*")).alias("n_duplicates"),
        F.round(
            (F.sum("_n") - F.count("*")).cast("double") / F.sum("_n"), 6
        ).alias("dup_rate"),
    )


def dedup_keep_best(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup keeping the BEST duplicate (RefinedWeb keeps the
    longest / highest-quality copy, not the smallest id — canonical
    choice is a quality decision, not an arbitrary one): per content
    hash, the row with max score (ties to min id), plus how many
    copies it beat.

    One struct-min aggregate per hash — map-side partials collapse
    each partition's duplicates before the 16-byte-key shuffle; no
    window, no join.  The tie-break key is struct(-score, id): min
    over it is max-score-then-min-id, and the id field is compared
    with its native ordering, so string/uuid doc ids work as well as
    numeric ones (only the score must be numeric).
    """
    h = F.md5(F.col(text_col))
    best = F.min(
        F.struct(
            (-F.col(score_col).cast("double")).alias("negs"),
            F.col(id_col).alias("id"),
        )
    )
    g = df.select(
        h.alias("_h"), F.col(id_col), F.col(score_col)
    ).groupBy("_h").agg(
        best.alias("_b"), F.count("*").alias("n_copies")
    )
    return g.select(
        F.col("_b")["id"].alias(id_col),
        F.round(-F.col("_b")["negs"], 6).alias("kept_score"),
        "n_copies",
    )


def dup_cluster_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-cluster size distribution (the dedup report's lead
    chart: how much of the corpus sits in clusters of size 1, 2,
    3...?): per exact-content cluster size — number of clusters,
    docs covered, and the corpus share.

    Two tiny aggregates after the hash collapse: (hash -> size),
    (size -> clusters); the fact table shuffles its 16-byte hashes
    once, everything downstream is distinct-size cardinality.
    """
    h = F.md5(F.col(text_col))
    sizes = df.select(h.alias("_h")).groupBy("_h").agg(
        F.count("*").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters")
    )
    total = df.select(F.count("*").alias("_t"))
    return hist.crossJoin(F.broadcast(total)).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        F.round(
            (F.col("cluster_size") * F.col("n_clusters")).cast("double")
            / F.col("_t"),
            6,
        ).alias("corpus_share"),
    )


def fulltext_edit_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_prefix: int = 32,
    max_dist: int = 16,
    max_block: int = 64,
    observation=None,
) -> DataFrame:
    """Near-duplicate pairs by FULL-TEXT edit distance under prefix
    blocking — the complement of :func:`levenshtein_block_join` (which
    scores a fixed prefix and so reports suffix variants as distance
    0): here the prefix only BLOCKS, and the reported distance is the
    true Levenshtein over the whole text, so "same doc, different
    tail" pairs rank by how much actually changed.

    Scale story: the self-join is an equi-join on the 32-char prefix;
    blocks larger than ``max_block`` are dropped entirely (a hot
    boilerplate prefix would otherwise go quadratic) with the drop
    observable via ``observation`` — the same capped-posting
    discipline as ``jaccard_pairs``.  Per-pair cost is O(len_a *
    len_b) inside the JVM builtin; pair volume is
    sum(min(block, max_block)^2).
    """
    keyed = df.select(
        F.substring(F.col(text_col), 1, block_prefix).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    sizes = keyed.groupBy("_blk").agg(F.count("*").alias("_bn"))
    if observation is not None:
        sizes = sizes.observe(
            observation,
            F.sum((F.col("_bn") > max_block).cast("long")).alias(
                "blocks_dropped"
            ),
            F.count(F.lit(1)).alias("blocks_total"),
        )
    ok = sizes.filter(
        (F.col("_bn") > 1) & (F.col("_bn") <= max_block)
    ).select("_blk")
    cand = keyed.join(ok, "_blk")
    left = cand.select(
        "_blk", F.col("_id").alias("id_a"), F.col("_txt").alias("_ta")
    )
    right = cand.select(
        "_blk", F.col("_id").alias("id_b"), F.col("_txt").alias("_tb")
    )
    return (
        left.join(right, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
) -> DataFrame:
    """Directional n-gram containment C(A,B) = |A∩B| / |A| for pairs
    whose larger direction clears ``threshold`` — the near-dup measure
    Jaccard structurally misses: a short doc fully quoted inside a long
    one has tiny Jaccard (union is dominated by the long doc) but
    containment 1.0.  This is the screen for boilerplate wraps, quote
    inclusion, and subset-scrapes in a crawl corpus.

    Same zero-join group-pairs plan as ``jaccard_pairs`` (set sizes
    ride the posting elements, shingles are 8-byte hashes before the
    explode, ``max_df`` caps hot posting lists), so the scale story is
    identical: two shuffles, bounded reducers.
    """
    s = shingle_hashes(df, n=n, text_col=text_col, id_col=id_col)
    e = s.select(
        F.struct(
            F.col("doc_id").alias("id"), F.size("sh").alias("n")
        ).alias("d"),
        F.explode_outer("sh").alias("h"),
    )
    posting = (
        e.groupBy("h")
        .agg(F.sort_array(F.collect_list("d")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_df is not None:
        posting = posting.filter(F.size("ids") <= max_df)
    pair = (
        posting.select(
            F.explode(_ordered_pairs(F.col("ids"))).alias("p")
        )
        .groupBy(
            F.col("p.doc_a.id").alias("doc_a"),
            F.col("p.doc_a.n").alias("na"),
            F.col("p.doc_b.id").alias("doc_b"),
            F.col("p.doc_b.n").alias("nb"),
        )
        .agg(F.count("*").cast("long").alias("common"))
    )
    c = F.col("common").cast("double")
    cont_a = c / F.col("na").cast("double")
    cont_b = c / F.col("nb").cast("double")
    return pair.filter(
        F.greatest(cont_a, cont_b) >= F.lit(threshold)
    ).select(
        "doc_a",
        "doc_b",
        "common",
        F.round(cont_a, 4).alias("cont_a"),
        F.round(cont_b, 4).alias("cont_b"),
        F.round(F.greatest(cont_a, cont_b), 4).alias("max_containment"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram novelty in ingestion order: the share of a doc's
    shingles whose FIRST corpus occurrence is this doc — the streaming
    view of duplication (a scrape re-crawling yesterday's pages scores
    ~0; genuinely new text scores ~1), and the curve curation teams
    watch to decide when a source is mined out.

    Each shingle contributes its min doc_id in ONE posting aggregate;
    per-doc novel counts are then just a count over that bounded-key
    table — no doc-pair joins, no quadratic anything.  Two fact
    shuffles total (posting min + novel count) plus a keyed join-back
    to the per-doc shingle totals.
    """
    s = shingle_hashes(df, n=n, text_col=text_col, id_col=id_col)
    tot = s.select("doc_id", F.size("sh").alias("n_shingles"))
    firsts = (
        s.select("doc_id", F.explode_outer("sh").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    novel = firsts.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count("*").cast("long").alias("n_novel"))
    return tot.join(novel, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce("n_novel", F.lit(0)).cast("double")
            / F.col("n_shingles").cast("double"),
            4,
        ).alias("novelty_rate"),
    )


def incremental_dedup(
    df: DataFrame,
    cutoff_expr,
    threshold: float = 0.5,
    n: int = 3,
    n_perm: int = 64,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 200,
) -> DataFrame:
    """Incremental (new-batch-vs-corpus) near-dedup: for each doc
    ABOVE the cutoff id, its best near-dup BELOW the cutoff — the
    daily-ingest gate that asks "is today's crawl already in the
    corpus" without ever re-pairing the corpus against itself.

    MinHash band buckets are split into (old, new) sides IN the bucket
    aggregate, so candidates are strictly cross-side: the corpus never
    self-pairs, which at 100 TB is the difference between O(batch x
    collision rate) and re-running full dedup.  Hot buckets are capped
    (``max_bucket`` per side).  Candidates verify with exact Jaccard
    over shingle-hash sets (same guarantees as ``minhash_lsh_pairs``);
    keep-best is min over (-jaccard, old_id) — type-agnostic
    tie-break, no numeric-id assumption.
    """
    cut = F.lit(cutoff_expr) if not hasattr(cutoff_expr, "_jc") else cutoff_expr
    s = shingle_hashes(df, n=n, text_col=text_col, id_col=id_col)
    sigd = s.select("doc_id", _signature(n_perm).alias("sig"))
    n_bands = n_perm // rows_per_band
    r = rows_per_band
    band_expr = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                *[
                    F.element_at(F.col("sig"), b * r + j + 1)
                    for j in range(r)
                ]
            ).alias("bh"),
        ),
    )
    bands = sigd.select(
        "doc_id",
        (F.col("doc_id") > cut).alias("is_new"),
        F.explode_outer(band_expr).alias("bb"),
    ).select("doc_id", "is_new", "bb.band", "bb.bh")
    bucket = (
        bands.groupBy("band", "bh")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_set(
                        F.when(~F.col("is_new"), F.col("doc_id"))
                    )
                ),
                1,
                max_bucket,
            ).alias("olds"),
            F.slice(
                F.sort_array(
                    F.collect_set(
                        F.when(F.col("is_new"), F.col("doc_id"))
                    )
                ),
                1,
                max_bucket,
            ).alias("news"),
        )
        .filter((F.size("olds") > 0) & (F.size("news") > 0))
    )
    cand = (
        bucket.select(
            F.explode("news").alias("doc_new"), "olds"
        )
        .select("doc_new", F.explode("olds").alias("doc_old"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_docs = cand.select(
        F.explode(F.array("doc_new", "doc_old")).alias("doc_id")
    ).distinct()
    sets = s.join(cand_docs, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    a = sets.withColumnsRenamed({"doc_id": "doc_new", "sh": "sha"})
    b = sets.withColumnsRenamed({"doc_id": "doc_old", "sh": "shb"})
    verified = (
        cand.join(a, "doc_new")
        .join(b, "doc_old")
        .withColumn(
            "jac",
            F.size(F.array_intersect("sha", "shb")).cast("double")
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("jac") >= threshold)
    )
    best = (
        verified.groupBy("doc_new")
        .agg(
            F.min(
                F.struct(
                    (-F.col("jac")).alias("njac"),
                    F.col("doc_old").alias("id"),
                    F.col("jac").alias("jac"),
                )
            ).alias("_b")
        )
    )
    return best.select(
        "doc_new",
        F.col("_b.id").alias("dup_of"),
        F.round("_b.jac", 4).alias("jaccard"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    max_df: int = 50,
    min_shared: int = 3,
) -> DataFrame:
    """Winnowing fingerprint near-dup pairs (Schleimer et al. / MOSS).

    The guarantee the rolling-hash ``doc_fingerprint`` lacks: from
    every window of ``w`` consecutive k-gram hashes at least one is
    SELECTED, so any shared substring of length >= k+w−1 yields a
    shared fingerprint — local plagiarism/copy detection, not just
    whole-doc similarity.  Normalization (lowercase, alnum-only), the
    per-position portable md5 k-gram hashes, and the window-min
    selection all run IN-ROW (O(len·w) JVM array math, no explode
    until the selected set).

    Then the usual banded-join discipline: fingerprints hitting more
    than ``max_df`` docs are dropped as boilerplate BEFORE the
    self-join (the jaccard_pairs posting-cap rule), and pairs need
    ``min_shared`` shared prints.  Returns (id_a, id_b,
    shared_fingerprints).
    """
    s = F.lower(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", "")
    )
    base = df.select(F.col(id_col).alias("_id"), s.alias("_s")).filter(
        F.length("_s") >= k + w - 1
    )
    # materialize the k-gram hash array ONCE per row — inlining it in
    # the window transform would recompute every md5 per window
    # (O(len^2) hashing).
    hashes = (
        f"transform(sequence(1, length(_s) - {k} + 1), i ->"
        f" cast(conv(substr(md5(substr(_s, i, {k})), 1, 8), 16, 10)"
        f" as bigint))"
    )
    hashed = base.withColumn("_hs", F.expr(hashes))
    fps = (
        f"array_distinct(transform(sequence(1, size(_hs) - {w} + 1),"
        f" t -> array_min(slice(_hs, t, {w}))))"
    )
    sel = hashed.select(
        "_id", F.explode(F.expr(fps)).alias("fp")
    )
    caps = sel.groupBy("fp").agg(
        F.count_distinct("_id").alias("_df")
    ).filter(F.col("_df") <= max_df)
    kept = sel.join(caps.select("fp"), "fp")
    a = kept.select(F.col("_id").alias("id_a"), "fp")
    b = kept.select(F.col("_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def cdc_chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    mask: int = 63,
) -> DataFrame:
    """Content-defined chunking dedup (rolling-boundary, rsync/borg
    shape) — shift-resistant duplicate detection.

    Fixed-size chunking (see ``chunk_overlap``) breaks on a 1-char
    insertion: every later chunk changes.  Content-defined boundaries
    cut where a k-gram hash satisfies ``hash % (mask+1) == 0``, so
    boundaries move WITH the content and an edited document still
    shares every untouched chunk.  Boundary detection, chunk
    assembly, and chunk hashing all run IN-ROW (one filtered
    positions array, one transform over the cut list — O(len) md5s,
    materialized once); only the (doc, chunk-hash) pairs explode.

    Output per doc: chunk count, chunks also present in another doc,
    and the duplicated-content ratio — the per-doc dedup scorecard.
    """
    s = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    base = df.select(F.col(id_col).alias("_id"), s.alias("_s")).filter(
        F.length("_s") >= k
    )
    cuts = (
        f"filter(sequence({k}, length(_s)), i ->"
        f" cast(conv(substr(md5(substr(_s, i - {k} + 1, {k})), 1, 8),"
        f" 16, 10) as bigint) % {mask + 1} = 0)"
    )
    base = base.withColumn(
        "_cuts",
        F.expr(
            f"concat(array(0), {cuts},"
            " array(length(_s)))"
        ),
    )
    chunks = (
        "array_distinct(filter(transform(sequence(1, size(_cuts) - 1),"
        " j -> md5(substr(_s, try_element_at(_cuts, j) + 1,"
        " try_element_at(_cuts, j + 1) - try_element_at(_cuts, j)))),"
        " c -> c is not null))"
    )
    pairs = base.select(
        "_id", F.explode(F.expr(chunks)).alias("chash")
    )
    spread = pairs.groupBy("chash").agg(
        F.count_distinct("_id").alias("_docs")
    )
    j = pairs.join(spread, "chash")
    return j.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("_docs") > 1).cast("long")).alias("n_dup_chunks"),
        F.round(
            F.sum((F.col("_docs") > 1).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_ratio"),
    )


def jaro_winkler_pairs(
    df: DataFrame,
    left_col: str,
    right_col: str,
    threshold: float = 0.85,
) -> DataFrame:
    """Jaro-Winkler similarity between two string columns — the
    fuzzy-identity matcher (usernames, hostnames, service names) the
    Fellegi-Sunter linkage weights upstream expect as a comparator.

    Spark has levenshtein built in but no Jaro-Winkler, so this is a
    VECTORIZED Arrow-batched pandas UDF (never per-row Python)
    implementing the canonical Winkler 1990 form: match window
    floor(max/2)-1, transpositions = half the out-of-order matches,
    prefix boost l*0.1*(1-jaro) with l <= 4 applied only when
    jaro > 0.7 — parameter-for-parameter the same spec DuckDB's
    jaro_winkler_similarity implements, which is exactly what makes
    the oracle a genuine cross-implementation check.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if l1 == 0 or l2 == 0:
            return 0.0
        window = max(l1, l2) // 2 - 1
        if window < 0:
            window = 0
        m1 = [False] * l1
        m2 = [False] * l2
        matches = 0
        for i, ch in enumerate(s1):
            lo = max(0, i - window)
            hi = min(l2, i + window + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == ch:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        jaro = (
            matches / l1 + matches / l2 + (matches - t / 2) / matches
        ) / 3.0
        if jaro > 0.7:
            l = 0
            for a, b in zip(s1[:4], s2[:4]):
                if a != b:
                    break
                l += 1
            return jaro + l * 0.1 * (1 - jaro)
        return jaro

    def _batch(a, b):
        return pd.Series(
            [
                _jw(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    _batch.__annotations__ = {
        "a": pd.Series, "b": pd.Series, "return": pd.Series
    }
    jw_udf = pandas_udf(_batch, "double")

    sim = jw_udf(F.col(left_col), F.col(right_col))
    return df.select(
        "*",
        F.round(sim, 6).alias("jw_similarity"),
        (sim >= threshold).alias("jw_match"),
    )
