"""Hierarchy / tree traversal operators.

Transcript corpora are not always linear: shared-conversation exports
(regenerated answers, branched edits) are TREES of turns with a
parent pointer, and training-data prep linearizes each root-to-node
path into a flat context.  Spark has no recursive CTE, so the
traversal is built as POINTER DOUBLING (path halving): each round
every node learns its ancestor's ancestor and splices the two path
fragments, so a depth-D tree converges in ceil(log2(D)) rounds of ONE
self-join shuffle each — not D rounds as naive parent-chasing would.
The DuckDB oracle for the registry entry is a plain recursive CTE:
different algorithm, same rows.

``localCheckpoint(eager=True)`` truncates lineage each round (same
policy as ``dedup.dedup_clusters``) so the plan does not double in
size per round, and the driver-side convergence probe reuses the
checkpointed result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ancestor_paths(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_rounds: int = 40,
) -> DataFrame:
    """Root-to-node path for every node of a parent-pointer forest.

    Input: one row per node with ``id_col`` and ``parent_col``
    (NULL parent = root).  Output: ``(id, depth, path)`` where
    ``path`` is the array of node ids from the root down to the node
    inclusive and ``depth`` is ``size(path) - 1``.

    Pointer doubling: state is (id, anc, path) with ``path`` covering
    the nodes strictly below ``anc`` down to ``id``.  One round joins
    the state to itself on ``anc = other.id``; a node inherits its
    ancestor's ancestor and prepends the ancestor's fragment, doubling
    the resolved prefix.  ``max_rounds`` = 40 supports depth 2^40 —
    effectively unbounded — but the loop exits as soon as every
    ``anc`` is NULL (a 1-row ``limit(1).count()`` probe per round
    against the checkpointed frame, so nothing recomputes).

    Scale: each round shuffles (id-sized key, path array) once; the
    arrays are O(depth) not O(tree size), so a 10^9-node forest of
    bounded depth is rounds x one hash join, all JVM-side.
    """
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("anc"),
        F.array(F.col(id_col)).alias("path"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if state.filter(F.col("anc").isNotNull()).limit(1).count() == 0:
            break
        hop = state.select(
            F.col("id").alias("h_id"),
            F.col("anc").alias("h_anc"),
            F.col("path").alias("h_path"),
        )
        # A DANGLING parent (anc set but no such node row: h_id NULL
        # after the left join) terminates the walk with the path kept
        # as-is — the node becomes the root of its fragment, instead
        # of silently nulling path/depth.
        resolved = F.col("anc").isNull() | F.col("h_id").isNull()
        state = (
            state.join(hop, state["anc"] == hop["h_id"], "left")
            .select(
                "id",
                F.when(resolved, F.lit(None))
                .otherwise(F.col("h_anc"))
                .alias("anc"),
                F.when(resolved, F.col("path"))
                .otherwise(F.concat(F.col("h_path"), F.col("path")))
                .alias("path"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "id", (F.size("path") - 1).alias("depth"), "path"
    )


def subtree_rollup(
    df: DataFrame,
    paths: DataFrame,
    id_col: str = "id",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate a per-node metric over every node's SUBTREE (node +
    all descendants) — the cost-rollup / thread-size query over a
    conversation forest.

    Uses :func:`ancestor_paths` output: exploding each node's
    root-to-node path emits one (ancestor, node) row per ancestor, so
    a single explode + ONE keyed aggregate computes every subtree sum
    simultaneously — no per-node traversal, no recursion at query
    time.  Explode volume is sum(depth) rows: linear for bounded-depth
    forests (the transcript case), the same row count a recursive CTE
    would touch.
    """
    contrib = paths.join(df, paths["id"] == df[id_col]).select(
        F.explode(paths["path"]).alias("subtree_root"),
        df[value_col].alias("_v"),
    )
    return contrib.groupBy("subtree_root").agg(
        F.count("*").alias("subtree_size"),
        F.sum("_v").alias("subtree_sum"),
    )


def critical_path(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    value_col: str = "value",
) -> DataFrame:
    """Critical path per tree root: the root-to-leaf chain with the
    largest total cost — the span chain that determines a trace's
    end-to-end latency (the trace-waterfall question the sapm/otlp
    trace sinks feed; computed here over the same parent-pointer
    forests as :func:`ancestor_paths`).

    Pipeline: pointer-doubled root-to-node paths (log-depth rounds),
    then ONE explode + join + keyed aggregate prices every path, a
    ``left_anti`` against the parent set keeps leaves only, and a
    per-root window picks the argmax with a DETERMINISTIC tie-break
    (cost desc, then leaf id asc) so the result is engine-portable.
    Costs sum in decimal so fold order cannot move the total.

    Scale: explode volume is sum(depth) rows (same as any reachability
    expansion); the final window partitions by root — one row per
    root survives, and per-root fan-in is that tree's leaf count,
    bounded for transcript forests.
    """
    paths = ancestor_paths(df, id_col, parent_col)
    vals = df.select(
        F.col(id_col).alias("_vid"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    )
    contrib = paths.select(
        "id",
        F.element_at("path", 1).alias("root"),
        "depth",
        F.explode("path").alias("_vid"),
    )
    costs = contrib.join(vals, "_vid").groupBy("id", "root", "depth").agg(
        F.sum("_v").alias("_cost")
    )
    parent_ids = (
        df.select(F.col(parent_col).alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
    )
    leaves = costs.join(parent_ids, "id", "left_anti")
    w = Window.partitionBy("root").orderBy(
        F.col("_cost").desc(), F.col("id").asc()
    )
    return (
        leaves.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "root",
            F.col("id").alias("leaf_id"),
            "depth",
            F.col("_cost").cast("double").alias("path_cost"),
        )
    )


def service_graph_edges(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    label_col: str,
    value_col: str,
) -> DataFrame:
    """Service-graph edge aggregation (the OTel servicegraph-connector
    shape; this distribution ships only spanmetrics, but the backend
    renders the same caller->callee map from span parent links):
    every child span joins its parent ONCE and the (parent label,
    child label) pair aggregates call count and latency stats.

    ONE self-join shuffle on the parent pointer + ONE grouped pass
    whose output is |labels|^2-bounded regardless of corpus size.
    Roots (NULL parent) contribute no edge.  Value totals are
    decimal-summed then cast so fold order can't move the hash.
    """
    child = df.select(
        F.col(parent_col).alias("_pid"),
        F.col(label_col).alias("callee"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    ).filter(F.col("_pid").isNotNull())
    parent = df.select(
        F.col(id_col).alias("_pid"), F.col(label_col).alias("caller")
    )
    return (
        child.join(parent, "_pid")
        .groupBy("caller", "callee")
        .agg(
            F.count("*").alias("n_calls"),
            F.sum("_v").cast("double").alias("total_value"),
            F.max("_v").cast("double").alias("max_value"),
        )
    )


def pagerank_step(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    rank_col: str | None = None,
) -> DataFrame:
    """One distributed PageRank iteration (link-graph authority for
    corpus ranking — the web-scale companion of the k-means Lloyd
    step: iterative algorithm, one step as a pure dataflow; the
    caller loops, feeding each output back as ``rank_col``).

    r1(v) = (1-d)/N + d * (Σ_{u->v} r0(u)/outdeg(u) + dangling/N)

    where ``dangling`` is the rank mass of nodes with no out-edges
    (redistributed uniformly — the standard correction, without which
    rank leaks every round).

    Scale: two shuffles keyed by node id (out-degree count, then the
    contribution aggregate) — both hash-agg with map-side partials;
    the dangling mass is a 1-row aggregate cross-joined back
    (broadcast).  No collect, no windows; state per round is exactly
    one (node, rank) table.
    """
    r = (
        F.col(rank_col)
        if rank_col
        else F.lit(1.0) / F.lit(float(n_nodes))
    )
    ranked = nodes.select(F.col(node_col), r.alias("_r"))
    deg = edges.groupBy(src_col).agg(F.count("*").alias("_deg"))
    contrib = (
        edges.join(deg, src_col)
        .join(
            ranked.withColumnRenamed(node_col, src_col).withColumnRenamed(
                "_r", "_rs"
            ),
            src_col,
        )
        .groupBy(F.col(dst_col).alias(node_col))
        .agg(F.sum(F.col("_rs") / F.col("_deg")).alias("_in"))
    )
    dangling = (
        ranked.join(
            deg.withColumnRenamed(src_col, node_col), node_col, "left_anti"
        )
        .agg(F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dm"))
    )
    return (
        ranked.join(contrib, node_col, "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            node_col,
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * (
                    F.coalesce(F.col("_in"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n_nodes))
                )
            ).alias("rank"),
        )
    )


def span_clock_skew(
    df: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Span clock-skew audit over the per-group heap forest (the
    trace-quality lint: a child span that STARTS BEFORE its parent
    means skewed clocks or broken context propagation — spanmetrics
    and critical-path math silently degrade on such traces): per
    group, span count, violation count, and the worst skew in
    seconds.

    Same parent rule as ``tree_linearize``: node seq (1-based in
    ``order_col`` order) has parent seq//2.  One keyed window + one
    self-join on (group, parent_seq) + one grouped aggregate — all on
    the group key.
    """
    from pyspark.sql.window import Window

    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    w = Window.partitionBy(group_col).orderBy(order_col)
    seq = df.select(
        F.col(group_col).alias("_g"),
        F.row_number().over(w).alias("_seq"),
        epoch.alias("_e"),
    )
    child = seq.filter(F.col("_seq") > 1).select(
        "_g",
        F.col("_seq").alias("_cseq"),
        F.floor(F.col("_seq") / 2).cast("long").alias("_pseq"),
        F.col("_e").alias("_ce"),
    )
    parent = seq.select(
        "_g", F.col("_seq").alias("_pseq"), F.col("_e").alias("_pe")
    )
    joined = child.join(parent, ["_g", "_pseq"])
    skew = F.col("_pe") - F.col("_ce")
    return joined.groupBy(F.col("_g").alias(group_col)).agg(
        (F.count("*") + 1).alias("n_spans"),
        F.sum((skew > 0).cast("long")).alias("n_violations"),
        F.round(
            F.greatest(F.max(skew), F.lit(0.0)), 3
        ).alias("max_skew_s"),
    )


def span_self_time(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-span self-time over the heap forest (the flame-graph
    number: a span's own cost = its duration minus its direct
    children's — inclusive times always blame the root): same parent
    rule as ``tree_linearize`` (seq//2 on the ``order_col``-ordered
    sequence).

    One keyed window for seq, one (group, parent) aggregate of child
    costs, one keyed left join back — self-time clamps at 0 (clock
    skew can make children sum past the parent; negative self-time is
    noise, not physics).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    seq = df.select(
        F.col(group_col).alias("_g"),
        F.row_number().over(w).alias("_seq"),
        F.col(value_col).cast("decimal(28,6)").alias("_v"),
    )
    child_sums = (
        seq.filter(F.col("_seq") > 1)
        .groupBy(
            F.col("_g").alias("_cg"),
            F.floor(F.col("_seq") / 2).cast("long").alias("_pseq"),
        )
        .agg(F.sum("_v").alias("_cs"))
    )
    joined = seq.join(
        child_sums,
        (seq["_g"] == child_sums["_cg"])
        & (seq["_seq"] == child_sums["_pseq"]),
        "left",
    ).select(
        seq["_g"].alias(group_col),
        F.col("_seq").alias("seq"),
        F.col("_v").alias("inclusive"),
        F.coalesce(F.col("_cs"), F.lit(0).cast("decimal(28,6)")).alias(
            "_children"
        ),
    )
    self_t = F.greatest(
        (F.col("inclusive") - F.col("_children")).cast("double"),
        F.lit(0.0),
    )
    return joined.select(
        group_col,
        "seq",
        F.round(F.col("inclusive").cast("double"), 4).alias("inclusive"),
        F.round(F.col("_children").cast("double"), 4).alias(
            "children_sum"
        ),
        F.round(self_t, 4).alias("self_time"),
    )


def degree_distribution(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree distribution of a directed graph (the first chart of
    any graph analysis — is this a hub-and-spoke or a mesh?): per
    (direction, degree) — how many nodes have that in/out degree,
    and their share of nodes appearing in that direction.

    Per-node degrees collapse the edge list first; the histogram
    then runs over distinct degree values.  Out- and in-direction
    rows stack in one frame.
    """
    def hist(col: str, direction: str) -> DataFrame:
        deg = edges.groupBy(F.col(col).alias("node")).agg(
            F.count("*").alias("degree")
        )
        h = deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
        t = deg.agg(F.count("*").alias("_t"))
        return h.crossJoin(F.broadcast(t)).select(
            F.lit(direction).alias("direction"),
            "degree",
            "n_nodes",
            F.round(
                F.col("n_nodes").cast("double") / F.col("_t"), 6
            ).alias("node_share"),
        )
    return hist(src_col, "out").unionByName(hist(dst_col, "in"))


def triangle_census(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Global triangle census of an undirected simple graph given as
    low<high edge pairs (the near-dup pair graphs that
    ``jaccard_pairs`` / ``minhash_lsh_pairs`` emit): node/edge counts,
    triangle count, wedge (open-path) count, and the global clustering
    coefficient 3T / wedges — the density check that separates TRUE
    dup clusters (mutual near-dups, coefficient near 1) from LSH
    false-positive chains (coefficient near 0).

    Triangles are counted by the ordered node-iterator join: edges are
    oriented low->high, paths a<b<c come from one self-join on the
    middle node, and each path is closed by one more join against the
    edge set — every triangle is produced exactly once, no
    symmetrization blowup.  Wedges need only the degree table
    (sum of deg*(deg-1)/2), one keyed aggregate.  At 10^12-edge scale
    the textbook refinement is to orient edges by DEGREE instead of id
    (bounds the join fan-out by sqrt(|E|), Suri & Vassilvitskii's
    MapReduce triangle counting); id orientation is kept here because
    dup-pair graphs have bounded component sizes by construction.
    """
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).distinct()
    paths = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.b") == F.col("y.a"))
        .select(
            F.col("x.a").alias("a"),
            F.col("x.b").alias("m"),
            F.col("y.b").alias("c"),
        )
    )
    tri = paths.alias("p").join(
        e.alias("z"),
        (F.col("p.a") == F.col("z.a")) & (F.col("p.c") == F.col("z.b")),
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("_d") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("_d") * (F.col("_d") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    t = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return counts.crossJoin(t).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_edges",
        "n_wedges",
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(0.0),
            6,
        ).alias("global_clustering"),
    )


def kcore_peel_step(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One k-core peel iteration (Matula-Beck; the dup-graph /
    link-graph densest-region extractor): on the CURRENT undirected
    edge set, compute each node's degree and mark nodes below ``k``
    for removal — the caller loops, feeding the surviving edge set
    back, until no node is removed (the iterative-algorithm pattern of
    ``pagerank_step``/``kmeans_lloyd_step``: one step as pure
    dataflow).

    Self-loops and duplicate/reversed edges collapse first so degree
    is simple-graph degree.  One endpoint explode + one node-keyed
    aggregate per step; the report is |nodes|-bounded.  ``kept`` nodes
    with their degrees are exactly what the next round's edge
    semi-join consumes.
    """
    a = F.least(F.col(src_col), F.col(dst_col)).alias("a")
    b = F.greatest(F.col(src_col), F.col(dst_col)).alias("b")
    simple = (
        edges.select(a, b)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    inc = simple.select(
        F.explode(F.array("a", "b")).alias("node")
    )
    deg = inc.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        (F.col("degree") >= k).alias("kept"),
    )


def local_clustering_coeff(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Per-node local clustering coefficient ``2·T_v / (d_v(d_v−1))``
    over an undirected simple graph given as low<high edge pairs — the
    node-level refinement of `triangle_census`'s global coefficient
    (census says "are dup clusters dense overall"; this names the
    nodes sitting in dense pockets vs chain artifacts).

    Triangles come from the same ordered node-iterator join as the
    census (each a<b<c closed exactly once); each closed triangle then
    credits all THREE corners via one bounded explode, and one keyed
    count per corner gives T_v.  Degrees are one keyed aggregate over
    both endpoints.  Same 10^12-edge note as the census: orient by
    degree (Suri & Vassilvitskii) when component sizes are unbounded;
    id orientation is kept for the bounded dup-pair graphs this runs
    on.
    """
    e = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).distinct()
    paths = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.b") == F.col("y.a"))
        .select(
            F.col("x.a").alias("a"),
            F.col("x.b").alias("m"),
            F.col("y.b").alias("c"),
        )
    )
    tri = paths.alias("p").join(
        e.alias("z"),
        (F.col("p.a") == F.col("z.a")) & (F.col("p.c") == F.col("z.b")),
    ).select("p.a", "p.m", "p.c")
    tri_v = tri.select(
        F.explode(F.array("a", "m", "c")).alias("v")
    ).groupBy("v").agg(F.count("*").alias("_t"))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    d = F.col("_d").cast("double")
    t = F.coalesce(F.col("_t"), F.lit(0)).cast("double")
    return (
        deg.join(tri_v, "v", "left")
        .select(
            "v",
            F.col("_d").cast("long").alias("degree"),
            F.coalesce(F.col("_t"), F.lit(0)).cast("long").alias("triangles"),
            F.when(F.col("_d") >= 2, F.round(2.0 * t / (d * (d - 1.0)), 6))
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star.

    The scale-path companion to ``dedup.dedup_clusters``'s min-label
    loop: large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond") converges in O(log^2 n) rounds on ANY
    graph shape — long chains included — where plain min-label
    propagation needs diameter rounds.  Each round is one groupBy
    shuffle over the current edge set, and the edge set only shrinks
    (toward the star forest), so the per-round cost falls as the
    algorithm converges; at 10^12-edge scale this is the difference
    between 20 bounded rounds and an unbounded diameter walk.

    large-star: for every node v, connect every strictly-larger
    neighbor of v to the minimum of v's neighborhood (v included).
    small-star: connect every neighbor <= v (and v) to the minimum.
    Fixpoint: every edge (u, parent) with parent = component min.

    Reference analog: groupbytraceprocessor assembles a span forest per
    trace (pkg/translator grouping semantics); this generalizes that
    forest-build to arbitrary undirected graphs.

    Returns (node, component) for every node that appears in an edge;
    ``component`` is the minimum node id of its component.  Lineage is
    truncated per round with ``localCheckpoint`` so the plan stays flat.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # undirected: orient every edge child=max, parent=min
    e = (
        e.select(
            F.greatest("u", "v").alias("child"),
            F.least("u", "v").alias("parent"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star_round(ed: DataFrame, large: bool) -> DataFrame:
        # neighborhood of each center node (both orientations).  The
        # per-center minimum is a groupBy MIN (partial-agg, bounded
        # memory) joined back on the SAME key — co-partitioned, so no
        # second shuffle of the big side and no collect_set blowup on
        # hot nodes (a celebrity node with 10^8 neighbors costs one
        # counter, not one in-memory array).
        nbrs = ed.select(
            F.col("child").alias("ctr"), F.col("parent").alias("nb")
        ).unionAll(
            ed.select(F.col("parent").alias("ctr"), F.col("child").alias("nb"))
        )
        mins = nbrs.groupBy("ctr").agg(F.min("nb").alias("_mn_nb"))
        m = F.least(F.col("ctr"), F.col("_mn_nb"))
        joined = nbrs.join(mins, "ctr")
        if large:
            # attach strictly-larger neighbors to the min
            out = joined.filter(F.col("nb") > F.col("ctr")).select(
                F.col("nb").alias("child"), m.alias("parent")
            )
        else:
            # attach <=-neighbors and the center itself to the min
            out = joined.filter(F.col("nb") <= F.col("ctr")).select(
                F.col("nb").alias("child"), m.alias("parent")
            ).unionAll(
                mins.select(F.col("ctr").alias("child"), m.alias("parent"))
            )
        out = out.filter(F.col("child") != F.col("parent"))
        return out.select(
            F.greatest("child", "parent").alias("child"),
            F.least("child", "parent").alias("parent"),
        ).distinct()

    for _ in range(max_iter):
        after = star_round(star_round(e, large=True), large=False)
        after = after.localCheckpoint(eager=True)
        # converged when the edge multiset is already a star forest:
        # every child has exactly one parent and no parent is a child
        delta = (
            after.exceptAll(e).limit(1).count()
            + e.exceptAll(after).limit(1).count()
        )
        e = after
        if delta == 0:
            break
    comp = e.select(
        F.col("child").alias("node"), F.col("parent").alias("component")
    )
    roots = e.select(F.col("parent").alias("node")).distinct().join(
        e.select(F.col("child").alias("node")).distinct(), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return comp.unionByName(roots)


def missing_parent_audit(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_id",
) -> DataFrame:
    """Trace completeness: roots, orphans, resolvable spans per trace.

    Reference analog: groupbytrace / sapm assembly assumes every
    non-root span's parent arrives in the same trace; dropped or
    late-sampled parents leave ORPHANS that break waterfall rendering
    and self-time math (``span_self_time``).  This audits the span
    forest: root = NULL parent; orphan = parent id absent from the
    trace's own span set.

    Shape: one left join of spans to the (trace, span) key set —
    equi-join on the trace+parent key, co-partitioned with the
    grouping that follows; no windows.

    Returns per trace: n_spans, n_roots, n_orphans, orphan_frac
    (round 6).
    """
    s = spans.select(
        F.col(trace_col).alias("t"),
        F.col(span_col).alias("sid"),
        F.col(parent_col).alias("pid"),
    )
    parents = s.select(
        F.col("t"), F.col("sid").alias("pid"), F.lit(1).alias("_found")
    ).distinct()
    j = s.join(parents, ["t", "pid"], "left")
    return j.groupBy(F.col("t").alias(trace_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("pid").isNull().cast("int")).cast("long").alias(
            "n_roots"
        ),
        F.sum(
            (F.col("pid").isNotNull() & F.col("_found").isNull()).cast(
                "int"
            )
        ).cast("long").alias("n_orphans"),
        F.round(
            F.sum(
                (
                    F.col("pid").isNotNull() & F.col("_found").isNull()
                ).cast("int")
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("orphan_frac"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient — do hubs attach to hubs?

    The Pearson correlation of endpoint degrees over the (symmetrized)
    edge list: positive = hub-to-hub (social nets), negative =
    hub-to-leaf (infrastructure, most service graphs).  The single
    scalar that says which failure-propagation regime a
    ``service_graph_edges`` topology is in.  Degrees from one
    aggregate over the edge list; the correlation from one power-sum
    pass over edges joined to degrees on both ends — |E| bounded
    joins, no windows.

    ``edges`` must be distinct undirected pairs (a < b).
    """
    both = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    j = (
        both.join(deg.select(F.col("u"), F.col("d").alias("du")), "u")
        .join(
            deg.select(
                F.col("u").alias("v"), F.col("d").alias("dv")
            ),
            "v",
        )
    )
    a = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("du").cast("double")).alias("sx"),
        F.sum(F.col("dv").cast("double")).alias("sy"),
        F.sum((F.col("du") * F.col("dv")).cast("double")).alias("sxy"),
        F.sum((F.col("du") * F.col("du")).cast("double")).alias("sxx"),
        F.sum((F.col("dv") * F.col("dv")).cast("double")).alias("syy"),
    )
    n = F.col("n")
    num = F.col("sxy") / n - F.col("sx") / n * F.col("sy") / n
    den = F.sqrt(
        (F.col("sxx") / n - F.col("sx") / n * F.col("sx") / n)
        * (F.col("syy") / n - F.col("sy") / n * F.col("sy") / n)
    )
    return a.select(
        (n / 2).cast("bigint").alias("n_edges"),
        F.round(F.try_divide(num, den), 6).alias("assortativity"),
    )


HITS_ITERS = 8


def hits_scores(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = HITS_ITERS,
) -> DataFrame:
    """HITS hubs & authorities over a bounded directed graph — the
    service-dependency complement to PageRank: a node is a good HUB
    if it points at good authorities, a good AUTHORITY if good hubs
    point at it (think: gateway services vs backend services in the
    repo's service_graph_edges output).

    Fixed-iteration, engine-reproducible (the EM/Platt contract):
    per round two keyed join+aggregate passes (a = A^T h, h = A a),
    each max-normalized with the scalar max COLLECTED driver-side
    (one bounded row) and scores ROUNDED to 12dp so fold noise
    cannot fork the trajectory.  Lineage is cut per round with an
    eager localCheckpoint — iterative-plan hygiene, not persistence.
    """
    h = nodes.select("node", F.lit(1.0).alias("h"))
    a = nodes.select("node", F.lit(1.0).alias("a"))
    for _ in range(iters):
        raw_a = (
            edges.join(h, edges.src == h.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("v"))
        )
        a = nodes.join(raw_a, "node", "left").select(
            "node", F.coalesce("v", F.lit(0.0)).alias("v")
        )
        m = a.agg(F.max("v")).collect()[0][0] or 1.0
        a = a.select(
            "node", F.round(F.col("v") / F.lit(m), 12).alias("a")
        ).localCheckpoint(eager=True)
        raw_h = (
            edges.join(a, edges.dst == a.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("v"))
        )
        h = nodes.join(raw_h, "node", "left").select(
            "node", F.coalesce("v", F.lit(0.0)).alias("v")
        )
        mh = h.agg(F.max("v")).collect()[0][0] or 1.0
        h = h.select(
            "node", F.round(F.col("v") / F.lit(mh), 12).alias("h")
        ).localCheckpoint(eager=True)
    return (
        nodes.join(a, "node").join(h, "node")
        .select(
            "node",
            F.round("a", 6).alias("authority"),
            F.round("h", 6).alias("hub"),
        )
        .orderBy("node")
    )


LP_ROUNDS = 5


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = LP_ROUNDS,
) -> DataFrame:
    """Synchronous label-propagation community detection with a
    DETERMINISTIC tie-break (highest neighbor-label count, then
    lowest label) — async LP is run-order-dependent, which would be
    un-oracle-able; the synchronous variant with a total tie order
    is reproducible on any engine.

    Fixed ``rounds`` supersteps: join labels onto (symmetric) edges,
    count neighbor labels per node, pick per node via one ranked
    window over the bounded (node x candidate-label) table; isolated
    nodes keep their label.  Lineage cut per round.  Emits the final
    community roll-up (community label, size, min member).
    """
    lab = nodes.select("node", F.col("node").cast("long").alias("lab"))
    for _ in range(rounds):
        cnt = (
            edges.join(lab, edges.src == lab.node)
            .groupBy(F.col("dst").alias("n"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("n").orderBy(F.desc("c"), F.asc("lab"))
        pick = cnt.select(
            "n", "lab", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") == 1).select(
            F.col("n").alias("node"), F.col("lab").alias("newlab")
        )
        lab = lab.join(pick, "node", "left").select(
            "node", F.coalesce("newlab", "lab").alias("lab")
        ).localCheckpoint(eager=True)
    return (
        lab.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.min("node").alias("exemplar"),
        )
        .orderBy("community")
    )


TEXTRANK_ITERS = 10


def textrank_keywords(
    df: DataFrame,
    group_col: str,
    text_col: str,
    iters: int = TEXTRANK_ITERS,
    damping: float = 0.85,
    top_k: int = 8,
) -> DataFrame:
    """TextRank keyword extraction per corpus group: PageRank over
    the undirected word co-occurrence graph (adjacent-word edges,
    weight = co-occurrence count), the unsupervised keyword ranking
    of Mihalcea & Tarau 2004.

    The graph is bounded by the vocabulary, not the corpus: edges
    collapse to (group, w1, w2, count) first, so the fixed-iteration
    weighted power method runs over the small graph regardless of
    document count.  Scores ROUND to 12dp per iteration (the
    reproducibility contract); emits top_k words per group.
    """
    words = df.select(
        F.col(group_col).alias("g"),
        F.split(F.col(text_col), " ").alias("ws"),
    ).filter(F.size("ws") >= 2)  # sequence(1, 0) would run BACKWARD
    adj = words.select(
        "g",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("g", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    sym = adj.union(
        adj.select("g", F.col("w2").alias("w1"), F.col("w1").alias("w2"))
    )
    e = sym.groupBy("g", "w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("wt")
    ).filter(F.col("w1") != F.col("w2")).localCheckpoint(eager=True)
    deg = e.groupBy("g", "w1").agg(F.sum("wt").alias("d"))
    ew = e.join(deg, ["g", "w1"]).select(
        "g", "w1", "w2", (F.col("wt") / F.col("d")).alias("share")
    ).localCheckpoint(eager=True)
    vocab = e.select("g", F.col("w1").alias("w")).distinct()
    r = vocab.select("g", "w", F.lit(1.0).alias("r"))
    for _ in range(iters):
        contrib = (
            ew.join(
                r,
                (ew.g == r.g) & (ew.w1 == r.w),
            )
            .groupBy(ew.g.alias("g"), F.col("w2").alias("w"))
            .agg(F.sum(F.col("share") * F.col("r")).alias("cin"))
        )
        r = vocab.join(contrib, ["g", "w"], "left").select(
            "g", "w",
            F.round(
                (1 - damping) + damping * F.coalesce("cin", F.lit(0.0)),
                12,
            ).alias("r"),
        ).localCheckpoint(eager=True)
    wtop = Window.partitionBy("g").orderBy(F.desc("r"), F.asc("w"))
    return r.select(
        F.col("g").alias(group_col),
        F.col("w").alias("word"),
        F.round("r", 6).alias("textrank"),
        F.row_number().over(wtop).alias("rk"),
    ).filter(F.col("rk") <= top_k)


def bfs_levels(
    nodes: DataFrame,
    edges: DataFrame,
    source,
    max_rounds: int = 12,
) -> DataFrame:
    """Bounded-round BFS levels from one source over a (symmetric)
    edge set: fixed ``max_rounds`` supersteps of join + min-aggregate
    with lineage cut per round — levels stabilize once the frontier
    empties, so max_rounds only needs to exceed the graph's
    eccentricity bound.  Returns (node, level) with unreached nodes
    absent.
    """
    lev = nodes.filter(F.col("node") == source).select(
        "node", F.lit(0).alias("level")
    ).localCheckpoint(eager=True)
    for r in range(1, max_rounds + 1):
        nxt = (
            edges.join(lev, edges.src == lev.node)
            .select(F.col("dst").alias("node"), F.lit(r).alias("level"))
        )
        lev = (
            lev.unionByName(nxt)
            .groupBy("node").agg(F.min("level").alias("level"))
            .localCheckpoint(eager=True)
        )
    return lev


def diameter_double_sweep(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 12,
) -> DataFrame:
    """Double-sweep diameter estimate: BFS from the minimum node id,
    take the farthest node (min id among ties — deterministic), BFS
    again from it; the second eccentricity is the classic tight
    lower bound on the graph diameter.  2 x bounded BFS (fixed
    supersteps, keyed joins), one row out: the two sweep roots,
    eccentricities, and reached counts.
    """
    src0 = nodes.agg(F.min("node")).collect()[0][0]
    l1 = bfs_levels(nodes, edges, F.lit(src0), max_rounds)
    far = l1.orderBy(F.desc("level"), F.asc("node")).limit(1).collect()[0]
    l2 = bfs_levels(nodes, edges, F.lit(far["node"]), max_rounds)
    agg2 = l2.agg(
        F.max("level").alias("ecc2"),
        F.count(F.lit(1)).alias("reached2"),
    )
    agg1 = l1.agg(F.count(F.lit(1)).alias("reached1"))
    # roots keep the node column's own type: int() coercion would
    # raise on string node ids (service names — the stated use case)
    # while bfs_levels itself is type-agnostic.
    node_type = nodes.schema["node"].dataType
    return agg2.crossJoin(agg1).select(
        F.lit(src0).cast(node_type).alias("sweep1_root"),
        F.lit(far["node"]).cast(node_type).alias("sweep2_root"),
        F.lit(int(far["level"])).cast("bigint").alias("ecc1"),
        F.col("ecc2").cast("bigint").alias("diameter_lb"),
        F.col("reached1").cast("bigint").alias("reached_from_root1"),
        F.col("reached2").cast("bigint").alias("reached_from_root2"),
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
) -> DataFrame:
    """Newman modularity of a node->community assignment over an
    undirected (symmetric-edge-list) graph: Q = sum_c [ m_c/m -
    (d_c/2m)^2 ] — the quality score that closes the loop on the
    label-propagation entry (is the found partition better than
    random?).

    Degrees and within-community edge counts are keyed aggregates on
    the community-joined edge list; Q is a single-row reduction.
    Counts use the symmetric list directly (each edge appears twice),
    so 2m = |rows|.
    """
    lab = communities.select(
        F.col("node"), F.col("community").alias("com")
    )
    e = (
        edges.join(lab, edges.src == lab.node)
        .select("src", "dst", F.col("com").alias("com_src"))
        .join(
            lab.select(
                F.col("node").alias("dst2"),
                F.col("com").alias("com_dst"),
            ),
            F.col("dst") == F.col("dst2"),
        )
    )
    two_m = e.count()
    within = e.filter(F.col("com_src") == F.col("com_dst")).groupBy(
        F.col("com_src").alias("com")
    ).agg(F.count(F.lit(1)).cast("double").alias("win2"))
    deg = e.groupBy(F.col("com_src").alias("com")).agg(
        F.count(F.lit(1)).cast("double").alias("d_c")
    )
    per = deg.join(within, "com", "left").select(
        "com",
        (
            F.coalesce("win2", F.lit(0.0)) / two_m
            - (F.col("d_c") / two_m) * (F.col("d_c") / two_m)
        ).alias("q_c"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.lit(two_m // 2).cast("bigint").alias("n_edges"),
        F.round(F.sum("q_c"), 6).alias("modularity"),
    )


def rich_club(
    edges: DataFrame,
    max_k: int = 10,
) -> DataFrame:
    """Rich-club coefficient phi(k) for k = 1..max_k: the edge
    density among nodes of degree > k — do the hubs preferentially
    interconnect?  (Service meshes: are the high-fanout services a
    tightly coupled core?)

    Degrees from one aggregate over the symmetric edge list; for
    each k (bounded literal grid) the surviving-node count and
    surviving-edge count come from a degree-joined filter — one
    bounded explode, no quadratic scan.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ks = edges.sparkSession.range(1, max_k + 1).select(
        F.col("id").cast("long").alias("k")
    )
    # LEFT join so every k in 1..max_k emits a row: with an inner join
    # a k with zero surviving nodes silently vanishes and consumers
    # can't tell 'no rich club at k' from 'not computed'.  count(d)
    # (non-null only) makes the unmatched grid row n_k = 0.
    nk = ks.join(deg, deg.d > ks.k, "left").groupBy("k").agg(
        F.count(deg.d).cast("double").alias("n_k")
    )
    ed = (
        edges.join(deg.select(F.col("node").alias("src"),
                              F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"),
                         F.col("d").alias("dd")), "dst")
    )
    ek = ks.join(
        ed, (ed.ds > ks.k) & (ed.dd > ks.k)
    ).groupBy("k").agg(
        (F.count(F.lit(1)) / 2).cast("double").alias("e_k")
    )
    out = nk.join(ek, "k", "left").select(
        "k",
        F.col("n_k").cast("bigint").alias("n_nodes"),
        F.coalesce("e_k", F.lit(0.0)).cast("bigint").alias("n_edges"),
        F.round(
            F.when(
                F.col("n_k") > 1,
                2 * F.coalesce("e_k", F.lit(0.0))
                / (F.col("n_k") * (F.col("n_k") - 1)),
            ),
            6,
        ).alias("phi"),
    )
    return out.orderBy("k")


TOPO_ROUNDS = 12


def topo_layers(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = TOPO_ROUNDS,
) -> DataFrame:
    """Kahn-style topological layering of a DAG: layer(n) = length of
    the longest dependency chain into n — the parallel-scheduling
    depth chart (which build/ETL stages can run together, and how
    long the critical chain is).

    Fixed supersteps of join + max-aggregate (layer(n) = 1 +
    max(layer(pred))), lineage cut per round; ``rounds`` bounds the
    chain length (a config constant, like the repo's other bounded
    traversals).  Emits the layer histogram plus each layer's
    minimum node as exemplar.
    """
    lay = nodes.select("node", F.lit(0).alias("layer"))
    for _ in range(rounds):
        upd = (
            edges.join(lay, edges.src == lay.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("layer") + 1).alias("layer"),
            )
        )
        lay = (
            lay.unionByName(upd)
            .groupBy("node").agg(F.max("layer").alias("layer"))
            .localCheckpoint(eager=True)
        )
    return lay.groupBy("layer").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("node").alias("exemplar"),
    ).orderBy("layer")


CASCADE_ROUNDS = 6


def cascade_failure_sim(
    nodes: DataFrame,
    edges: DataFrame,
    capacity_factor: float = 1.5,
    rounds: int = CASCADE_ROUNDS,
) -> DataFrame:
    """Motter-Lai-style cascade simulation on a load-bearing graph:
    every node starts at load = degree with capacity = factor *
    load; the highest-degree node is knocked out; each superstep
    redistributes every failed node's load equally to its LIVE
    neighbors and fails anything over capacity — does one failure
    stay local, or take the mesh down?

    Fixed supersteps of keyed joins + aggregates with lineage cuts;
    emits the per-round failure counts and surviving fraction.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("load0")
    )
    state = nodes.join(deg, "node", "left").select(
        "node",
        F.coalesce("load0", F.lit(0.0)).alias("load"),
        (F.coalesce("load0", F.lit(0.0)) * capacity_factor)
        .alias("cap"),
        F.lit(True).alias("alive"),
    )
    seed = state.orderBy(
        F.desc("cap"), F.asc("node")
    ).limit(1).select(F.col("node").alias("kill"))
    state = state.crossJoin(seed).select(
        "node", "load", "cap",
        (F.col("alive") & (F.col("node") != F.col("kill")))
        .alias("alive"),
    ).localCheckpoint(eager=True)
    history = []
    for r in range(1, rounds + 1):
        dead = state.filter(
            ~F.col("alive") & (F.col("load") > 0)
        ).select(F.col("node").alias("dn"), F.col("load").alias("dl"))
        live_nb = (
            edges.join(dead, edges.src == F.col("dn"))
            .join(
                state.filter(F.col("alive")).select(
                    F.col("node").alias("ln")
                ),
                F.col("dst") == F.col("ln"),
            )
        )
        nb_counts = live_nb.groupBy("dn", "dl").agg(
            F.count(F.lit(1)).cast("double").alias("k")
        )
        xfer = (
            live_nb.join(nb_counts, ["dn", "dl"])
            .groupBy(F.col("ln").alias("node"))
            .agg(F.sum(F.col("dl") / F.col("k")).alias("extra"))
        )
        state = state.join(xfer, "node", "left").select(
            "node",
            F.when(
                ~F.col("alive"), F.lit(0.0)
            ).otherwise(
                F.col("load") + F.coalesce("extra", F.lit(0.0))
            ).alias("load"),
            "cap",
            (
                F.col("alive")
                & (
                    F.col("load") + F.coalesce("extra", F.lit(0.0))
                    <= F.col("cap")
                )
            ).alias("alive"),
        ).localCheckpoint(eager=True)
        surv = state.agg(
            F.sum(F.col("alive").cast("long")).alias("a"),
            F.count(F.lit(1)).alias("t"),
        ).collect()[0]
        history.append((r, int(surv["a"]), int(surv["t"])))
    spark = nodes.sparkSession
    rows = [
        (r, t - a, a, round(a / t, 6)) for r, a, t in history
    ]
    return spark.range(len(rows)).select(
        F.col("id").cast("int").alias("_i")
    ).select(
        F.element_at(
            F.array(*[F.lit(r[0]) for r in rows]), F.col("_i") + 1
        ).alias("round"),
        F.element_at(
            F.array(*[F.lit(r[1]) for r in rows]), F.col("_i") + 1
        ).cast("bigint").alias("failed"),
        F.element_at(
            F.array(*[F.lit(r[2]) for r in rows]), F.col("_i") + 1
        ).cast("bigint").alias("alive"),
        F.element_at(
            F.array(*[F.lit(float(r[3])) for r in rows]),
            F.col("_i") + 1,
        ).alias("surviving_frac"),
    ).orderBy("round")


K_TRUSS_ROUNDS = 6


def k_truss_edges(
    edges: DataFrame,
    k: int = 4,
    rounds: int = K_TRUSS_ROUNDS,
) -> DataFrame:
    """k-truss decomposition (fixed peel rounds): keep only edges
    participating in at least k-2 triangles among surviving edges —
    the cohesion upgrade over k-core (cores count neighbors,
    trusses count MUTUAL neighbors).  Emits the surviving truss
    edges with their final support.

    Per round: triangle support per edge via one two-hop join over
    the canonical (src<dst) edge list, then the peel filter; fixed
    ``rounds`` supersteps with lineage cuts (support is monotone
    under peeling, so convergence is typically < log rounds).
    """
    e = edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        sym = e.select("a", "b").unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        two = sym.select(
            F.col("a").alias("u"), F.col("b").alias("w1")
        ).join(
            sym.select(F.col("a").alias("w2"), F.col("b").alias("v")),
            F.col("w1") == F.col("w2"),
        ).select("u", "v", F.col("w1").alias("w"))
        tri = two.join(
            e.select(
                F.col("a").alias("u2"), F.col("b").alias("v2")
            ),
            (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2")),
        ).groupBy("u", "v").agg(
            F.count(F.lit(1)).alias("support")
        )
        e = e.join(
            tri,
            (e.a == tri.u) & (e.b == tri.v),
            "left",
        ).select(
            "a", "b",
            F.coalesce("support", F.lit(0)).alias("support"),
        ).filter(F.col("support") >= k - 2).select(
            "a", "b"
        ).localCheckpoint(eager=True)
    sym = e.select("a", "b").unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    two = sym.select(
        F.col("a").alias("u"), F.col("b").alias("w1")
    ).join(
        sym.select(F.col("a").alias("w2"), F.col("b").alias("v")),
        F.col("w1") == F.col("w2"),
    ).select("u", "v")
    fin = two.join(
        e.select(F.col("a").alias("u2"), F.col("b").alias("v2")),
        (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2")),
    ).groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    return e.join(
        fin, (e.a == fin.u) & (e.b == fin.v), "left"
    ).select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.coalesce("support", F.lit(0)).cast("bigint")
        .alias("support"),
    ).orderBy("src", "dst")
