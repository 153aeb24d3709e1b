"""Unit tests for graph.ancestor_paths (pointer doubling)."""

from __future__ import annotations


def _run(spark, rows):
    from sparkcollector.operators.graph import ancestor_paths

    df = spark.createDataFrame(rows, "id bigint, parent_id bigint")
    return {
        r["id"]: (r["depth"], list(r["path"]))
        for r in ancestor_paths(df).collect()
    }


def test_single_root(spark):
    assert _run(spark, [(1, None)]) == {1: (0, [1])}


def test_small_tree(spark):
    #      1
    #     / \
    #    2   3
    #   /
    #  4
    got = _run(spark, [(1, None), (2, 1), (3, 1), (4, 2)])
    assert got == {
        1: (0, [1]),
        2: (1, [1, 2]),
        3: (1, [1, 3]),
        4: (2, [1, 2, 4]),
    }


def test_forest_two_roots(spark):
    got = _run(spark, [(1, None), (2, 1), (10, None), (11, 10)])
    assert got[11] == (1, [10, 11]) and got[2] == (1, [1, 2])


def test_deep_chain_log_rounds(spark):
    # depth 33 chain: naive parent-chasing needs 33 rounds; doubling
    # needs ceil(log2(33)) + 1 = 7 — the loop must converge well under
    # max_rounds and produce the exact root-to-leaf order.
    n = 34
    rows = [(0, None)] + [(i, i - 1) for i in range(1, n)]
    got = _run(spark, rows)
    assert got[n - 1] == (n - 1, list(range(n)))


def test_subtree_rollup_sums(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.graph import ancestor_paths, subtree_rollup

    #      1(v=1)
    #     /      \
    #    2(v=2)   3(v=4)
    #   /
    #  4(v=8)
    nodes = spark.createDataFrame(
        [(1, None, 1.0), (2, 1, 2.0), (3, 1, 4.0), (4, 2, 8.0)],
        "id bigint, parent_id bigint, value double",
    )
    paths = ancestor_paths(nodes.select("id", "parent_id"))
    got = {
        r["subtree_root"]: (r["subtree_size"], r["subtree_sum"])
        for r in subtree_rollup(nodes.select("id", "value"), paths).collect()
    }
    assert got == {1: (4, 15.0), 2: (2, 10.0), 3: (1, 4.0), 4: (1, 8.0)}


def test_dangling_parent_becomes_fragment_root(spark):
    # parent 99 has no node row: node 2 must keep a valid path rooted
    # at itself, not collapse to NULL
    got = _run(spark, [(1, None), (2, 99)])
    assert got == {1: (0, [1]), 2: (0, [2])}


def test_service_graph_edges(spark):
    """Two callers, roots excluded, decimal-stable totals."""
    from sparkcollector.operators.graph import service_graph_edges

    rows = [
        # (id, parent, label, value)
        ("a", None, "gw", 1.0),       # root: no edge
        ("b", "a", "auth", 2.5),      # gw -> auth
        ("c", "a", "auth", 3.5),      # gw -> auth
        ("d", "c", "db", 10.0),       # auth -> db
        ("e", "zz", "db", 4.0),       # dangling parent: no edge
    ]
    df = spark.createDataFrame(rows, ["id", "parent", "label", "value"])
    got = {
        (r["caller"], r["callee"]): (r["n_calls"], r["total_value"], r["max_value"])
        for r in service_graph_edges(df, "id", "parent", "label", "value").collect()
    }
    assert got == {
        ("gw", "auth"): (2, 6.0, 3.5),
        ("auth", "db"): (1, 10.0, 10.0),
    }


def test_critical_path_argmax_and_tiebreak(spark):
    from sparkcollector.operators.graph import critical_path

    rows = [
        # forest 1: a -> {b -> d, c}; critical = a-b-d = 13
        ("a", None, 1.0),
        ("b", "a", 2.0),
        ("c", "a", 5.0),
        ("d", "b", 10.0),
        # forest 2: tie between two leaves (cost 3.0 each) -> lower id
        ("r", None, 1.0),
        ("x", "r", 2.0),
        ("y", "r", 2.0),
        # forest 3: single node
        ("z", None, 4.0),
    ]
    df = spark.createDataFrame(rows, ["id", "parent", "value"])
    got = {
        r["root"]: (r["leaf_id"], r["depth"], r["path_cost"])
        for r in critical_path(df, "id", "parent", "value").collect()
    }
    assert got == {
        "a": ("d", 2, 13.0),
        "r": ("x", 1, 3.0),
        "z": ("z", 0, 4.0),
    }


def test_pagerank_step_conserves_mass_and_converges_direction(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.graph import pagerank_step

    # 4 nodes: 0->1, 0->2, 1->2, 3 dangling; node 2 should gain rank
    nodes = spark.range(4).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    r1 = pagerank_step(nodes, edges, n_nodes=4)
    got = {r["node"]: r["rank"] for r in r1.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-12  # mass conserved
    assert got[2] == max(got.values())           # two in-edges wins
    assert got[3] == min(got.values())           # no in-edges
    # second iteration feeds the first one's output back
    r2 = pagerank_step(
        r1.withColumnRenamed("rank", "r0"), edges, n_nodes=4, rank_col="r0"
    )
    got2 = {r["node"]: r["rank"] for r in r2.collect()}
    assert abs(sum(got2.values()) - 1.0) < 1e-12


def test_span_clock_skew_detects_backdated_child(spark):
    import datetime

    from sparkcollector.operators.graph import span_clock_skew

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    # heap: seq2,3 children of 1; seq4 child of 2.  seq3 backdated
    # 50s before its parent -> one violation, skew 50s
    rows = [
        (7, 1, ts(100)), (7, 2, ts(110)), (7, 3, ts(50)), (7, 4, ts(120)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    r = span_clock_skew(df).collect()[0]
    assert r["n_spans"] == 4
    assert r["n_violations"] == 1
    assert r["max_skew_s"] == 50.0


def test_span_self_time_flamegraph_math(spark):
    from sparkcollector.operators.graph import span_self_time

    # heap: 1 has children 2,3; 2 has child 4
    # durations: 1=100, 2=40, 3=30, 4=10
    rows = [(9, 1, 100.0), (9, 2, 40.0), (9, 3, 30.0), (9, 4, 10.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = {r["seq"]: r for r in
           span_self_time(df, "user_id", "value", "event_id").collect()}
    assert got[1]["self_time"] == 30.0   # 100 - (40+30)
    assert got[2]["self_time"] == 30.0   # 40 - 10
    assert got[3]["self_time"] == 30.0   # leaf
    assert got[4]["self_time"] == 10.0
    # children summing past the parent clamps at 0
    rows2 = [(9, 1, 10.0), (9, 2, 40.0), (9, 3, 30.0)]
    df2 = spark.createDataFrame(rows2, "user_id long, event_id long, value double")
    r1 = {r["seq"]: r for r in
          span_self_time(df2, "user_id", "value", "event_id").collect()}[1]
    assert r1["self_time"] == 0.0


def test_degree_distribution_directions(spark):
    from sparkcollector.operators.graph import degree_distribution

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {(r["direction"], r["degree"]): r["n_nodes"]
           for r in degree_distribution(edges).collect()}
    assert got[("out", 2)] == 1   # node 1
    assert got[("out", 1)] == 1   # node 2
    assert got[("in", 2)] == 1    # node 3
    assert got[("in", 1)] == 1    # node 2


def test_triangle_census_known_graph(spark):
    from sparkcollector.operators.graph import triangle_census

    edges = [(1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    r = triangle_census(df).collect()[0]
    # degrees 2,2,3,1: wedges = 1+1+3+0 = 5; one triangle
    assert (r["n_nodes"], r["n_edges"]) == (4, 4)
    assert (r["n_wedges"], r["n_triangles"]) == (5, 1)
    assert abs(r["global_clustering"] - 0.6) < 1e-9


def test_kcore_peel_step_known_graph(spark):
    from sparkcollector.operators.graph import kcore_peel_step

    # triangle 1-2-3 plus pendant 4 hanging off 1; self-loop and a
    # reversed duplicate must collapse before degrees.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (1, 4), (4, 4)],
        "src long, dst long",
    )
    got = {r["node"]: r for r in kcore_peel_step(edges, k=2).collect()}
    assert got[1]["degree"] == 3 and got[1]["kept"] is True
    assert got[2]["degree"] == 2 and got[3]["degree"] == 2
    assert got[4]["degree"] == 1 and got[4]["kept"] is False
    # after removing node 4, the triangle survives a second peel
    surv = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    again = {r["node"]: r["kept"] for r in
             kcore_peel_step(surv, k=2).collect()}
    assert again == {1: True, 2: True, 3: True}


def test_local_clustering_coeff_k4_minus_edge(spark):
    from sparkcollector.operators.graph import local_clustering_coeff

    # K4 minus edge (3,4): triangles 123 and 124
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["v"]: r for r in local_clustering_coeff(df).collect()}
    assert got[1]["triangles"] == 2 and abs(got[1]["coeff"] - 2 / 3) < 1e-5
    assert got[3]["triangles"] == 1 and got[3]["coeff"] == 1.0
    assert got[3]["degree"] == 2


def test_local_clustering_coeff_star_is_zero(spark):
    from sparkcollector.operators.graph import local_clustering_coeff

    edges = [(1, 2), (1, 3), (1, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["v"]: r for r in local_clustering_coeff(df).collect()}
    assert got[1]["triangles"] == 0 and got[1]["coeff"] == 0.0
    assert got[2]["degree"] == 1 and got[2]["coeff"] == 0.0


def test_connected_components_long_chain(spark):
    from sparkcollector.operators.graph import connected_components

    # a 12-node chain (worst case for min-label diameter walks) plus a
    # disjoint triangle and an isolated edge
    chain = [(i, i + 1) for i in range(1, 12)]
    tri = [(100, 101), (101, 102), (100, 102)]
    iso = [(200, 201)]
    df = spark.createDataFrame(chain + tri + iso, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert all(got[i] == 1 for i in range(1, 13))
    assert all(got[n] == 100 for n in (100, 101, 102))
    assert got[200] == 200 and got[201] == 200
    assert len(got) == 17


def test_connected_components_star_already_converged(spark):
    from sparkcollector.operators.graph import connected_components

    df = spark.createDataFrame(
        [(5, 1), (6, 1), (7, 1)], "src long, dst long"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 5: 1, 6: 1, 7: 1}


def test_missing_parent_audit_roots_and_orphans(spark):
    from sparkcollector.operators.graph import missing_parent_audit

    spans = [
        ("t1", 1, None),    # root
        ("t1", 2, 1),       # ok
        ("t1", 3, 99),      # orphan (99 not in t1)
        ("t2", 1, None),    # root; same span id in another trace
        ("t2", 5, 1),       # ok — parent resolves within t2 only
    ]
    df = spark.createDataFrame(spans, "trace_id string, span_id long, parent_id long")
    got = {r["trace_id"]: r for r in missing_parent_audit(df).collect()}
    assert got["t1"]["n_roots"] == 1 and got["t1"]["n_orphans"] == 1
    assert got["t2"]["n_orphans"] == 0 and got["t2"]["n_spans"] == 2


def test_hits_star_graph(spark):
    from sparkcollector.operators.graph import hits_scores

    # hub node 0 points at 1, 2, 3; nothing points at 0:
    # 1-3 are pure authorities, 0 the pure hub
    nodes = spark.range(4).selectExpr("id as node")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits_scores(nodes, edges).collect()}
    assert out[0]["hub"] == 1.0 and out[0]["authority"] == 0.0
    for n in (1, 2, 3):
        assert out[n]["authority"] == 1.0 and out[n]["hub"] == 0.0


def test_label_propagation_two_cliques(spark):
    from sparkcollector.operators.graph import label_propagation

    # two triangles {0,1,2} and {3,4,5} joined by nothing: two
    # communities labeled by their minimum member
    tri = [(a, b) for a, b, in
           [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]]
    sym = tri + [(b, a) for a, b in tri]
    nodes = spark.range(6).selectExpr("id as node")
    edges = spark.createDataFrame(sym, "src long, dst long")
    out = {r["community"]: r for r in
           label_propagation(nodes, edges).collect()}
    assert set(out) == {0, 3}
    assert out[0]["size"] == 3 and out[0]["exemplar"] == 0
    assert out[3]["size"] == 3 and out[3]["exemplar"] == 3


def test_textrank_hub_word_wins(spark):
    from sparkcollector.operators.graph import textrank_keywords

    # 'core' co-occurs with everything; fringe words only with core
    docs = [("s", "core alpha core beta core gamma core delta")] * 3
    df = spark.createDataFrame(docs, "source string, text string")
    out = textrank_keywords(df, "source", "text", top_k=3).collect()
    assert out[0]["word"] == "core"
    assert out[0]["textrank"] > out[1]["textrank"]


def test_diameter_double_sweep_path_graph(spark):
    from sparkcollector.operators.graph import diameter_double_sweep

    # path 0-1-2-3-4-5: diameter 5, double sweep finds it exactly
    edges = [(i, i + 1) for i in range(5)]
    sym = edges + [(b, a) for a, b in edges]
    nodes = spark.range(6).selectExpr("id as node")
    e = spark.createDataFrame(sym, "src long, dst long")
    r = diameter_double_sweep(nodes, e, max_rounds=8).collect()[0]
    assert r["sweep1_root"] == 0
    assert r["ecc1"] == 5 and r["sweep2_root"] == 5
    assert r["diameter_lb"] == 5
    assert r["reached_from_root1"] == 6


def test_modularity_cliques_vs_random_partition(spark):
    from sparkcollector.operators.graph import modularity

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    sym = tri + [(b, a) for a, b in tri]
    e = spark.createDataFrame(sym, "src long, dst long")
    good = spark.createDataFrame(
        [(n, 0 if n < 3 else 1) for n in range(6)],
        "node long, community long",
    )
    r = modularity(e, good).collect()[0]
    # two perfect cliques, no cross edges: Q = 1/2
    assert abs(r["modularity"] - 0.5) < 1e-6
    assert r["n_edges"] == 6
    # everything in one community: Q = 0
    one = spark.createDataFrame(
        [(n, 0) for n in range(6)], "node long, community long"
    )
    r2 = modularity(e, one).collect()[0]
    assert abs(r2["modularity"]) < 1e-9


def test_rich_club_core_vs_periphery(spark):
    from sparkcollector.operators.graph import rich_club

    # K4 core (degrees >= 3+) with pendant leaves on each core node
    core = [(a, b) for a in range(4) for b in range(4) if a != b]
    pendants = []
    for i in range(4):
        leaf = 10 + i
        pendants += [(i, leaf), (leaf, i)]
    e = spark.createDataFrame(core + pendants, "src long, dst long")
    out = {r["k"]: r for r in rich_club(e, max_k=4).collect()}
    # degree>3 set = the 4 core nodes (deg 4); they form a clique:
    # phi = 1
    assert out[3]["n_nodes"] == 4 and out[3]["phi"] == 1.0
    # degree>1 includes nobody else (leaves have degree 1)
    assert out[1]["n_nodes"] == 4


def test_topo_layers_chain_and_diamond(spark):
    from sparkcollector.operators.graph import topo_layers

    # diamond 0->1,0->2,1->3,2->3 plus tail 3->4: longest chains
    # give layers 0,1,1,2,3
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    nodes = spark.range(5).selectExpr("id as node")
    out = {r["layer"]: r for r in topo_layers(
        nodes, edges, rounds=6).collect()}
    assert out[0]["n_nodes"] == 1 and out[0]["exemplar"] == 0
    assert out[1]["n_nodes"] == 2
    assert out[2]["exemplar"] == 3
    assert out[3]["exemplar"] == 4


def test_cascade_contained_vs_fragile(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.graph import cascade_failure_sim

    # star: hub 0 connected to 8 leaves; big capacity factor means
    # killing the hub fails nothing else (leaves get hub load but
    # have slack)... with tiny factor they cascade
    star = [(0, i) for i in range(1, 9)]
    sym = star + [(b, a) for a, b in star]
    e = spark.createDataFrame(sym, "src long, dst long")
    nodes = spark.range(9).selectExpr("id as node")
    out = cascade_failure_sim(nodes, e, capacity_factor=20.0).collect()
    # only the seeded hub is down, everything else survives
    assert out[-1]["failed"] == 1
    out2 = cascade_failure_sim(nodes, e, capacity_factor=1.1).collect()
    # hub load 8 redistributed: each leaf gets +1 on load 1 vs cap
    # 1.1 -> all fail next round
    assert out2[-1]["alive"] == 0


def test_k_truss_keeps_clique_drops_tree(spark):
    from sparkcollector.operators.graph import k_truss_edges

    # K4 clique + a pendant chain: 4-truss = the clique's 6 edges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11)]
    e = spark.createDataFrame(k4 + chain, "src long, dst long")
    out = k_truss_edges(e, k=4).collect()
    kept = {(r["src"], r["dst"]) for r in out}
    assert kept == set(k4)
    assert all(r["support"] == 2 for r in out)


def test_rich_club_emits_full_k_grid_with_empty_levels(spark):
    from sparkcollector.operators.graph import rich_club

    # triangle: every node has degree 2, so k >= 2 has NO surviving
    # nodes — those grid rows must still appear (n_nodes=0, phi NULL),
    # not silently vanish (inner-join regression)
    tri = [(0, 1), (1, 2), (0, 2)]
    sym = tri + [(b, a) for a, b in tri]
    e = spark.createDataFrame(sym, "src long, dst long")
    out = {r["k"]: r for r in rich_club(e, max_k=5).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5], "full k grid promised"
    assert out[1]["n_nodes"] == 3 and out[1]["phi"] == 1.0
    for k in (2, 3, 4, 5):
        assert out[k]["n_nodes"] == 0
        assert out[k]["n_edges"] == 0
        assert out[k]["phi"] is None


def test_diameter_double_sweep_string_node_ids(spark):
    from sparkcollector.operators.graph import diameter_double_sweep

    # service names, the stated use case: int() coercion regression
    chain = [("auth", "cart"), ("cart", "pay"), ("pay", "ship")]
    sym = chain + [(b, a) for a, b in chain]
    nodes = spark.createDataFrame(
        [("auth",), ("cart",), ("pay",), ("ship",)], "node string"
    )
    e = spark.createDataFrame(sym, "src string, dst string")
    r = diameter_double_sweep(nodes, e, max_rounds=6).collect()[0]
    assert r["sweep1_root"] == "auth"   # min string id
    assert r["sweep2_root"] == "ship"
    assert r["diameter_lb"] == 3
    assert r["reached_from_root1"] == 4
