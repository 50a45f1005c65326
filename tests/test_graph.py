"""Graph traversal tests (G1/G2/G5): k-hop expansion and bidirectional BFS
against hand-checked fixtures."""

import pytest


@pytest.fixture(scope="module")
def chain_edges(spark):
    # 0→1→2→3→4 plus a disconnected 100→101
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (100, 101)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_k_hop(spark, chain_edges):
    from sgp_sketch.graph import k_hop

    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r["id"]: r["hops"] for r in
           k_hop(chain_edges, seeds, k=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_finds_path(spark, chain_edges):
    from sgp_sketch.graph import bidirectional_bfs

    out = bidirectional_bfs(chain_edges, 0, 4, max_depth=4)
    assert out["found"] and out["depth"] <= 4


def test_bfs_depth_limit(spark, chain_edges):
    from sgp_sketch.graph import bidirectional_bfs

    out = bidirectional_bfs(chain_edges, 0, 4, max_depth=3)
    assert not out["found"]


def test_bfs_disconnected(spark, chain_edges):
    from sgp_sketch.graph import bidirectional_bfs

    out = bidirectional_bfs(chain_edges, 0, 101, max_depth=6)
    assert not out["found"]


def test_bfs_trivial_and_direct(spark, chain_edges):
    from sgp_sketch.graph import bidirectional_bfs

    assert bidirectional_bfs(chain_edges, 2, 2)["depth"] == 0
    out = bidirectional_bfs(chain_edges, 1, 2, max_depth=2)
    assert out["found"] and out["depth"] == 1


def test_bfs_on_bipartite_real_data(spark):
    """supplier↔part co-occurrence graph from lineitem: two suppliers of
    the same part are 2 apart."""
    from pyspark.sql import functions as F

    from sgp_sketch.graph import bidirectional_bfs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = (li.select((F.col("l_suppkey") + 1_000_000).alias("src"),
                       F.col("l_partkey").alias("dst"))
             .unionByName(
                 li.select(F.col("l_partkey").alias("src"),
                           (F.col("l_suppkey") + 1_000_000).alias("dst")))
             .distinct())
    pair = (li.alias("a").join(li.alias("b"), "l_partkey")
            .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
            .select("a.l_suppkey", "b.l_suppkey").first())
    s, t = pair[0] + 1_000_000, pair[1] + 1_000_000
    out = bidirectional_bfs(edges, s, t, max_depth=2)
    assert out["found"] and out["depth"] == 2


def test_pagerank_two_cycle(spark):
    """2-cycle: symmetric ranks 0.5/0.5."""
    from sgp_sketch.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    assert abs(got[0] - 0.5) < 1e-9 and abs(got[1] - 0.5) < 1e-9


def test_pagerank_star_and_mass(spark):
    """Star 1,2,3 → 0: center outranks leaves; total mass = 1."""
    from sgp_sketch.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(edges, iters=20).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got[0] > got[1] == got[2] == got[3]


def test_connected_components(spark):
    from sgp_sketch.graph import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (7, 7)], "src long, dst long")
    got = {r["id"]: r["component"] for r in
           connected_components(edges).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == 5
    assert got[7] == 7


def test_sssp_chain_and_shortcut(spark):
    """0→1→2→3 (unit) plus a 0→3 shortcut of weight 5: chain wins."""
    from sgp_sketch.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 5.0)],
        "src long, dst long, w double")
    got = {r["id"]: r["dist"] for r in
           sssp(edges, 0, weight="w").collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_k_hop_step_metrics(spark, chain_edges):
    """G3 traversal profiling: observe()-measured frontier sizes per hop
    match the exact expansion counts, and each step carries a wall-clock
    duration (the reference's profile() emits duration AND elementCount
    per step)."""
    from sgp_sketch.graph import k_hop

    seeds = spark.createDataFrame([(0,)], ["id"])
    metrics = []
    got = {r["id"]: r["hops"] for r in
           k_hop(chain_edges, seeds, k=3, step_metrics=metrics).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert [{k: m[k] for k in ("depth", "frontier")} for m in metrics] == [
        {"depth": 1, "frontier": 1},
        {"depth": 2, "frontier": 1},
        {"depth": 3, "frontier": 1}]
    for m in metrics:
        assert set(m) == {"depth", "frontier", "ms"}
        assert m["ms"] > 0


def test_bfs_reports_frontier_sizes(spark, chain_edges):
    from sgp_sketch.graph import bidirectional_bfs

    out = bidirectional_bfs(chain_edges, 0, 4, max_depth=4)
    assert out["found"]
    assert len(out["frontier_sizes"]) == out["expansions"]
    assert all(n >= 1 for n in out["frontier_sizes"])
    assert len(out["step_metrics"]) == out["expansions"]
    for m in out["step_metrics"]:
        assert set(m) == {"depth", "frontier", "ms"}
        assert m["ms"] > 0
    assert [m["frontier"] for m in out["step_metrics"]] \
        == out["frontier_sizes"]


def test_triangle_count_k4(spark):
    from sgp_sketch.graph import triangle_count

    # complete graph on 4 vertices: C(4,3) = 4 triangles, 6 edges
    rows = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(rows, "src long, dst long")
    m = triangle_count(edges)
    assert m == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}


def test_triangle_count_canonicalizes(spark):
    from sgp_sketch.graph import triangle_count

    # duplicates, reversed duplicates, and a self-loop must not change
    # the canonical edge set: one triangle {1,2,3}
    rows = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 2), (1, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    m = triangle_count(edges)
    assert m == {"n_nodes": 3, "n_edges": 3, "n_triangles": 1}


def test_triangle_count_star_is_triangle_free(spark):
    from sgp_sketch.graph import triangle_count

    # a star has wedges at the hub but no closing edges — the
    # degree-orientation must not overcount wedges as triangles
    rows = [(0, i) for i in range(1, 8)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    m = triangle_count(edges)
    assert m == {"n_nodes": 8, "n_edges": 7, "n_triangles": 0}


def test_partition_quality_known_graph(spark):
    """Two triangles joined by one bridge, parts = the two triangles:
    m=7, cut=1, Q = 2*(3/7 - (7/14)^2) = 2*(3/7 - 1/4)."""
    from sgp_sketch.graph import partition_quality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
         (2, 1)],  # reverse duplicate must not double-count
        "src long, dst long")
    assign = spark.createDataFrame(
        [(n, n // 4) for n in range(1, 7)], "id long, part long")
    r = partition_quality(edges, assign).collect()[0]
    assert (r.n_edges, r.n_cut, r.n_unassigned) == (7, 1, 0)
    assert abs(r.cut_ratio - 1 / 7) < 1e-12
    assert abs(r.modularity - 2 * (3 / 7 - 0.25)) < 1e-12
    # partial assignment: node 6 unassigned -> its 2 edges counted in
    # n_unassigned, metrics scored over the remaining 5 edges
    partial = assign.filter("id <> 6")
    r = partition_quality(edges, partial).collect()[0]
    assert (r.n_edges, r.n_unassigned) == (5, 2)

def test_degree_profile_known_graph(spark):
    import math

    from sgp_sketch.graph import degree_profile

    # out-degrees: v1->3 edges, v2->3, v3->1 : hist {3: 2, 1: 1};
    # true vertex set = {1,2,3} ∪ {10,11,12,13} = 7 (sinks count)
    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 13),
             (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_profile(df).collect()[0]
    assert r.n_vertices == 7 and r.n_edges == 7 and r.max_degree == 3
    assert abs(r.avg_degree - 1.0) <= 1e-6
    # slope of {(ln1, ln1), (ln3, ln2)} = (ln2-ln1)/(ln3-ln1)... exact:
    want = (math.log(2) - math.log(1)) / (math.log(3) - math.log(1))
    assert abs(r.loglog_slope - round(want, 6)) <= 1e-6


def test_partition_quality_all_unassigned_keeps_one_row(spark):
    """No edge with both endpoints assigned must still produce the
    documented one-row shape with n_unassigned visible."""
    from sgp_sketch.graph import partition_quality

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    assign = spark.createDataFrame([(99, 0)], "id long, part int")
    rows = partition_quality(edges, assign).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_unassigned"] == 1
    assert r["n_edges"] == 0 and r["n_cut"] == 0


def test_degree_profile_counts_sink_vertices(spark):
    """n_vertices is the TRUE vertex count (sources ∪ sinks), not just
    vertices with out-degree >= 1."""
    from sgp_sketch.graph import degree_profile

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long")
    r = degree_profile(edges).first()
    assert r["n_vertices"] == 3
    assert r["n_edges"] == 3
    assert r["max_degree"] == 2
    assert abs(r["avg_degree"] - 1.0) < 1e-9


# ------------------------------------------- large-star/small-star WCC

def _labels(df):
    """(id, component) rows as a dict, ASSERTING one row per vertex — a
    plain dict comprehension would silently keep the last of duplicate
    ids, masking exactly the malformed output a wrong convergence check
    produces (one vertex labeled into two components)."""
    rows = [(r["id"], r["component"]) for r in df.collect()]
    ids = [i for i, _ in rows]
    assert len(ids) == len(set(ids)), sorted(rows)
    return dict(rows)


def test_bigstar_parity_on_fixtures(spark):
    """bigstar CC must produce the identical (id -> min reachable) map as
    min-label propagation on chains, stars, cliques, and self-loops."""
    from sgp_sketch.graph import (connected_components,
                                  connected_components_bigstar)

    fixtures = [
        [(0, 1), (1, 2), (2, 3), (3, 4), (100, 101)],        # chains
        [(5, 1), (5, 2), (5, 3), (5, 4)],                    # star, hub=max
        [(1, 2), (1, 3), (2, 3), (7, 8), (8, 9), (9, 7)],    # cliques
        [(4, 4), (4, 5)],                                    # self-loop
        [(2, 1)],                                            # reversed pair
        # REGRESSION (code review, round 4): after one large∘small round
        # this reaches {(3,1),(5,1),(3,2),(6,2)} — a large-star FIXED
        # POINT that is not a star forest (node 3 carries two labels); a
        # phase-output-comparison convergence check stops here and splits
        # the single component in two. The structural star-forest check
        # keeps iterating.
        [(1, 5), (3, 5), (3, 6), (2, 6)],
    ]
    for rows in fixtures:
        e = spark.createDataFrame(rows, "src long, dst long")
        assert _labels(connected_components_bigstar(e)) == \
            _labels(connected_components(e)), rows


def test_bigstar_parity_random_graph(spark):
    import numpy as np

    from sgp_sketch.graph import (connected_components,
                                  connected_components_bigstar)

    rng = np.random.default_rng(11)
    rows = [(int(a), int(b)) for a, b in
            rng.integers(0, 400, size=(600, 2)) if a != b]
    e = spark.createDataFrame(rows, "src long, dst long")
    assert _labels(connected_components_bigstar(e)) == \
        _labels(connected_components(e))


def test_bigstar_round_count_is_logarithmic_on_chain(spark):
    """The 100-TB argument: a 200-link chain converges in O(log n) rounds
    (min-label propagation needs ~199 — one round per diameter hop)."""
    from sgp_sketch.graph import connected_components_bigstar

    rows = [(i, i + 1) for i in range(200)]
    e = spark.createDataFrame(rows, "src long, dst long")
    metrics = []
    out = connected_components_bigstar(e, round_metrics=metrics)
    labels = _labels(out)
    assert labels == {i: 0 for i in range(201)}
    assert len(metrics) <= 8, [m["round"] for m in metrics]
    # final state is the star forest: one edge per non-root vertex
    assert metrics[-1]["edges"] == 200
