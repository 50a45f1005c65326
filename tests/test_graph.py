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
