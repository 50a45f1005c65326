"""Graph traversal operators — the reference's query workload re-expressed
as DataFrame joins (SURVEY.md §2.9).

The reference runs 1-hop/2-hop expansions and a bidirectional BFS
shortest-path probe over JanusGraph
(`/root/reference/scripts/interactive/gremlin/PartitioningTwoHopTest.groovy:156-169`,
`shortestPathTest.groovy:169-219`). Here: an `edges(src, dst)` DataFrame,
expansions as self-equi-joins, frontier meet as a `left_semi` join
(U4 intersection analog) with a driver-side loop and early exit — iteration
count is bounded (≤ max_depth), per-iteration work is fully distributed.

Scale notes: frontiers are `distinct()` after every expansion (the BFS
visited-set contraction); each expansion is one shuffle on the join key. For
power-law graphs the frontier can explode — `max_frontier` caps it and
reports truncation instead of hanging, mirroring the driver-side operation
caps of the reference's workload runner (`run-driver.sh:20-29`).
"""

from __future__ import annotations


def k_hop(edges, seeds, k: int = 2, src: str = "src", dst: str = "dst"):
    """G1/G2 generalization: the set of vertices reachable in exactly ≤ k
    hops from `seeds` (DataFrame with column `id`). Returns
    DataFrame(id, hops int) — first hop count at which each vertex was
    reached."""
    from pyspark.sql import functions as F

    frontier = seeds.select(F.col("id")).distinct()
    reached = frontier.withColumn("hops", F.lit(0))
    for depth in range(1, k + 1):
        nxt = (edges.join(frontier.withColumnRenamed("id", src), src)
               .select(F.col(dst).alias("id")).distinct()
               .join(reached.select("id"), "id", "left_anti"))
        if nxt.isEmpty():
            break
        reached = reached.unionByName(
            nxt.withColumn("hops", F.lit(depth)))
        frontier = nxt
    return reached


def bidirectional_bfs(edges, source, target, max_depth: int = 6,
                      src: str = "src", dst: str = "dst",
                      max_frontier: int | None = None) -> dict:
    """G5: does a path of length ≤ max_depth exist between source and
    target? Alternating frontier expansion from both ends, meeting via a
    `left_semi` join — the declarative version of the reference's linear
    `targetNext.contains(id)` scan (shortestPathTest.groovy:198-206).

    Returns {"found": bool, "depth": int | None, "expansions": int,
    "truncated": bool}.
    """
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    fwd = spark.createDataFrame([(source,)], ["id"])
    bwd = spark.createDataFrame([(target,)], ["id"])
    fwd_seen, bwd_seen = fwd, bwd
    rev = edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    depth, expansions, truncated = 0, 0, False
    if source == target:
        return {"found": True, "depth": 0, "expansions": 0,
                "truncated": False}
    while depth < max_depth:
        # expand the (heuristically) cheaper side: alternate
        if depth % 2 == 0:
            nxt = (edges.join(fwd.withColumnRenamed("id", src), src)
                   .select(F.col(dst).alias("id")).distinct()
                   .join(fwd_seen, "id", "left_anti"))
            if max_frontier is not None:
                if nxt.limit(max_frontier + 1).count() > max_frontier:
                    truncated = True
                    nxt = nxt.limit(max_frontier)
            nxt = nxt.cache()
            fwd, fwd_seen = nxt, fwd_seen.unionByName(nxt)
        else:
            nxt = (rev.join(bwd.withColumnRenamed("id", src), src)
                   .select(F.col(dst).alias("id")).distinct()
                   .join(bwd_seen, "id", "left_anti"))
            if max_frontier is not None:
                if nxt.limit(max_frontier + 1).count() > max_frontier:
                    truncated = True
                    nxt = nxt.limit(max_frontier)
            nxt = nxt.cache()
            bwd, bwd_seen = nxt, bwd_seen.unionByName(nxt)
        depth += 1
        expansions += 1
        if nxt.isEmpty():
            return {"found": False, "depth": None, "expansions": expansions,
                    "truncated": truncated}
        # frontier meet: any vertex reached from both ends?
        meet = not fwd_seen.join(bwd_seen, "id", "left_semi").isEmpty()
        if meet:
            return {"found": True, "depth": depth, "expansions": expansions,
                    "truncated": truncated}
    return {"found": False, "depth": None, "expansions": expansions,
            "truncated": truncated}
