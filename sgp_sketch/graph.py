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


def k_hop(edges, seeds, k: int = 2, src: str = "src", dst: str = "dst",
          step_metrics: list | None = None):
    """G1/G2 generalization: the set of vertices reachable in exactly ≤ k
    hops from `seeds` (DataFrame with column `id`). Returns
    DataFrame(id, hops int) — first hop count at which each vertex was
    reached.

    `step_metrics` (optional, pass a list) turns on per-expansion traversal
    profiling via `df.observe`: one {"depth": d, "frontier": n, "ms": t}
    dict is appended per hop — frontier size AND wall-clock per expansion,
    the declarative analog of the reference's per-step timing loop, which
    records duration and elementCount per profile step
    (PartitioningTwoHopTest.groovy:162-169). Each frontier is
    cached for its observed count and reused by the next expansion; the
    final result is materialized (localCheckpoint) before the caches are
    released, so nothing is computed twice and nothing stays pinned."""
    import time

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    frontier = seeds.select(F.col("id")).distinct()
    reached = frontier.withColumn("hops", F.lit(0))
    # edges are consumed once per hop: persist the projection so an
    # expensive input lineage never re-executes per expansion
    ed = edges.select(src, dst).persist()
    cached = [ed]
    try:
        for depth in range(1, k + 1):
            t0 = time.monotonic()
            nxt = (ed.join(frontier.withColumnRenamed("id", src), src)
                   .select(F.col(dst).alias("id")).distinct()
                   .join(reached.select("id"), "id", "left_anti"))
            if step_metrics is not None:
                nxt = nxt.cache()
                cached.append(nxt)
                obs = Observation(f"k_hop_step_{depth}")
                nxt.observe(obs,
                            F.count(F.lit(1)).alias("frontier")).count()
                n_new = int(obs.get["frontier"])
                step_metrics.append({
                    "depth": depth, "frontier": n_new,
                    "ms": round((time.monotonic() - t0) * 1000.0, 3)})
                if n_new == 0:
                    break
            elif nxt.isEmpty():
                break
            reached = reached.unionByName(
                nxt.withColumn("hops", F.lit(depth)))
            frontier = nxt
        if cached:
            reached = reached.localCheckpoint(eager=True)
        return reached
    finally:
        for c in cached:
            c.unpersist()


def pagerank(edges, iters: int = 20, damping: float = 0.85,
             src: str = "src", dst: str = "dst"):
    """G7 PageRank (the reference runs it inside PowerLyra binaries for 20
    iterations, `/root/reference/containers/analytics/parameters/twitter.json:32-35`)
    as iterative DataFrame joins: contributions = rank/outdeg shuffled to
    dst, damping + dangling mass redistributed uniformly.

    → DataFrame(id, rank double); ranks sum to 1.

    Scale notes: each iteration is one shuffle on the join key; ranks and
    degrees are checkpoint-cached every few iterations to cut the lineage
    (otherwise 20 chained plans blow up the optimizer).
    """
    from pyspark.sql import functions as F

    # edges feed every iteration's contribution join: pin the projection
    # so an expensive input lineage executes once, not `iters` times
    ed = edges.select(src, dst).persist()
    verts = (ed.select(F.col(src).alias("id"))
             .unionByName(ed.select(F.col(dst).alias("id")))
             .distinct().cache())
    deg = ed.groupBy(src).agg(F.count("*").alias("deg")).cache()
    try:
        n = verts.count()
        has_dangling = verts.join(deg.withColumnRenamed(src, "id"), "id",
                                  "left_anti").limit(1).count() > 0
        ranks = verts.withColumn("rank", F.lit(1.0 / n))
        for i in range(iters):
            contribs = (ed.join(deg, src)
                        .join(ranks.withColumnRenamed("id", src), src)
                        .select(F.col(dst).alias("id"),
                                (F.col("rank") / F.col("deg")).alias("c")))
            summed = contribs.groupBy("id").agg(F.sum("c").alias("s"))
            if has_dangling:
                # dangling vertices leak mass; redistribute uniformly (one
                # driver-side scalar per iteration — skipped entirely for
                # graphs with full out-degree, e.g. any undirected graph)
                linked_mass = (ranks.join(deg.withColumnRenamed(src, "id"),
                                          "id", "left_semi")
                               .agg(F.sum("rank")).collect()[0][0] or 0.0)
                dangling = 1.0 - linked_mass
            else:
                dangling = 0.0
            base = (1.0 - damping) / n + damping * dangling / n
            ranks = (verts.join(summed, "id", "left")
                     .select("id", (F.lit(base) + F.lit(damping)
                                    * F.coalesce(F.col("s"), F.lit(0.0)))
                             .alias("rank")))
            if (i + 1) % 5 == 0:
                ranks = ranks.localCheckpoint(eager=True)  # cut lineage
        # the final ranks are localCheckpoint/lineage-backed, so the
        # cached inputs can be released (every sibling iterative function
        # here unpersists in try/finally)
        if (iters % 5) != 0 or iters == 0:
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        verts.unpersist()
        deg.unpersist()
        ed.unpersist()


def connected_components(edges, max_iters: int = 50,
                         src: str = "src", dst: str = "dst"):
    """G7 WCC via iterative min-label propagation to a fixpoint.

    → DataFrame(id, component) where component = min vertex id reachable.
    Each iteration: every vertex takes min(own, neighbors') label — one
    shuffle; converges in O(diameter) rounds; an accumulator-free
    convergence check counts changed labels per round.
    """
    from pyspark.sql import functions as F

    und = (edges.select(src, dst)
           .unionByName(edges.select(F.col(dst).alias(src),
                                     F.col(src).alias(dst)))).distinct()
    # the edge set is consumed EVERY iteration: persist it once, or an
    # expensive input lineage (e.g. the minhash+verify pipeline feeding
    # near_dup_clusters) re-executes O(diameter) times — measured 1.8-4×
    # on dup_clusters at sf0.1 before this pin
    und = und.persist()
    try:
        labels = (und.select(F.col(src).alias("id")).distinct()
                  .withColumn("component", F.col("id")))
        for i in range(max_iters):
            nbr_min = (und.join(labels.withColumnRenamed("id", src), src)
                       .groupBy(F.col(dst).alias("id"))
                       .agg(F.min("component").alias("nbr_c")))
            new_labels = (labels.join(nbr_min, "id", "left")
                          .select("id", F.least(
                              "component",
                              F.coalesce("nbr_c", F.col("component")))
                              .alias("component"))
                          .localCheckpoint(eager=True))
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.component") != F.col("o.component"))
                       .limit(1).count())
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        und.unpersist()


def connected_components_bigstar(edges, max_rounds: int = 50,
                                 src: str = "src", dst: str = "dst",
                                 round_metrics: list | None = None):
    """G7 WCC via alternating large-star / small-star (Kiveris, Lattanzi,
    Mirrokni, Rastogi & Vassilvitskii, "Connected Components in MapReduce
    and Beyond", SoCC'14) — the O(log n)-round counterpart of
    `connected_components`' min-label propagation, whose round count is
    the graph DIAMETER. On chain-shaped components (near-dup graphs built
    at a loose threshold chain A~B~C~… routinely) diameter propagation is
    the 100-TB scale killer: a 1,000-link chain costs 1,000 shuffle
    rounds; this algorithm collapses it in ~log rounds (the parity test
    measures ≤8 rounds on a 200-link chain vs 199 for label propagation).

    One round = large-star ∘ small-star, each a groupBy-min + equi-join —
    per-round cost matches one label-propagation step, only the ROUND
    COUNT changes. Fixed point: every component is a star rooted at its
    minimum vertex id, so the output labels equal min-label CC exactly
    (parity-tested on chains, stars, cliques and random graphs).

      large-star: every node links its LARGER neighbors to
                  m = min(N(u) ∪ {u}) — emitted edges all point
                  larger → smaller, halving long paths;
      small-star: every node links its smaller-or-equal neighbors and
                  itself to the minimum of that set — consolidating
                  partial stars.

    → DataFrame(id, component), component = min vertex id reachable.
    Self-loops are dropped; isolated vertices (no edges) do not appear —
    same contract as `connected_components`.

    `round_metrics` (optional, pass a list) appends one
    {"round": r, "edges": n, "ms": t} dict per completed round — the same
    per-step profiling convention as k_hop's step_metrics; the parity
    test uses it to assert the logarithmic round count on chains.
    """
    import time

    from pyspark.sql import functions as F

    def large_star(sym):
        # m(u) = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
        # Output edges all satisfy src > dst.
        mins = (sym.groupBy(src)
                .agg(F.min(dst).alias("_mn"))
                .select(src, F.least("_mn", F.col(src)).alias("_m")))
        return (sym.join(mins, src)
                .where(F.col(dst) > F.col(src))
                .select(F.col(dst).alias(src), F.col("_m").alias(dst))
                .distinct())

    def small_star(directed):
        # input edges all src > dst; m(u) = min over its smaller
        # neighbors; emit (v, m) for each smaller neighbor v ≠ m, plus
        # (u, m). Output edges again all src > dst.
        mins = directed.groupBy(src).agg(F.min(dst).alias("_m"))
        rewired = (directed.join(mins, src)
                   .where(F.col(dst) != F.col("_m"))
                   .select(F.col(dst).alias(src), F.col("_m").alias(dst)))
        anchor = mins.select(src, F.col("_m").alias(dst))
        return rewired.unionByName(anchor).distinct()

    base = (edges.select(src, dst)
            .where(F.col(src) != F.col(dst)))
    sym = (base.unionByName(base.select(F.col(dst).alias(src),
                                        F.col(src).alias(dst)))
           .distinct())
    cur = large_star(sym).localCheckpoint(eager=True)
    for r in range(max_rounds):
        t0 = time.monotonic()
        cur = small_star(cur)
        # next large-star needs the symmetric view of the current set
        sym = cur.unionByName(cur.select(F.col(dst).alias(src),
                                         F.col(src).alias(dst)))
        nxt = large_star(sym).localCheckpoint(eager=True)
        # Convergence = the edge set IS a star forest: every src appears
        # exactly once (one parent pointer per non-root) and no src is
        # also a dst (parents are roots). This is a STRUCTURAL property
        # of the output — comparing consecutive phase outputs is NOT
        # sound: a large-star fixed point need not be a small-star fixed
        # point (e.g. edges {(3,1),(5,1),(3,2),(6,2)} reproduce under
        # large-star while node 3 still carries two conflicting labels;
        # only the next small-star merges them — regression-tested in
        # tests/test_graph.py). Both conditions fold into one job.
        dup_src = (nxt.groupBy(src).agg(F.count(F.lit(1)).alias("_c"))
                   .where(F.col("_c") > 1).select(src))
        src_is_dst = (nxt.select(src)
                      .join(nxt.select(F.col(dst).alias(src)), src,
                            "left_semi"))
        not_star = dup_src.unionByName(src_is_dst).limit(1).count()
        cur = nxt
        if round_metrics is not None:
            round_metrics.append({
                "round": r, "edges": cur.count(),
                "ms": round((time.monotonic() - t0) * 1000.0, 1)})
        if not_star == 0:
            break
    labels = cur.select(F.col(src).alias("id"),
                        F.col(dst).alias("component"))
    roots = labels.select(F.col("component").alias("id"),
                          F.col("component")).distinct()
    return labels.unionByName(roots).distinct()


def sssp(edges, source, max_iters: int = 20, weight: str | None = None,
         src: str = "src", dst: str = "dst"):
    """G7 single-source shortest paths (Bellman-Ford over DataFrames,
    PowerLyra's sssp analog with its fixed source,
    `twitter.json:36-39`). Unweighted edges cost 1 unless `weight` names a
    column.

    → DataFrame(id, dist double) for reached vertices only.
    """
    from pyspark.sql import functions as F

    w = F.col(weight) if weight else F.lit(1.0)
    # relaxation touches the edge set every round: pin the projection
    ed = edges.select(src, dst, *([weight] if weight else [])).persist()
    dist = edges.sparkSession.createDataFrame(
        [(source, 0.0)], ["id", "dist"])
    try:
        for _ in range(max_iters):
            cand = (ed.join(dist.withColumnRenamed("id", src), src)
                    .select(F.col(dst).alias("id"),
                            (F.col("dist") + w).alias("d")))
            new_dist = (dist.unionByName(cand.withColumnRenamed("d", "dist"))
                        .groupBy("id").agg(F.min("dist").alias("dist"))
                        .localCheckpoint(eager=True))
            improved = (new_dist.alias("n")
                        .join(dist.alias("o"), "id", "left")
                        .filter(F.col("o.dist").isNull()
                                | (F.col("n.dist") < F.col("o.dist")))
                        .limit(1).count())
            dist = new_dist
            if improved == 0:
                break
        return dist
    finally:
        ed.unpersist()


def bidirectional_bfs(edges, source, target, max_depth: int = 6,
                      src: str = "src", dst: str = "dst",
                      max_frontier: int | None = None) -> dict:
    """G5: does a path of length ≤ max_depth exist between source and
    target? Alternating frontier expansion from both ends, meeting via a
    `left_semi` join — the declarative version of the reference's linear
    `targetNext.contains(id)` scan (shortestPathTest.groovy:198-206).

    Returns {"found": bool, "depth": int | None, "expansions": int,
    "truncated": bool, "frontier_sizes": list[int], "step_metrics":
    list[dict]} — frontier sizes are measured per expansion via
    `df.observe`, and each step_metrics entry carries {"depth",
    "frontier", "ms"}: size AND wall-clock per expansion (G3 traversal
    profiling — the reference's profile() emits duration and elementCount
    per step, PartitioningTwoHopTest.groovy:162-169; the observed count
    also materializes the frontier cache, replacing the lazy isEmpty
    probe).

    Every cached frontier is unpersisted on exit (try/finally), so repeated
    probes — e.g. a reachability loop over many (source, target) pairs —
    don't accumulate executor storage.
    """
    import time

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    fwd = spark.createDataFrame([(source,)], ["id"])
    bwd = spark.createDataFrame([(target,)], ["id"])
    fwd_seen, bwd_seen = fwd, bwd
    # both directions re-read the edge set per expansion: pin it once
    edges = edges.select(src, dst).persist()
    rev = edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    depth, expansions, truncated = 0, 0, False
    sizes: list[int] = []
    steps: list[dict] = []
    if source == target:
        edges.unpersist()
        return {"found": True, "depth": 0, "expansions": 0,
                "truncated": False, "frontier_sizes": sizes,
                "step_metrics": steps}
    cached = [edges]

    def result(found, d):
        return {"found": found, "depth": d, "expansions": expansions,
                "truncated": truncated, "frontier_sizes": sizes,
                "step_metrics": steps}

    try:
        while depth < max_depth:
            t0 = time.monotonic()
            # expand the (heuristically) cheaper side: alternate
            if depth % 2 == 0:
                nxt = (edges.join(fwd.withColumnRenamed("id", src), src)
                       .select(F.col(dst).alias("id")).distinct()
                       .join(fwd_seen, "id", "left_anti"))
            else:
                nxt = (rev.join(bwd.withColumnRenamed("id", src), src)
                       .select(F.col(dst).alias("id")).distinct()
                       .join(bwd_seen, "id", "left_anti"))
            if max_frontier is not None:
                if nxt.limit(max_frontier + 1).count() > max_frontier:
                    truncated = True
                    nxt = nxt.limit(max_frontier)
            nxt = nxt.cache()
            cached.append(nxt)
            if depth % 2 == 0:
                fwd, fwd_seen = nxt, fwd_seen.unionByName(nxt)
            else:
                bwd, bwd_seen = nxt, bwd_seen.unionByName(nxt)
            depth += 1
            expansions += 1
            obs = Observation(f"bfs_step_{depth}")
            nxt.observe(obs, F.count(F.lit(1)).alias("frontier")).count()
            n_new = int(obs.get["frontier"])
            sizes.append(n_new)
            steps.append({"depth": depth, "frontier": n_new,
                          "ms": round((time.monotonic() - t0) * 1000.0, 3)})
            if n_new == 0:
                return result(False, None)
            # frontier meet: any vertex reached from both ends?
            if not fwd_seen.join(bwd_seen, "id", "left_semi").isEmpty():
                return result(True, depth)
        return result(False, None)
    finally:
        for c in cached:
            c.unpersist()


def triangle_count(edges, src: str = "src", dst: str = "dst") -> dict:
    """G7-adjacent exact triangle counting over an undirected edge list —
    the classic partition-quality probe for the reference's workload class
    (clustering-coefficient-style analytics over the partitioned graph).

    Scale design: the naive triangle join explodes on high-degree hubs
    (a degree-d vertex contributes C(d,2) wedges). The standard fix —
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11 — orients every edge from the lower-(degree, id)
    endpoint to the higher one. The orientation is a DAG under a total
    order, every triangle {x<y<z} survives exactly once as the wedge
    x→y, x→z closed by y→z, and the out-degree of ANY vertex (hubs
    included) is O(sqrt(m)), so the wedge join is bounded even on
    power-law graphs. All three joins are shuffle equi-joins on vertex
    keys — no cross join, no driver-side adjacency.

    Eagerly computes and returns {"n_nodes", "n_edges", "n_triangles"};
    the canonical edge set and the oriented DAG are cached for the three
    passes and unpersisted before returning.
    """
    from pyspark.sql import functions as F

    e = (edges
         .select(F.least(F.col(src), F.col(dst)).alias("a"),
                 F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull())
         .distinct()
         .persist())
    oriented = None
    try:
        deg = (e.select(F.col("a").alias("id"))
               .unionAll(e.select(F.col("b").alias("id")))
               .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
        with_deg = (e
                    .join(deg.select(F.col("id").alias("a"),
                                     F.col("deg").alias("da")), "a")
                    .join(deg.select(F.col("id").alias("b"),
                                     F.col("deg").alias("db")), "b"))
        a_first = ((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))))
        oriented = (with_deg
                    .select(F.when(a_first, F.col("a"))
                            .otherwise(F.col("b")).alias("u"),
                            F.when(a_first, F.col("b"))
                            .otherwise(F.col("a")).alias("v"))
                    .persist())
        wedges = (oriented.select(F.col("u"), F.col("v").alias("m"))
                  .join(oriented.select(F.col("u").alias("m"),
                                        F.col("v").alias("w")), "m"))
        n_triangles = (wedges
                       .join(oriented.select(F.col("u"),
                                             F.col("v").alias("w")),
                             ["u", "w"], "left_semi")
                       .count())
        return {"n_nodes": deg.count(), "n_edges": e.count(),
                "n_triangles": int(n_triangles)}
    finally:
        e.unpersist()
        if oriented is not None:
            oriented.unpersist()


def partition_quality(edges, assign, src: str = "src", dst: str = "dst",
                      node_col: str = "id", part_col: str = "part"):
    """Quality metrics of a node→partition assignment over an undirected
    graph — the evaluation the reference runs on its edge-cut
    partitioners (LDG/Fennel vs hash: the per-vertex edge-cut
    accumulation at EdgeCutSGP.java:124-128/162-166/200-204, reported
    at :257, recast as one declarative aggregate): edge-cut count and
    ratio, plus Newman modularity Q = Σ_c (e_c/m − (d_c/2m)²), where
    e_c is the intra-partition edge count and d_c the degree mass of
    partition c.

    Shape: canonical edge set (least/greatest + distinct, self-loops
    dropped, as in triangle_count) → one shuffle equi-join per endpoint
    against the assignment (|V|-sized, so NOT broadcast) → endpoints
    stacked so each edge contributes its two degree increments → ONE
    per-partition aggregate; the scalar totals ride back in as
    broadcast one-row crossJoins, never a driver collect.

    Edges with an endpoint MISSING from `assign` are excluded from the
    metrics but counted in `n_unassigned` — a partial assignment must
    show up as a nonzero count, not silently score a smaller graph.

    → one-row DataFrame(n_edges, n_cut, cut_ratio, modularity,
    n_unassigned).
    """
    from pyspark.sql import functions as F

    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull())
         .distinct())
    pa = assign.select(F.col(node_col).alias("a"),
                       F.col(part_col).alias("pa"))
    pb = assign.select(F.col(node_col).alias("b"),
                       F.col(part_col).alias("pb"))
    lj = e.join(pa, "a", "left").join(pb, "b", "left")
    miss = lj.agg(F.coalesce(F.sum((F.col("pa").isNull()
                                    | F.col("pb").isNull()).cast("long")),
                             F.lit(0)).alias("n_unassigned"))
    j = lj.filter(F.col("pa").isNotNull() & F.col("pb").isNotNull())
    intra = (F.col("pa") == F.col("pb")).cast("long")
    stack = (j.select(F.col("pa").alias("c"), intra.alias("intra"))
             .unionByName(j.select(F.col("pb").alias("c"),
                                   intra.alias("intra"))))
    # every intra edge appears twice with the same c → sum/2 is exact
    per_c = stack.groupBy("c").agg(
        F.count(F.lit(1)).alias("d_c"),
        (F.sum("intra") / 2).alias("e_c"))
    tot = per_c.agg((F.sum("d_c") / 2).alias("m"))
    q = F.sum(F.col("e_c") / F.col("m")
              - (F.col("d_c") / (2 * F.col("m"))) ** 2)
    # global agg (no groupBy) so the contract one-row shape survives an
    # EMPTY per_c (no edge with both endpoints assigned): metrics come
    # back NULL but n_unassigned still reports — a groupBy("m") over
    # zero rows would silently return a zero-row frame instead
    return (per_c.crossJoin(F.broadcast(tot))
            .agg(F.max("m").alias("m"),
                 F.sum("e_c").alias("_intra"), q.alias("modularity"))
            .crossJoin(F.broadcast(miss))
            .select(F.coalesce(F.col("m").cast("long"), F.lit(0))
                    .alias("n_edges"),
                    F.coalesce((F.col("m") - F.col("_intra")).cast("long"),
                               F.lit(0)).alias("n_cut"),
                    ((F.col("m") - F.col("_intra")) / F.col("m"))
                    .alias("cut_ratio"),
                    "modularity", "n_unassigned"))

def degree_profile(edges, src: str = "src", dst: str = "dst"):
    """One-row out-degree characterization of an edge set — the dataset
    table every partitioning evaluation leads with (the reference pins
    n, m, and max degree for each benchmark graph:
    /root/reference/src/main/resources/twitter.properties:5-8,
    README.md:42-44) plus a log-log OLS slope of the degree histogram,
    the standard heavy-tail/power-law indicator that predicts which
    partitioner family wins (HDRF-style replication pays off only on
    heavy-tailed graphs).

    Shape: one degree aggregation keyed by vertex, one histogram
    aggregation keyed by degree (output ≤ max_degree rows), then a
    single-row fold with `regr_slope` over the log-log histogram; the
    TRUE vertex count (sources ∪ sinks — a directed graph's sink
    vertices have out-degree 0 and never appear in the out-degree
    histogram) rides in as a broadcast one-row crossJoin.
    Nothing bigger than the degree histogram ever sits in one task.

    → one row: (n_vertices, n_edges, max_degree, avg_degree,
    loglog_slope) — avg_degree = m / n over the true n; the log-log
    slope is over the out-degree ≥ 1 histogram (log 0 is undefined);
    doubles rounded to 6 decimals.
    """
    from pyspark.sql import functions as F

    nv = (edges.select(F.col(src).alias("_v"))
          .unionByName(edges.select(F.col(dst).alias("_v")))
          .agg(F.count_distinct("_v").alias("n_vertices")))
    deg = (edges.groupBy(F.col(src).alias("_v"))
           .agg(F.count(F.lit(1)).alias("_d")))
    hist = deg.groupBy("_d").agg(F.count(F.lit(1)).alias("_n"))
    return (hist
            .agg(F.sum(F.col("_d") * F.col("_n")).alias("n_edges"),
                 F.max("_d").alias("max_degree"),
                 F.round(F.regr_slope(F.log("_n"), F.log("_d")), 6)
                  .alias("loglog_slope"))
            .crossJoin(F.broadcast(nv))
            .select("n_vertices", "n_edges", "max_degree",
                    F.round(F.col("n_edges")
                            / F.col("n_vertices").cast("double"), 6)
                    .alias("avg_degree"),
                    "loglog_slope"))
