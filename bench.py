"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the north-rule
two-parallelism scaling probe (same sketch-build job at local[LO] and
local[HI] on identical input; efficiency = (tput_hi/tput_lo)/(hi/lo)).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_tokens_per_sec": ...,
   "scaling": {"lo_cores":..,"hi_cores":..,"tput_lo":..,"tput_hi":..,
               "efficiency":..}}

Everything else goes to stderr. Mirrors the reference's workers-sweep bench
design (/root/reference/containers/analytics/parameters/twitter.json:11-12)
and throughput-at-two-load-levels reporting
(/root/reference/containers/interactive/master/scripts/ldbc_run.py:116).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

# headline set: the five sketch queries (the engine's core) + the widest
# exact-path plans (join chain, self-join 2-hop, window, knn, dedup)
HEADLINE = [
    "hll_distinct_tokens", "cms_heavy_hitters", "kll_ntok_quantiles",
    "tdigest_value_quantiles", "bloom_membership",
    "pricing_summary", "broadcast_join_agg", "two_hop", "window_topk",
    "top_words", "dedup_exact", "knn_bruteforce",
    "minhash_near_dup", "simhash_fingerprint", "router_balance",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_headline(spark, names, qmap):
    times = {}
    for name in names:
        fn = qmap.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        log(f"bench {name}: {n} rows in {dt:.2f}s")
    return times


def sketch_build_job(spark, sf_dir: str) -> int:
    """The scaling probe: per-source HLL + CMS partials + tree merge over the
    token table — the engine's full-scan path. Returns token count."""
    from pyspark.sql import functions as F

    from sgp_sketch import agg
    from sgp_sketch.testdata import doc_tokens

    toks = doc_tokens(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    toks = toks.cache()
    n_tok = toks.agg(F.sum("n_tok")).collect()[0][0]
    t0 = time.perf_counter()
    hll = agg.sketch_agg(toks, "hll", "tokens", ("source",), {"p": 14})
    cms = agg.sketch_agg(toks, "cms", "tokens", ("source",),
                         {"depth": 4, "width": 1 << 14})
    hll.count(); cms.count()
    dt = time.perf_counter() - t0
    toks.unpersist()
    return int(n_tok), dt


def scaling_probe(lo: int, hi: int):
    from sgp_sketch.session import get_spark

    out = {"lo_cores": lo, "hi_cores": hi}
    for label, cores in (("lo", lo), ("hi", hi)):
        spark = get_spark(f"bench-scaling-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
        try:
            # warm the JVM/python-worker pool so we measure compute, not startup
            n_tok, _ = sketch_build_job(spark, SF_DIR)
            n_tok, dt = sketch_build_job(spark, SF_DIR)
            out[f"tput_{label}"] = round(n_tok / dt, 1)
            out[f"sec_{label}"] = round(dt, 3)
            log(f"scaling local[{cores}]: {n_tok} tokens in {dt:.2f}s "
                f"= {n_tok / dt:,.0f} tok/s")
        finally:
            spark.stop()
    out["efficiency"] = round(
        (out["tput_hi"] / out["tput_lo"]) / (hi / lo), 3)
    return out


def main() -> None:
    import __spark_entry__ as entry
    from sgp_sketch.session import get_spark

    qmap = entry.queries()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        times = run_headline(spark, HEADLINE, qmap)
        n_tok, build_dt = sketch_build_job(spark, SF_DIR)
        tput = n_tok / build_dt
        log(f"sketch build: {n_tok} tokens in {build_dt:.2f}s = {tput:,.0f} tok/s")
    finally:
        spark.stop()

    result = {
        "metric": "sketch-build throughput (tokens/sec) + headline query latency",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "throughput_tokens_per_sec": round(tput, 1),
        "n_tokens": n_tok,
        "sketch_build_sec": round(build_dt, 3),
    }
    if SCALING:
        lo = max(2, CPUS // 4)
        result["scaling"] = scaling_probe(lo, CPUS)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
