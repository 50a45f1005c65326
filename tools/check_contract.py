"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_contract.py [--json out.json] [sf_dir] [query ...]

--json writes a CORRECTNESS_r*.json-shaped record per query, so ci.sh can
commit an in-repo adjudication log covering the FULL registered surface
even when the driver's own check list is a frozen subset.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + row sort only — NO value coercion beyond
    object→str. The driver's gate hashes raw values dtype-sensitively;
    rounding or dtype-laundering here (the pre-r5 behavior) hid exactly
    the failures the driver then caught (VERDICT r4: merge_upsert float
    sum order, vocab_build HUGEINT→float64)."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif df[c].dtype.kind == "f":
            # the driver coerces float width then rounds (~6dp) before
            # hashing (r4 evidence: float32-vs-float64 cosine pairs
            # hash-matched; 1e-2 sum drift and int-vs-float did not), so
            # float64.round(6) + exact compare is its local stand-in
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-") \
                or os.path.isdir(argv[i + 1]):
            print("usage: check_contract.py [--json OUT.json] [sf_dir] "
                  "[query ...]  (--json needs a file path)",
                  file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict = {}

    import __spark_entry__ as entry
    from sgp_sketch.session import get_spark

    # SGP_CONTRACT_CORES / SGP_CONTRACT_SHUFFLE let ci.sh re-run the gate
    # at several parallelism levels: an order-dependent aggregate gives
    # different float sums at different partitionings, so a pair that is
    # exact at BOTH 3 and 8 cores is evidence of order-independence.
    cores = os.environ.get("SGP_CONTRACT_CORES", "8")
    shuf = int(os.environ.get("SGP_CONTRACT_SHUFFLE", cores))
    spark = get_spark("contract-check", master=f"local[{cores}]",
                      shuffle_partitions=shuf)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    n_checked = 0
    unknown = only - set(qs)
    if unknown:
        # A typo'd name would otherwise silently disable the gate for
        # that query (ci.sh greps exit codes, not coverage).
        print(f"FAIL  unknown query name(s): {sorted(unknown)}",
              file=sys.stderr)
        failures.extend(sorted(unknown))
        n_checked += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(sdf)} cols={list(sdf.columns)} "
                  f"(rows-only, {dt:.1f}s)")
            results[name] = {"status": "no_oracle", "spark_rows": len(sdf),
                             "seconds": round(dt, 1), "err": None}
            if len(sdf) == 0:
                failures.append(name)
                results[name]["err"] = "0 rows"
                print(f"FAIL  {name}: 0 rows")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        rec = {"rows_match": len(a) == len(b),
               "schema_match": list(a.columns) == list(b.columns),
               "hash_match": False, "spark_rows": len(sdf),
               "oracle_rows": len(odf), "seconds": round(dt, 1),
               "err": None}
        results[name] = rec
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if not rec["rows_match"]:
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        kinds_a = [a[c].dtype.kind for c in a.columns]
        kinds_b = [b[c].dtype.kind for c in b.columns]
        if kinds_a != kinds_b:
            failures.append(name)
            rec["err"] = f"dtype kinds differ: {kinds_a} vs {kinds_b}"
            print(f"FAIL  {name}: dtype kinds {kinds_a} vs {kinds_b}")
            print("  spark dtypes:", dict(a.dtypes.astype(str)))
            print("  oracle dtypes:", dict(b.dtypes.astype(str)))
            continue
        try:
            # Driver fidelity: dtype-KIND-aware (int vs float vs str),
            # exact values after normalize()'s float64.round(6). A pair
            # that needs looser tolerance here is one partitioning away
            # from a driver hash flip — fix the pair, not the gate.
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            rec["hash_match"] = True
            print(f"ok    {name}: rows={len(a)} match ({dt:.1f}s)")
        except AssertionError as e:
            failures.append(name)
            rec["err"] = f"value mismatch: {e}"[:300]
            print(f"FAIL  {name}: value mismatch\n{str(e)[:500]}")
            print("  spark dtypes:", dict(a.dtypes.astype(str)))
            print("  oracle dtypes:", dict(b.dtypes.astype(str)))
            print("  spark head:", a.head(3).to_dict("records"))
            print("  oracle head:", b.head(3).to_dict("records"))
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_checked": n_checked,
                       "n_pass": n_checked - len(failures),
                       "failures": sorted(failures),
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{n_checked - len(failures)}/{n_checked} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
