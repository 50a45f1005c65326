"""Checkpointed, resumable sketch builds with per-slice lineage (M4).

North-rule requirement: per-partition sketch states are checkpointed with
lineage + metrics so a run can resume mid-scan. The reference's analog is its
progress logging every 1M streamed lines (EdgeCutSGP.java:241-243) and the
experiment driver's skip-completed logic; our unit of resume is an **input
file slice**, because in Spark the atomic durability boundary is the job
commit (output committer), not the task. A build over S slices = S jobs; a
crash between jobs loses at most one slice's work.

Layout under `ckpt_dir/`:
    slices/<slice_id>/           parquet: group_cols…, sketch_type, state,
                                 n_items, part_id  (one blob row per group)
    slices/<slice_id>.lineage.json   {slice_id, files, n_rows, n_items,
                                 state_sha256 per group, seconds, engine conf}
    metrics.jsonl                one line per built slice (appended)

Associativity of the kernels is what makes slice-wise builds equal to a
single-pass build — asserted byte-exactly for HLL/CMS/Bloom in tests.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from . import agg

_LINEAGE_VERSION = 1


def list_input_files(spark, path: str) -> list[str]:
    """Deterministic sorted listing of the parquet data files under `path`.

    Uses the Hadoop FS API via the JVM gateway so it works for any
    configured filesystem (local, HDFS, S3A) — driver-side metadata only.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.isFile(p):
        return [p.toString()]
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next().getPath().toString()
        base = f.rsplit("/", 1)[-1]
        if base.startswith(("_", ".")) or not base.endswith(".parquet"):
            continue
        out.append(f)
    return sorted(out)


def plan_slices(files: list[str], files_per_slice: int = 8) -> list[dict]:
    """Deterministic slice plan; slice_id = sha of its file list, so a plan
    change (different files) never silently reuses a stale checkpoint."""
    slices = []
    for i in range(0, len(files), files_per_slice):
        chunk = files[i:i + files_per_slice]
        sid = hashlib.sha256("\n".join(chunk).encode()).hexdigest()[:16]
        slices.append({"slice_id": sid, "index": i // files_per_slice,
                       "files": chunk})
    return slices


def _slice_dir(ckpt_dir: str, sid: str) -> str:
    return os.path.join(ckpt_dir, "slices", sid)


def _lineage_path(ckpt_dir: str, sid: str) -> str:
    return os.path.join(ckpt_dir, "slices", f"{sid}.lineage.json")


def slice_complete(ckpt_dir: str, sl: dict) -> bool:
    lp = _lineage_path(ckpt_dir, sl["slice_id"])
    if not os.path.exists(lp):
        return False
    try:
        with open(lp) as fh:
            lin = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return False
    return (lin.get("version") == _LINEAGE_VERSION
            and lin.get("files") == sl["files"]
            and os.path.exists(os.path.join(_slice_dir(ckpt_dir, sl["slice_id"]),
                                            "_SUCCESS")))


def build_slice(spark, sl: dict, kind: str, value_col: str, group_cols,
                params: dict | None, ckpt_dir: str, prepare=None,
                base_path: str | None = None) -> dict:
    """Build + persist one slice's per-group blobs; returns its lineage.

    `base_path` (the table root) lets Spark recover hive-partition columns
    (e.g. source=...) when reading individual data files of a partitioned
    table — without it a slice read silently drops those columns."""
    t0 = time.perf_counter()
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(*sl["files"])
    if prepare is not None:
        df = prepare(df)
    blobs = agg.sketch_agg(df, kind, value_col, group_cols, params)
    sdir = _slice_dir(ckpt_dir, sl["slice_id"])
    blobs.write.mode("overwrite").parquet(sdir)
    # lineage from what was actually written (read-back keeps it honest)
    written = spark.read.parquet(sdir).collect()
    groups = []
    for r in written:
        d = r.asDict()
        groups.append({
            "group": {c: d[c] for c in group_cols},
            "n_items": int(d["n_items"]),
            "state_sha256": hashlib.sha256(bytes(d["state"])).hexdigest(),
        })
    lineage = {
        "version": _LINEAGE_VERSION,
        "slice_id": sl["slice_id"],
        "index": sl["index"],
        "files": sl["files"],
        "sketch_type": kind,
        "params": params or {},
        "group_cols": list(group_cols),
        "groups": sorted(groups, key=lambda g: json.dumps(g["group"],
                                                          sort_keys=True)),
        "n_items": sum(g["n_items"] for g in groups),
        "seconds": round(time.perf_counter() - t0, 3),
    }
    with open(_lineage_path(ckpt_dir, sl["slice_id"]), "w") as fh:
        json.dump(lineage, fh, indent=1)
    with open(os.path.join(ckpt_dir, "metrics.jsonl"), "a") as fh:
        fh.write(json.dumps({"slice_id": sl["slice_id"], "kind": kind,
                             "n_items": lineage["n_items"],
                             "seconds": lineage["seconds"],
                             "n_files": len(sl["files"])}) + "\n")
    return lineage


def build_checkpointed(spark, input_path: str, kind: str, value_col: str,
                       group_cols=("source",), params: dict | None = None,
                       ckpt_dir: str = "./ckpt", files_per_slice: int = 8,
                       prepare=None) -> dict:
    """Resumable build: skip slices whose lineage matches, build the rest.

    `prepare` (optional) maps the raw slice DataFrame to the sketch input
    (e.g. documents → tokens). Returns a summary dict; call `finalize` for
    the merged per-group blob DataFrame.
    """
    os.makedirs(os.path.join(ckpt_dir, "slices"), exist_ok=True)
    files = list_input_files(spark, input_path)
    if not files:
        raise FileNotFoundError(f"no parquet data files under {input_path}")
    slices = plan_slices(files, files_per_slice)
    skipped, built = [], []
    for sl in slices:
        if slice_complete(ckpt_dir, sl):
            skipped.append(sl["slice_id"])
            continue
        build_slice(spark, sl, kind, value_col, group_cols, params,
                    ckpt_dir, prepare=prepare, base_path=input_path)
        built.append(sl["slice_id"])
    manifest = {
        "version": _LINEAGE_VERSION,
        "input_path": input_path,
        "kind": kind, "value_col": value_col,
        "group_cols": list(group_cols), "params": params or {},
        "n_slices": len(slices), "built": built, "skipped": skipped,
        "slice_ids": [s["slice_id"] for s in slices],
    }
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def build_slice_multi(spark, sl: dict, specs: dict, group_cols,
                      ckpt_dir: str, prepare=None,
                      base_path: str | None = None) -> dict:
    """One slice, ALL sketches in one scan (multi_sketch_agg): the
    production shape — checkpoint granularity costs one read per slice, not
    one per (slice × sketch)."""
    t0 = time.perf_counter()
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(*sl["files"])
    if prepare is not None:
        df = prepare(df)
    blobs = agg.multi_sketch_agg(df, specs, group_cols)
    sdir = _slice_dir(ckpt_dir, sl["slice_id"])
    blobs.write.mode("overwrite").parquet(sdir)
    written = spark.read.parquet(sdir).collect()
    groups = []
    for r in written:
        d = r.asDict()
        groups.append({
            "group": {c: d[c] for c in group_cols},
            "sketch": d["sketch"],
            "n_items": int(d["n_items"]),
            "state_sha256": hashlib.sha256(bytes(d["state"])).hexdigest(),
        })
    lineage = {
        "version": _LINEAGE_VERSION,
        "slice_id": sl["slice_id"], "index": sl["index"],
        "files": sl["files"],
        "sketch_type": "multi",
        "params": {n: s.get("params") or {} for n, s in specs.items()},
        "group_cols": list(group_cols),
        "groups": sorted(groups, key=lambda g: (
            g["sketch"], json.dumps(g["group"], sort_keys=True))),
        "n_items": sum(g["n_items"] for g in groups),
        "seconds": round(time.perf_counter() - t0, 3),
    }
    with open(_lineage_path(ckpt_dir, sl["slice_id"]), "w") as fh:
        json.dump(lineage, fh, indent=1)
    with open(os.path.join(ckpt_dir, "metrics.jsonl"), "a") as fh:
        fh.write(json.dumps({"slice_id": sl["slice_id"], "kind": "multi",
                             "n_items": lineage["n_items"],
                             "seconds": lineage["seconds"],
                             "n_files": len(sl["files"])}) + "\n")
    return lineage


def build_checkpointed_multi(spark, input_path: str, specs: dict,
                             group_cols=("source",), ckpt_dir: str = "./ckpt",
                             files_per_slice: int = 8, prepare=None) -> dict:
    """Resumable one-scan-per-slice build of the full sketch suite."""
    os.makedirs(os.path.join(ckpt_dir, "slices"), exist_ok=True)
    files = list_input_files(spark, input_path)
    if not files:
        raise FileNotFoundError(f"no parquet data files under {input_path}")
    slices = plan_slices(files, files_per_slice)
    skipped, built = [], []
    for sl in slices:
        if slice_complete(ckpt_dir, sl):
            skipped.append(sl["slice_id"])
            continue
        build_slice_multi(spark, sl, specs, group_cols, ckpt_dir,
                          prepare=prepare, base_path=input_path)
        built.append(sl["slice_id"])
    manifest = {
        "version": _LINEAGE_VERSION,
        "input_path": input_path, "kind": "multi",
        "specs": {n: {"kind": s["kind"], "value_col": s["value_col"],
                      "params": s.get("params") or {}}
                  for n, s in specs.items()},
        "group_cols": list(group_cols),
        "n_slices": len(slices), "built": built, "skipped": skipped,
        "slice_ids": [s["slice_id"] for s in slices],
    }
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def finalize_multi(spark, ckpt_dir: str, group_cols=("source",)):
    """Merged blobs per (group × sketch) from a multi-spec checkpoint."""
    return finalize(spark, ckpt_dir,
                    group_cols=tuple(group_cols) + ("sketch",))


def finalize(spark, ckpt_dir: str, group_cols=("source",)):
    """Merge all slice blobs → one blob row per group (tree of slice states;
    each slice is itself a tree-merged state, so depth stays O(log))."""
    with open(os.path.join(ckpt_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    dirs = [_slice_dir(ckpt_dir, sid) for sid in manifest["slice_ids"]]
    blobs = spark.read.parquet(*dirs)
    return agg.merge_across(blobs, group_cols=tuple(group_cols))
