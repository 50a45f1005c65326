"""Thin table resolution: plain parquet, Iceberg-layout directories, or a
real Iceberg catalog when the runtime is on the classpath.

The north rule targets Iceberg tables of pre-tokenized sequences. The
sandbox ships no iceberg-spark-runtime jar, so (SURVEY.md §7.4.5):

  * production: `spark-submit --packages
    org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>` and pass
    `catalog.table` names here — `load_table` tries
    `spark.read.format("iceberg")` / `spark.table` first;
  * sandbox: parquet directories, including Iceberg-layout dirs
    (`data/` + `metadata/`), resolved by reading `data/` directly. That is
    correct for append-only tables with no delete files — exactly the shape
    of an immutable training-sequence dump — and is clearly a fallback, not
    an Iceberg implementation.

`write_layout` produces the same directory shape plus a minimal snapshot
manifest JSON (file list, row counts, schema) so resumable builds and
audits can diff snapshots without a catalog service.
"""

from __future__ import annotations

import json
import os
import time


def load_table(spark, ref: str):
    """Resolve `ref` to a DataFrame.

    Order: Iceberg/catalog table name (contains no path separator) →
    Iceberg-layout dir → plain parquet dir/file.
    """
    if "/" not in ref and not os.path.exists(ref):
        try:
            return spark.read.format("iceberg").load(ref)
        except Exception:
            return spark.table(ref)
    data_dir = os.path.join(ref, "data")
    meta_dir = os.path.join(ref, "metadata")
    if os.path.isdir(data_dir) and os.path.isdir(meta_dir):
        return spark.read.parquet(data_dir)
    return spark.read.parquet(ref)


def write_layout(df, path: str, mode: str = "overwrite",
                 partition_by=None) -> dict:
    """Write an Iceberg-layout-shaped directory: parquet under `data/`,
    snapshot manifest JSON under `metadata/`. Returns the manifest."""
    data_dir = os.path.join(path, "data")
    meta_dir = os.path.join(path, "metadata")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)
    os.makedirs(meta_dir, exist_ok=True)
    files = []
    for dirpath, _dirs, names in os.walk(data_dir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                full = os.path.join(dirpath, n)
                files.append({
                    "path": os.path.relpath(full, path),
                    "bytes": os.path.getsize(full),
                })
    existing = [f for f in os.listdir(meta_dir)
                if f.startswith("v") and f.endswith(".metadata.json")]
    version = 1 + max((int(f[1:].split(".")[0]) for f in existing),
                      default=0)
    manifest = {
        "format": "sgp-sketch-layout/1 (Iceberg-layout-shaped; use real "
                  "Iceberg runtime in production)",
        "version": version,
        "schema": df.schema.jsonValue(),
        "partition_by": list(partition_by or []),
        "files": files,
        "n_files": len(files),
        "total_bytes": sum(f["bytes"] for f in files),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return manifest
