"""Ship the sgp_sketch package to Spark python workers.

On a real cluster this is `spark-submit --py-files sgp_sketch.zip`
(north_rule deployment mode); `ensure_py_files` is the in-process
equivalent for driver-embedded sessions whose cwd is not the repo root —
it zips the package once and registers it with `sc.addPyFile`, so UDF
closures that reference sgp_sketch import cleanly on every worker.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_ADDED: set[str] = set()


def package_zip(dest: str | None = None) -> str:
    """Build sgp_sketch.zip (the --py-files artifact). Deterministic layout."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "sgp_sketch")
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(),
                            f"sgp_sketch_pyfiles_{os.getpid()}.zip")
    with zipfile.ZipFile(dest, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return dest


def ensure_py_files(spark) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _ADDED:
        return
    spark.sparkContext.addPyFile(package_zip())
    _ADDED.add(app_id)
