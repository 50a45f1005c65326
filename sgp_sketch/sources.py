"""Native edge-list / adjacency-list graph text input as a Spark 4
Python DataSource — `spark.read.format("edgelist")` instead of a
convert-to-parquet preprocessing hop.

Mirrors the reference's two text layouts
(/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:217-225:
'#'-comment lines skipped, whitespace-split `vertex outDegree
neighbors...` adjacency rows; the plain `src dst` edge pair layout used
by its SNAP loaders) and replaces the driver-side sequential reader with
a PARALLEL scan:

  * `partitions()` splits every input file into byte ranges of
    `chunk_bytes` (default 32 MiB) — a 1 TB edge dump becomes ~32k
    independent tasks, no single-reader bottleneck. Ranges align to line
    boundaries reader-side with the standard convention: a task skips
    its first partial line (owned by the previous range) and reads
    through the end of the line that crosses its upper boundary.
  * `read()` yields Arrow RecordBatches parsed with numpy from the raw
    byte buffer (one newline split + one whole-block numeric parse for
    the edge layout — no per-field Python loop), so rows enter Spark
    through the vectorized Arrow path.

Four layouts:
  * `edge` (default) — `src dst` pairs → (src long, dst long)
  * `edge_ts` — `src dst [ts]`, the reference's optional third
    time_stamp column (csv-converter.scala:31-34) → (src, dst, ts)
  * `adj` — `vertex outDegree neighbors...` (EdgeCutSGP.java:217-225)
  * `ladj` — the reference's labeled LDBC-SNB adjacency
    `id|elabel,target[,ts] ...|elabel,source[,ts] ...`
    (csv-converter.scala:40-74 / script-input-ldbc-snb.groovy:19-47)
    → (src string, dst string, elabel string, ts long, dir string);
    .option("elabels", "knows,likes") applies the reference's
    ingest-time edge-label IN-set predicate (EdgeCutSGP.java:84-92)
    inside the ranged scan.

Usage:
    from sgp_sketch.sources import register
    register(spark)
    edges = (spark.read.format("edgelist")
             .option("layout", "adj")        # edge | edge_ts | adj | ladj
             .load("/data/twitter/*.txt"))   # → (src long, dst long)

Filesystem contract: paths resolve with driver-side os.path/glob and
executor-side open(), so the input must live on a POSIX filesystem
visible at the SAME path from every node (local disk in local mode; NFS
or a FUSE mount on a cluster). Object-store / HDFS URIs (`s3://`,
`hdfs://`, ...) are rejected with a clear error in `partitions()` —
route those through Spark's built-in text reader instead.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np

try:
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)
except ImportError:  # pragma: no cover - pyspark < 4
    DataSource = DataSourceReader = object

    class InputPartition:  # type: ignore
        def __init__(self, value):
            self.value = value


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


def _parse_edges(buf: bytes, layout: str, comment: bytes = b"#"):
    """Raw text block → (src int64[], dst int64[]), vectorized.

    Lines are split with one newline scan; adjacency rows (variable
    arity) parse per line; the hot edge-pair layout parses the whole
    block with ONE tokenize + numeric-cast pass."""
    if not buf:
        return (np.empty(0, np.int64),) * 2
    lines = buf.split(b"\n")
    if layout == "edge":
        # one pass: drop comments/blanks, then a single numeric parse
        good = [ln for ln in lines if ln and not ln.startswith(comment)]
        if not good:
            return (np.empty(0, np.int64),) * 2
        flat = np.array(b" ".join(good).split(), dtype=np.int64)
        if flat.size % 2:
            raise ValueError("edge layout: odd field count "
                             "(malformed src/dst line)")
        return flat[0::2], flat[1::2]
    # adjacency: vertex outDegree n1 n2 ... (EdgeCutSGP.java:217-225)
    srcs, dsts = [], []
    for ln in lines:
        if not ln or ln.startswith(comment):
            continue
        f = np.array(ln.split(), dtype=np.int64)
        if f.size < 2:
            raise ValueError(f"adj layout: short line {ln[:60]!r}")
        deg = int(f[1])
        if f.size != 2 + deg:
            # strict both ways: a long line (extra trailing neighbors)
            # means the declared degree is wrong — dropping the tail
            # would silently lose edges
            raise ValueError(f"adj layout: degree {deg} but "
                             f"{f.size - 2} neighbors")
        nbrs = f[2:]
        srcs.append(np.full(nbrs.size, f[0], dtype=np.int64))
        dsts.append(nbrs)
    if not srcs:
        return (np.empty(0, np.int64),) * 2
    return np.concatenate(srcs), np.concatenate(dsts)


def _parse_ladj(buf: bytes, elabels: frozenset | None = None,
                comment: bytes = b"#"):
    """Labeled-adjacency block → columnar lists
    (src, dst, elabel, ts, dir), the reference's LDBC-SNB layout

        id|elabel,target[,ts] ...|elabel,source[,ts] ...

    (csv-converter.scala:40-74 writes it; script-input-ldbc-snb.groovy:
    19-47 parses it back — part 2 is OUT edges id→target, part 3 is IN
    edges source→id, ts is epoch millis and optional per edge).

    `elabels` applies the reference's ingest-time edge-label IN-set
    predicate (EdgeCutSGP.java:84-92: labels outside the user's set are
    dropped DURING the scan, before any edge materializes) — pass it via
    .option("elabels", "knows,likes") so the filter runs inside the
    ranged read, not as a post-scan Filter node."""
    src, dst, lab, ts, dirs = [], [], [], [], []

    def _edges(part: bytes, vid: bytes, incoming: bool):
        for tok in part.split(b" "):
            if not tok:
                continue
            f = tok.split(b",")
            if len(f) < 2:
                raise ValueError(f"ladj: malformed edge token {tok[:60]!r}")
            if elabels is not None and f[0] not in elabels:
                continue
            lab.append(f[0].decode())
            t = int(f[2]) if len(f) > 2 and f[2] else None
            ts.append(t)
            if incoming:
                src.append(f[1].decode())
                dst.append(vid.decode())
                dirs.append("in")
            else:
                src.append(vid.decode())
                dst.append(f[1].decode())
                dirs.append("out")

    for ln in buf.split(b"\n"):
        if not ln or ln.startswith(comment):
            continue
        parts = ln.split(b"|")
        if len(parts) != 3:
            # full split, not maxsplit=2: a 4th |-part would otherwise be
            # silently glued into the in-edges block and parse as a
            # corrupt vertex id instead of raising like every other arity
            # error in this module
            raise ValueError(f"ladj: expected id|out|in, got {ln[:60]!r}")
        _edges(parts[1], parts[0], incoming=False)
        _edges(parts[2], parts[0], incoming=True)
    return src, dst, lab, ts, dirs


def _parse_edges_ts(buf: bytes, comment: bytes = b"#"):
    """`src dst [ts]` block → (src int64[], dst int64[], ts object[]):
    the reference's edge CSVs carry an optional third time_stamp column
    (csv-converter.scala:31-34); rows may mix 2- and 3-field arity, so
    missing ts is NULL rather than a parse error."""
    if not buf:
        e = np.empty(0, np.int64)
        return e, e, []
    good = [ln for ln in buf.split(b"\n")
            if ln and not ln.startswith(comment)]
    if not good:
        e = np.empty(0, np.int64)
        return e, e, []
    # Per-line loop, kept deliberately: the mixed 2/3 arity defeats the
    # fixed-arity `edge` layout's flat-split trick, and BOTH measured
    # alternatives lose to this loop on interleaved-median timing over a
    # 50 MB block (numpy S24→int64 after per-line splits: 2.6× slower;
    # flat split + byte-position arity + one np.array(toks, int64)
    # parse: 1.13× slower — two 50 MB boolean byte scans cost more than
    # 5M small-bytes int() calls). Per-chunk Python cost parallelizes
    # across the ranged scan's partitions anyway (~25 MB/s/core here).
    src, dst, ts = [], [], []
    for ln in good:
        f = ln.split()
        if len(f) not in (2, 3):
            raise ValueError(f"edge_ts layout: {len(f)} fields in "
                             f"{ln[:60]!r}")
        try:
            src.append(int(f[0]))
            dst.append(int(f[1]))
            ts.append(int(f[2]) if len(f) == 3 else None)
        except ValueError:
            raise ValueError(f"edge_ts layout: non-integer field in "
                             f"{ln[:60]!r}") from None
    return (np.asarray(src, np.int64), np.asarray(dst, np.int64), ts)


def _read_range(path: str, start: int, end: int) -> bytes:
    """Byte range → block of the complete lines this range OWNS: the
    Hadoop LineRecordReader convention — a range owns every line whose
    first byte lies in [start, end), reading from start-1 so a line
    beginning exactly at `start` is kept, and reading past `end` to
    finish its last crossing line."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if start == 0:
            buf = f.read(end)
        else:
            f.seek(start - 1)
            raw = f.read(end - start + 1)
            nl = raw.find(b"\n")
            if nl < 0:
                return b""  # no line starts in this range
            buf = raw[nl + 1:]
        if not buf:
            return b""
        tail = b""
        if not buf.endswith(b"\n") and end < size:
            while True:  # finish the line that crosses `end`
                chunk = f.read(1 << 16)
                if not chunk:
                    break
                nl = chunk.find(b"\n")
                if nl >= 0:
                    tail += chunk[:nl]
                    break
                tail += chunk
        return buf + tail


class EdgeListReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgelist: .load(path) is required")
        self.layout = options.get("layout", "edge")
        if self.layout not in ("edge", "adj", "edge_ts", "ladj"):
            raise ValueError(f"edgelist: unknown layout {self.layout!r}")
        self.chunk = int(options.get("chunk_bytes", 32 << 20))
        labels = options.get("elabels")
        self.elabels = (frozenset(s.strip().encode()
                                  for s in labels.split(",") if s.strip())
                        if labels else None)
        if self.elabels is not None and self.layout != "ladj":
            raise ValueError("edgelist: elabels only applies to the "
                             "ladj layout")

    def partitions(self):
        # fail loudly on URI schemes this reader cannot serve: resolution
        # is local os.path/glob + open(), so an s3://... or hdfs://...
        # path would otherwise glob-miss and silently yield zero
        # partitions (empty DataFrame) instead of an error
        scheme = self.path.split("://", 1)[0] if "://" in self.path else ""
        if scheme and scheme != "file":
            raise ValueError(
                f"edgelist: unsupported URI scheme {scheme!r} — this "
                "DataSource reads a shared POSIX filesystem only; use "
                "spark.read.text for object-store/HDFS inputs")
        path = self.path[len("file://"):] if scheme == "file" else self.path
        paths = sorted(_glob.glob(path)) or [path]
        # the standard .load("/dir") idiom: expand directories to their
        # contained data files (skip dotfiles and _SUCCESS-style markers)
        expanded = []
        for p in paths:
            if os.path.isdir(p):
                # plain files only: a nested subdirectory would pass
                # getsize() on Linux and then crash the executor's
                # open(dir, 'rb') mid-job
                expanded.extend(
                    fp for f in sorted(os.listdir(p))
                    if not f.startswith((".", "_"))
                    and os.path.isfile(fp := os.path.join(p, f)))
            else:
                expanded.append(p)
        parts = []
        for p in expanded:
            if p.endswith(".gz"):
                # gzip streams are not seek-splittable: one whole-file
                # partition (parallelism = file count, the Hadoop rule)
                parts.append(_Range(p, 0, -1))
                continue
            size = os.path.getsize(p)
            for s in range(0, max(size, 1), self.chunk):
                parts.append(_Range(p, s, min(s + self.chunk, size)))
        return parts

    def read(self, partition: _Range):
        import pyarrow as pa

        if partition.end == -1:  # whole gzip file
            import gzip

            with gzip.open(partition.path, "rb") as f:
                buf = f.read()
        else:
            buf = _read_range(partition.path, partition.start,
                              partition.end)
        if self.layout == "ladj":
            src, dst, lab, ts, dirs = _parse_ladj(buf, self.elabels)
            yield pa.RecordBatch.from_arrays(
                [pa.array(src, pa.string()), pa.array(dst, pa.string()),
                 pa.array(lab, pa.string()), pa.array(ts, pa.int64()),
                 pa.array(dirs, pa.string())],
                names=["src", "dst", "elabel", "ts", "dir"])
            return
        if self.layout == "edge_ts":
            src, dst, ts = _parse_edges_ts(buf)
            yield pa.RecordBatch.from_arrays(
                [pa.array(src, pa.int64()), pa.array(dst, pa.int64()),
                 pa.array(ts, pa.int64())],
                names=["src", "dst", "ts"])
            return
        src, dst = _parse_edges(buf, self.layout)
        yield pa.RecordBatch.from_arrays(
            [pa.array(src, pa.int64()), pa.array(dst, pa.int64())],
            names=["src", "dst"])


class EdgeListDataSource(DataSource):
    @classmethod
    def name(cls):
        return "edgelist"

    def schema(self):
        layout = self.options.get("layout", "edge")
        if layout == "ladj":
            return ("src string, dst string, elabel string, ts long, "
                    "dir string")
        if layout == "edge_ts":
            return "src long, dst long, ts long"
        return "src long, dst long"

    def reader(self, schema):
        return EdgeListReader(self.options)


def register(spark) -> None:
    """Idempotently register the edgelist format on this session."""
    spark.dataSource.register(EdgeListDataSource)
