"""Deterministic synthetic `tokens` table generator (FIXTURES.md §1).

Schema mandated by BASELINE.json input_hint:
    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

The shape echoes the reference's dataset spectrum
(`/root/reference/README.md:40-45`): per-source Zipf token skew (heavy-tailed,
like Twitter's maxdeg 2.9M) and one deliberately hot-keyed source (`social`)
for salting tests. Composed doc ids mirror `"person:" + id`
(`/root/reference/scripts/converters/csv-converter.scala:81`).

Generation is chunked: every 20k-doc chunk draws from its own PCG64 stream
seeded with (seed, source_idx, chunk_start), so the local-pandas path and the
distributed mapInPandas path produce byte-identical tables and generation
scales embarrassingly parallel with no driver materialization and no
wall-clock/global-RNG dependence.
"""

from __future__ import annotations

import numpy as np

SOURCES = ("web", "books", "code", "wiki", "news", "forums", "academic", "social")
VOCAB = 1 << 20
HOT_SET_SIZE = 100
SEED = 42
CHUNK = 20_000


def _doc_count(n_docs: int, source_idx: int, n_sources: int = len(SOURCES)) -> int:
    base = n_docs // n_sources
    return base + (1 if source_idx < n_docs % n_sources else 0)


def _gen_chunk(si: int, start: int, count: int, seed: int = SEED):
    """One deterministic chunk → (doc_ids, token_arrays, lens)."""
    src = SOURCES[si]
    rng = np.random.default_rng(np.random.SeedSequence([seed, int(si), int(start)]))
    lens = np.clip(rng.lognormal(5.5, 0.8, count), 16, 8192).astype(np.int32)
    total = int(lens.sum())
    # Zipf over the vocab with a per-source offset: distinct-but-overlapping
    # token sets across sources
    raw = rng.zipf(1.2, total)
    toks = ((raw - 1 + si * (VOCAB // 16)) % VOCAB).astype(np.int32)
    if src == "social":
        # 10% of docs draw half their tokens from a 100-token hot set
        hot_docs = rng.random(count) < 0.10
        rep = np.repeat(hot_docs, lens) & (rng.random(total) < 0.5)
        toks[rep] = rng.integers(0, HOT_SET_SIZE, int(rep.sum())).astype(np.int32)
    arrays = np.split(toks, np.cumsum(lens)[:-1])
    ids = [f"{src}:{start + j:08d}" for j in range(count)]
    return ids, arrays, lens


def _tasks(n_docs: int):
    for i in range(len(SOURCES)):
        cnt = _doc_count(n_docs, i)
        for start in range(0, cnt, CHUNK):
            yield i, start, min(CHUNK, cnt - start)


def generate_pandas(n_docs: int, seed: int = SEED):
    """Whole table as a pandas DataFrame (small scales / tests)."""
    import pandas as pd

    frames = []
    for si, start, count in _tasks(n_docs):
        ids, arrays, lens = _gen_chunk(si, start, count, seed)
        frames.append(pd.DataFrame({
            "doc_id": ids, "tokens": arrays, "n_tok": lens,
            "source": SOURCES[si]}))
    return pd.concat(frames, ignore_index=True)


def tokens_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ])


def tokens_df(spark, n_docs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: one mapInPandas task per (source, chunk)."""
    def gen(iterator):
        import pandas as pd
        for pdf in iterator:
            for si, start, count in pdf.itertuples(index=False):
                ids, arrays, lens = _gen_chunk(int(si), int(start), int(count), seed)
                yield pd.DataFrame({
                    "doc_id": ids, "tokens": arrays, "n_tok": lens,
                    "source": SOURCES[si]})

    tasks = list(_tasks(n_docs))
    tasks_sdf = spark.createDataFrame(tasks, "si int, start int, count int")
    n_part = partitions or min(len(tasks), 64)
    return tasks_sdf.repartition(n_part).mapInPandas(gen, tokens_schema())


def write_tokens_table(spark, path: str, n_docs: int, seed: int = SEED,
                       partitions: int | None = None,
                       out_files: int | None = None) -> str:
    """Write the table partitioned by `source` so `filter(source=...)` prunes
    files (the reference's scan-level label filter,
    `/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:84-92`,
    done by the storage layout instead).

    `out_files` controls file count (≈ row-group count ≈ the max usable scan
    parallelism downstream — parquet splits are row-group-bound). Hashing by
    (source, doc_id) keeps each writer task on one source directory."""
    df = tokens_df(spark, n_docs, seed, partitions)
    if out_files:
        df = df.repartition(out_files, "source", "doc_id")
    df.write.mode("overwrite").partitionBy("source").parquet(path)
    return path


# ------------------------------------------------- near-dup-heavy documents

NEARDUP_VOCAB = 50_000
NEARDUP_FAMILY = 5


def _neardup_chunk(start: int, count: int, dup_frac: float = 0.3,
                   mutate: float = 0.01, seed: int = SEED):
    """One deterministic chunk of documents with PLANTED near-duplicate
    families: an expected `dup_frac` FRACTION OF DOCS belong to families
    of NEARDUP_FAMILY members sharing a base word sequence with `mutate`
    of the words substituted per member (1% substitutions over 3-word
    shingles keeps pairwise Jaccard ≈ 0.77-0.95, median ≈ 0.89 — ≥97% of
    planted pairs clear a 0.75 dedup threshold). Each emission plants a
    whole family with probability q = d/(F − d(F−1)), the rate at which
    qF family docs per (qF + 1 − q) total equals d. doc_id encodes the
    family (`fam:<fid>:<member>` vs `uniq:<id>`), so a probe can measure
    recovery of the planted pairs exactly."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 7, int(start)]))
    fam_p = dup_frac / (NEARDUP_FAMILY - dup_frac * (NEARDUP_FAMILY - 1))
    ids, texts = [], []
    i = start
    end = start + count
    while i < end:
        L = int(rng.integers(80, 120))
        base = rng.integers(0, NEARDUP_VOCAB, L)
        if rng.random() < fam_p and i + NEARDUP_FAMILY <= end:
            fid = i
            for m in range(NEARDUP_FAMILY):
                w = base.copy()
                flips = rng.random(L) < mutate
                w[flips] = rng.integers(0, NEARDUP_VOCAB, int(flips.sum()))
                ids.append(f"fam:{fid:09d}:{m}")
                texts.append(" ".join(f"w{t:05d}" for t in w))
                i += 1
        else:
            ids.append(f"uniq:{i:09d}")
            texts.append(" ".join(f"w{t:05d}" for t in base))
            i += 1
    return ids, texts


def neardup_docs_df(spark, n_docs: int, dup_frac: float = 0.3,
                    mutate: float = 0.01, seed: int = SEED,
                    partitions: int | None = None):
    """Distributed near-dup-heavy corpus (doc_id, text, source, n_chars) —
    the 10x dedup scale probe's input. Same chunked-PCG64 discipline as
    tokens_df: content depends only on (seed, chunk start), never on the
    task layout."""
    from pyspark.sql import types as T

    def gen(iterator):
        import pandas as pd
        for pdf in iterator:
            for start, count in pdf.itertuples(index=False):
                ids, texts = _neardup_chunk(int(start), int(count),
                                            dup_frac, mutate, seed)
                yield pd.DataFrame({
                    "doc_id": ids, "text": texts,
                    "source": ["synth"] * len(ids),
                    "n_chars": [len(t) for t in texts]})

    tasks = [(s, min(CHUNK, n_docs - s)) for s in range(0, n_docs, CHUNK)]
    tasks_sdf = spark.createDataFrame(tasks, "start int, count int")
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False)])
    n_part = partitions or min(len(tasks), 64)
    return tasks_sdf.repartition(n_part).mapInPandas(gen, schema)


# ------------------------------------------------- synthetic embeddings

def vectors_df(spark, n_vecs: int, dim: int = 64, seed: int = SEED,
               partitions: int | None = None):
    """Deterministic synthetic embedding table (vec_id long, embedding
    array<double>): each CHUNK-row slice draws from its own PCG64 stream
    seeded with (seed, chunk_start), so any partitioning produces the
    identical table — same chunked-determinism contract as tokens_df."""
    def gen(iterator):
        import pandas as pd
        for pdf in iterator:
            for start, count in pdf.itertuples(index=False):
                rng = np.random.default_rng((seed, int(start)))
                x = rng.standard_normal((int(count), dim))
                yield pd.DataFrame({
                    "vec_id": np.arange(start, start + count,
                                        dtype=np.int64),
                    "embedding": list(x)})

    tasks = [(s, min(CHUNK, n_vecs - s)) for s in range(0, n_vecs, CHUNK)]
    tasks_sdf = spark.createDataFrame(tasks, "start int, count int")
    n_part = partitions or min(len(tasks), 64)
    return (tasks_sdf.repartition(n_part)
            .mapInPandas(gen, "vec_id long, embedding array<double>"))
