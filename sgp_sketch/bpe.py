"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokens-axis capability a pre-training pipeline needs BEFORE any token
table exists: learn the merge list from the corpus itself.

Scale shape: the corpus-sized pass is ONE declarative word-count
(explode → groupBy, map-side combinable) that collapses 100 TB of text
into a |distinct words| frequency table — classic BPE trains on exactly
that dictionary, so every later iteration touches only the vocabulary
table, orders of magnitude smaller than the corpus. Each merge round is
one pair-count aggregate (adjacent-pair explode weighted by word
frequency, map-side combined) + an argmax, then a vectorized rewrite of
the symbol sequences in an Arrow-batched pandas UDF (vocab-sized input,
never corpus-sized). The driver loop holds only the chosen merge per
round — the same driver-iterates / executors-aggregate split as
graph.pagerank.

Determinism: ties on pair count break lexicographically, so the merge
list is reproducible run-to-run and matches the pure-Python reference
implementation in tests/test_bpe.py exactly.
"""

from __future__ import annotations

END = "</w>"  # end-of-word marker, merged like any other symbol


def word_frequencies(df, text_col: str = "text"):
    """Corpus → (word, freq) dictionary table: the single corpus-sized
    pass. Declarative explode + count, fully map-side combinable."""
    from pyspark.sql import functions as F

    return (df.select(F.explode(F.split(F.col(text_col), " "))
                      .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _init_symbols(words):
    """(word, freq) → (syms array<string>, freq): characters + END."""
    from pyspark.sql import functions as F

    chars = F.split(F.col("word"), "")
    return words.select(
        F.concat(chars, F.array(F.lit(END))).alias("syms"), "freq")


def _pair_counts(vocab):
    """Adjacent-symbol pair counts weighted by word frequency."""
    from pyspark.sql import functions as F

    n = F.size("syms")
    pairs = F.arrays_zip(F.slice("syms", 1, n - 1),
                         F.slice("syms", 2, n - 1))
    return (vocab.filter(n >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .select(F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"),
                    "freq")
            .groupBy("a", "b").agg(F.sum("freq").alias("cnt")))


def merge_pair_udf(a: str, b: str):
    """Pandas UDF: rewrite each symbol sequence, merging every
    non-overlapping left-to-right occurrence of (a, b) into a+b — the
    exact reference-BPE rewrite, vectorized per Arrow batch over the
    vocabulary table (never the corpus)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ab = a + b

    @pandas_udf("array<string>")
    def merge(col):
        def one(syms):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out
        return col.map(one)

    return merge


def train_bpe(df, n_merges: int = 20, text_col: str = "text",
              checkpoint_every: int = 10):
    """Learn `n_merges` BPE merges from a corpus. Returns (merges, vocab):
    merges = [(rank, a, b, count)], vocab = final symbol-sequence
    DataFrame(syms array<string>, freq long).

    Each round runs one aggregate over the cached vocabulary table and
    collects ONE row (the argmax pair). The rewritten vocabulary is
    re-cached and the predecessor unpersisted; every `checkpoint_every`
    rounds the plan is truncated with localCheckpoint so lineage doesn't
    grow linearly in merges (the same discipline as iterative graph
    algorithms)."""
    from pyspark.sql import functions as F

    vocab = _init_symbols(word_frequencies(df, text_col)).cache()
    merges = []
    try:
        for rank in range(n_merges):
            best = (_pair_counts(vocab)
                    .orderBy(F.desc("cnt"), "a", "b").limit(1).collect())
            if not best:
                break
            a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
            merges.append((rank, a, b, cnt))
            nxt = vocab.withColumn("syms", merge_pair_udf(a, b)("syms"))
            if (rank + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.cache()
            nxt.count()  # materialize before dropping the predecessor
            vocab.unpersist()
            vocab = nxt
    except Exception:
        vocab.unpersist()
        raise
    return merges, vocab


def encode_with_merges(df, merges, text_col: str = "text",
                       out_col: str = "bpe_tokens"):
    """Apply a learned merge list to a corpus: per document, split words
    to characters+END and replay the merges in rank order — one
    Arrow-batched pass over the corpus, no shuffle (the merge list rides
    into the closure like a broadcast dim)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranked = [(a, b) for _, a, b, _ in sorted(merges)]

    @pandas_udf("array<string>")
    def enc(col):
        def one(text):
            if text is None:
                return []
            out = []
            for w in text.split(" "):
                if not w:
                    continue
                syms = list(w) + [END]
                for a, b in ranked:
                    ab, i, nxt = a + b, 0, []
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == a
                                and syms[i + 1] == b):
                            nxt.append(ab)
                            i += 2
                        else:
                            nxt.append(syms[i])
                            i += 1
                    syms = nxt
                out.extend(syms)
            return out
        return col.map(one)

    return df.withColumn(out_col, enc(text_col))
