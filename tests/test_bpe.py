"""Distributed BPE vs a pure-Python reference implementation (identical
tie-break: max count, then lexicographic pair)."""

from collections import Counter

from sgp_sketch.bpe import END, encode_with_merges, train_bpe


def ref_bpe(word_freqs: dict, n_merges: int):
    """Sennrich-style reference BPE on a word-frequency dict."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        nxt = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    return merges


CORPUS = ["low low low lower lower newest newest newest newest widest",
          "widest widest newest low lowest lowest"]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    wf = Counter(w for t in CORPUS for w in t.split(" ") if w)
    expect = ref_bpe(dict(wf), 12)
    got, vocab = train_bpe(df, n_merges=12, checkpoint_every=5)
    assert got == expect
    vocab.unpersist()


def test_encode_with_merges_roundtrip(spark):
    """Encoded symbols concatenate back to the original words, and the
    top merge actually compresses the corpus encoding."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = train_bpe(df, n_merges=8)
    vocab.unpersist()
    enc = encode_with_merges(df, merges).collect()
    for row in enc:
        rebuilt = "".join(row.bpe_tokens).replace(END, " ").strip()
        assert rebuilt == " ".join(w for w in row.text.split(" ") if w)
        n_chars = sum(len(w) + 1 for w in row.text.split(" ") if w)
        assert len(row.bpe_tokens) < n_chars  # merges compressed it


def test_encode_null_and_empty_text(spark):
    df = spark.createDataFrame([(None,), ("",), ("  ",), ("low low",)],
                               "text string")
    merges, vocab = train_bpe(
        spark.createDataFrame([(t,) for t in CORPUS], "text string"),
        n_merges=4)
    vocab.unpersist()
    rows = encode_with_merges(df, merges).collect()
    got = [r.bpe_tokens for r in rows]
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert len(got[3]) >= 2 and "".join(got[3]).count(END) == 2


def test_encode_corpus_pass_is_python_free(spark):
    """Round-3 verdict finding: the corpus encode pass must not run
    per-row Python. The plan for encode_with_merges over a corpus must
    contain no Python evaluation operator (the dictionary lookup is
    transform/element_at/flatten over a broadcast map)."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = train_bpe(df, n_merges=6)
    vocab.unpersist()
    plan = (encode_with_merges(df, merges)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan  # no BatchEvalPython/ArrowEvalPython


def test_encode_words_matches_per_word_reference(spark):
    """Dictionary encoding of distinct words equals the pure-Python
    reference rewrite replayed per word."""
    from sgp_sketch.bpe import encode_words

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = train_bpe(df, n_merges=10)
    vocab.unpersist()

    def ref_encode(word):
        syms = list(word) + [END]
        for _, a, b, _c in sorted(merges):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = sorted({w for t in CORPUS for w in t.split(" ") if w})
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: r.subwords for r in encode_words(wdf, merges).collect()}
    for w in words:
        assert got[w] == ref_encode(w), w


def test_join_strategy_equals_broadcast(spark):
    """The beyond-broadcast-vocabulary scale path (posexplode →
    shuffle-join on word → positional reassembly) must produce exactly
    the broadcast path's per-document token arrays — including empty and
    NULL documents, which have no exploded rows to reassemble."""
    rows = [(i, t) for i, t in enumerate(
        CORPUS + ["", None, "solo", "  gaps  between  "])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, vocab = train_bpe(df, n_merges=6)
    vocab.unpersist()
    bc = {r.doc_id: r.bpe_tokens
          for r in encode_with_merges(df, merges).collect()}
    jn = {r.doc_id: r.bpe_tokens
          for r in encode_with_merges(df, merges,
                                      strategy="join").collect()}
    assert bc == jn
    assert jn[2] == [] and jn[3] == []  # empty + NULL docs


def test_encode_words_deep_merge_list(spark):
    """Production merge lists run to thousands of entries: encode_words
    must not build one unbounded nested-replace expression (Catalyst
    stack / codegen limits). 200 merges with batch=64 crosses three
    materialization segments and must still match the pure-Python
    reference replay exactly."""
    from sgp_sketch.bpe import encode_words

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = train_bpe(df, n_merges=10)
    vocab.unpersist()
    # pad with no-op merges (symbols absent from the corpus) to depth 200
    merges = list(merges) + [(10 + i, f"§{i}", f"¶{i}", 1)
                             for i in range(190)]

    def ref_encode(word):
        syms = list(word) + [END]
        for _, a, b, _c in sorted(merges):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = sorted({w for t in CORPUS for w in t.split(" ") if w})
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: r.subwords
           for r in encode_words(wdf, merges, batch=64).collect()}
    for w in words:
        assert got[w] == ref_encode(w), w


def test_join_strategy_validate_rejects_duplicate_ids(spark):
    """strategy='join' reassembles by id — duplicate ids silently
    concatenate rows, so validate=True must refuse them loudly."""
    import pytest

    df = spark.createDataFrame(
        [(1, "low low"), (1, "lower"), (2, "newest")],
        "doc_id long, text string")
    merges, vocab = train_bpe(df, n_merges=3)
    vocab.unpersist()
    with pytest.raises(ValueError, match="uniquely identify"):
        encode_with_merges(df, merges, strategy="join",
                           validate=True).collect()
