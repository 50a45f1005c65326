"""Random-corpus sweeps for the production-chain near-dup and
estimate-surface oracles (__spark_entry__._simhash_near_dup_oracle_sql,
_minhash_near_dup_oracle_sql, _hll_source_estimates_oracle_sql).

Same discipline as the MG/KLL/t-digest sweeps: the oracle SQL runs on a
DuckDB-registered synthetic `documents` table while an independent
Python path (scalar xxh64 reference + the numpy kernels the Spark UDFs
call) computes the same pipeline — so a corpus shape the fixed testdata
never produces (single-word docs, sub-3-word docs, colliding chunk
values, doc-id string-order traps, band-string length extremes) is
exercised without a Spark session.  tools/check_contract.py remains the
Spark-vs-DuckDB end-to-end gate on the real testdata.
"""

import math
from collections import defaultdict
from itertools import combinations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry
from sgp_sketch.dedup import minhash_batch, simhash_batch
from sgp_sketch.oracle_replay import (GOLDEN_CONST, splitmix64_const,
                                      xxh64_ascii_const, xxh64_int_const)

M64 = 1 << 64


def _signed(u: int) -> int:
    return u - M64 if u >= (1 << 63) else u


def _corpus(seed: int) -> pd.DataFrame:
    """Synthetic documents: random short ASCII words, doc lengths 1..40
    (including sub-3-word docs that produce no shingles), plus 1-3
    EMPTY-text docs (split('', ' ') = [''] — the shape a text <> ''
    oracle filter silently diverged on, review finding #1).  doc_ids mix
    4-6 digit values with a few small 1-2 digit ids so string ordering
    genuinely differs from numeric; up to 8 sources."""
    rng = np.random.default_rng(seed)
    vocab = ["".join(rng.choice(list("abcdefgh"), size=int(rng.integers(1, 9))))
             for _ in range(int(rng.integers(4, 40)))]
    rows = []
    for i in range(int(rng.integers(20, 120))):
        n = int(rng.integers(1, 40))
        text = " ".join(rng.choice(vocab, size=n))
        did = (int(rng.integers(1, 99)) if rng.random() < 0.1
               else int(rng.integers(1, 999)) * 1000 + i)
        rows.append((did, text, f"src{int(rng.integers(0, 8))}"))
    for j in range(int(rng.integers(1, 4))):
        rows.append((int(rng.integers(1, 99)), "",
                     f"src{int(rng.integers(0, 8))}"))
    # NULL-text docs: dropped by the near-dup paths (NULL token array),
    # fingerprint-0 in doc_fingerprint, token-free everywhere else —
    # keeps the oracles' NULL branches (LEFT JOIN/COALESCE, IS NOT NULL
    # filters) live in the sweeps, not just asserted
    for j in range(int(rng.integers(1, 3))):
        rows.append((900000 + j, None, f"src{int(rng.integers(0, 8))}"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    # small-id collisions possible — the engines under test key on
    # doc_id, so keep ids unique
    return df.drop_duplicates("doc_id").reset_index(drop=True)


def _word_hash(w: str) -> int:
    return xxh64_ascii_const(w)  # uint64


def _simhash_pairs_ref(docs: pd.DataFrame):
    fps = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue  # NULL token array — dropped by the production path
        # empty text is KEPT: split('', ' ') = [''] → one ''-token
        toks = np.array([_signed(_word_hash(w)) for w in text.split(" ")],
                        dtype=np.int64)
        fps[str(did)] = int(simhash_batch([toks])[0])
    buckets = defaultdict(list)
    for did, f in fps.items():
        for c in range(4):
            buckets[(c, (f >> (16 * c)) & 0xFFFF)].append(did)
    out = set()
    for members in buckets.values():
        if len(members) > 10000:
            continue
        for a, b in combinations(sorted(members), 2):
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                out.add((a, b, h))
    return out


@pytest.mark.parametrize("seed", [3, 17, 59])
def test_simhash_near_dup_oracle_random_corpora(seed):
    docs = _corpus(seed)
    con = duckdb.connect()
    con.register("documents", docs)
    got = {(r[0], r[1], int(r[2])) for r in
           con.execute(entry._simhash_near_dup_oracle_sql()).fetchall()}
    assert got == _simhash_pairs_ref(docs)


def _minhash_pairs_ref(docs: pd.DataFrame):
    k, bands, r = 64, 16, 4
    sigs, n_docs = {}, 0
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue  # NULL shingle array — dropped by the production path
        words = text.split(" ")
        if len(words) < 3:
            continue
        grams = [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]
        sh = []
        seen = set()
        for g in grams:
            t = _signed(_word_hash(g))
            if t not in seen:
                seen.add(t)
                sh.append(t)
        sig = minhash_batch([np.array(sh, dtype=np.int64)], k=k)[0]
        sigs[int(did)] = sig.astype(np.uint64)
        n_docs += 1
    buckets = defaultdict(list)
    for did, sig in sigs.items():
        for b in range(bands):
            s = ",".join(str(_signed(int(v))) for v in sig[b * r:(b + 1) * r])
            h = xxh64_ascii_const(s, seed=xxh64_int_const(b))
            buckets[(b, h)].append(did)
    cands = set()
    for members in buckets.values():
        if len(members) > 1000:
            continue
        for a, b in combinations(sorted(members), 2):
            cands.add((a, b))
    out = {}
    for a, b in cands:
        keq = int((sigs[a] == sigs[b]).sum())
        if keq >= 32:
            out[(a, b)] = (keq * 15625 + 50) // 100 / 10000.0
    return out


@pytest.mark.parametrize("seed", [5, 23, 71])
def test_minhash_near_dup_oracle_random_corpora(seed):
    docs = _corpus(seed)
    con = duckdb.connect()
    con.register("documents", docs)
    rows = con.execute(entry._minhash_near_dup_oracle_sql()).fetchall()
    got = {(int(a), int(b)): float(e) for a, b, e in rows}
    exp = _minhash_pairs_ref(docs)
    assert got == exp


def _lane_seed_convention():
    """The oracle's lane seeds must equal minhash_batch's."""
    exp = [splitmix64_const(((i + 1) * GOLDEN_CONST) % M64)
           for i in range(64)]
    from sgp_sketch.kernels.hashing import GOLDEN, splitmix64

    got = splitmix64(np.arange(1, 65, dtype=np.uint64) * GOLDEN)
    return exp, [int(v) for v in got]


def test_minhash_lane_seed_convention_64():
    exp, got = _lane_seed_convention()
    assert exp == got


@pytest.mark.parametrize("seed", [7, 29])
def test_hll_source_estimates_oracle_random_corpora(seed):
    docs = _corpus(seed)
    con = duckdb.connect()
    con.register("documents", docs)
    rows = con.execute(
        entry._hll_source_estimates_oracle_sql(include_global=True)
    ).fetchall()
    got = {r[0]: float(r[1]) for r in rows}
    # independent path: distinct register indexes per source via the
    # scalar reference chain, then linear counting
    from sgp_sketch.kernels.hashing import splitmix64

    idxs = defaultdict(set)
    for text, src in zip(docs["text"], docs["source"]):
        if text is None:
            continue  # NULL token array contributes nothing
        for w in text.split(" "):
            h = int(splitmix64(np.uint64(_word_hash(w))))
            idxs[src].add(h >> 50)
            idxs["__all__"].add(h >> 50)
    exp = {s: 16384.0 * math.log(16384.0 / (16384.0 - len(v)))
           for s, v in idxs.items()}
    assert set(got) == set(exp)
    for s in exp:
        assert got[s] == exp[s], s


@pytest.mark.parametrize("seed", [11, 37, 83,   # exact path
                                  39, 59, 70])  # guard path (verified)
def test_cms_heavy_hitters_oracle_random_corpora(seed):
    """The cms_heavy_hitters oracle is exact ONLY on collision-free
    corpora and must loud-guard otherwise.  Random vocabularies collide
    in a CMS row with realistic probability, so each sweep corpus either
    (a) raises the guard's conversion error — the guard doing its job —
    or (b) matches the exact per-source top-10 by (count DESC, signed
    token ASC)."""
    from sgp_sketch.kernels.hashing import splitmix64

    docs = _corpus(seed)
    con = duckdb.connect()
    con.register("documents", docs)
    try:
        rows = con.execute(entry._cms_heavy_hitters_oracle_sql()).fetchall()
    except duckdb.ConversionException as e:
        assert "cms_heavy_hitters oracle" in str(e)
        # confirm the guard fired for a real reason: some CMS row must
        # actually collide on this vocabulary
        vocab = sorted({w for t in docs["text"] if t is not None
                        for w in t.split(" ")})
        toks = np.array([_word_hash(w) for w in vocab], dtype=np.uint64)
        h = splitmix64(toks)
        collided = False
        for j in range(4):
            seeds = splitmix64(np.uint64(7 + j))
            hj = splitmix64(h ^ seeds)
            cells = (hj % np.uint64(16384)).tolist()
            if len(set(cells)) != len(cells):
                collided = True
        assert collided
        return
    # exact path: per (source, token) counts → top 10
    counts = defaultdict(lambda: defaultdict(int))
    for text, src in zip(docs["text"], docs["source"]):
        if text is None:
            continue
        for w in text.split(" "):
            counts[src][_signed(_word_hash(w))] += 1
    exp = []
    for src, cm in counts.items():
        top = sorted(cm.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        exp += [(src, t, c, r + 1) for r, (t, c) in enumerate(top)]
    assert sorted(rows) == sorted(exp)


@pytest.mark.parametrize("seed", [13, 43])
def test_doc_fingerprint_oracle_random_corpora(seed):
    """Per-source doc and distinct-fingerprint counts, including the
    NULL-text branch: a NULL-text doc has no token rows, the oracle
    LEFT JOINs and coalesces its fingerprint to 0 (matching
    dedup.simhash_fingerprints' None → 0), and it still counts toward
    n_docs."""
    docs = _corpus(seed)
    con = duckdb.connect()
    con.register("documents", docs)
    rows = con.execute(entry._doc_fingerprint_oracle_sql()).fetchall()
    got = {r[0]: (int(r[1]), int(r[2])) for r in rows}
    fps = defaultdict(list)
    for did, text, src in zip(docs["doc_id"], docs["text"],
                              docs["source"]):
        if text is None:
            fps[src].append(0)
            continue
        toks = np.array([_signed(_word_hash(w)) for w in text.split(" ")],
                        dtype=np.int64)
        fps[src].append(int(simhash_batch([toks])[0]))
    exp = {src: (len(v), len(set(v))) for src, v in fps.items()}
    assert got == exp
