"""Cross-engine hash-chain replay (sgp_sketch/oracle_replay.py).

Every SQL fragment the replay oracles are built from is checked
bit-for-bit against the numpy kernels it claims to replay — no Spark
session needed, the fragments are pure DuckDB scalar math. The
end-to-end Spark-vs-DuckDB adjudication runs in tools/check_contract.py
(queries hll_register_replay / theta_kmv_replay / bloom_bits_replay /
cms_counter_replay); these tests pin the primitives so a contract
failure localizes.
"""

import hashlib

import duckdb
import numpy as np
import pytest

from sgp_sketch.kernels.hashing import hash64, splitmix64
from sgp_sketch.oracle_replay import (hll_register_cols, md5_token_sql,
                                      seeded_sm64_cols, sm64_cols,
                                      splitmix64_const)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _col(con, q):
    return np.array([int(r[0]) for r in con.execute(q).fetchall()],
                    dtype=np.uint64)


def _edge_values():
    """uint64 edge cases + a spread of magnitudes."""
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.array([0, 1, 2, 63, 64, 2**31 - 1, 2**31, 2**32 - 1, 2**32,
                  2**53, 2**53 + 1, 2**60 - 1, 2**63 - 1, 2**63,
                  2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**64, size=500, dtype=np.uint64),
    ])
    return vals


def _values_rel(vals):
    return "(VALUES " + ", ".join(
        f"(CAST({int(v)} AS HUGEINT))" for v in vals) + ") AS t(v)"


def test_sm64_chain_bit_exact(con):
    vals = _edge_values()
    q = (f"SELECT h FROM (SELECT v, {sm64_cols('v', 'h', 'a')} "
         f"FROM {_values_rel(vals)})")
    assert np.array_equal(_col(con, q), splitmix64(vals))


@pytest.mark.parametrize("seed", [7, 8, 10, 11, 12, 13])
def test_seeded_chain_matches_hash64(con, seed):
    vals = _edge_values()
    q = (f"SELECT hs FROM (SELECT v, "
         f"{seeded_sm64_cols('v', seed, 'hs', 'a')} "
         f"FROM {_values_rel(vals)})")
    assert np.array_equal(_col(con, q), hash64(vals, seed=seed))


def test_seeded_requires_nonzero_seed():
    with pytest.raises(ValueError):
        seeded_sm64_cols("v", 0, "h", "a")


def test_splitmix64_const_matches_numpy():
    for s in (1, 7, 11, 12, 13, 2**63):
        assert splitmix64_const(s) == int(splitmix64(np.uint64(s)))


@pytest.mark.parametrize("p", [4, 6, 12, 14])
def test_hll_register_cols_match_kernel_codes(con, p):
    from sgp_sketch.kernels.hll import HLL

    vals = _edge_values()
    rows = con.execute(
        f"SELECT v, idx, rank FROM (SELECT v, {hll_register_cols('v', p)} "
        f"FROM {_values_rel(vals)}) ORDER BY v").fetchall()
    got = {int(r[0]): (r[1], r[2]) for r in rows}
    codes = HLL(p=p)._codes_from_hashes(vals)
    for v, code in zip(vals, codes):
        assert got[int(v)] == (int(code) >> 6, int(code) & 63)


def test_md5_token_sql_matches_python(con):
    words = ["hello", "absent:0", "42", "", "Ünïcode-ø", "a" * 100]
    for w in words:
        got = con.execute("SELECT " + md5_token_sql("?"), [w]).fetchone()[0]
        exp = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
        assert int(got) == exp, w
        assert 0 <= exp < 2**60  # non-negative in int64 on the Spark side


def test_cms_nonconservative_is_exact_cell_sum_and_order_free():
    from sgp_sketch.kernels.cms import CMS

    rng = np.random.default_rng(3)
    toks = rng.integers(0, 2**60, size=300, dtype=np.int64)
    cnts = rng.integers(1, 50, size=300, dtype=np.int64)
    h = hash64(toks.astype(np.uint64))

    a = CMS(depth=4, width=64, conservative=False)
    a.update_hashes(h, counts=cnts)
    # split into 3 chunks in a different order → identical table
    b = CMS(depth=4, width=64, conservative=False)
    for sl in (slice(200, 300), slice(0, 100), slice(100, 200)):
        b.update_hashes(h[sl], counts=cnts[sl])
    assert np.array_equal(a.table, b.table)
    assert a.to_bytes() == b.to_bytes()
    # every cell is the plain sum of colliding counts
    cols = a._rows(h)
    for j in range(4):
        exp = np.zeros(64, dtype=np.int64)
        np.add.at(exp, cols[j], cnts)
        assert np.array_equal(a.table[j], exp)
    # conservative ordering-dependence is the reason the flag exists:
    # estimates must still upper-bound the truth in both modes
    cons = CMS(depth=4, width=64)  # default conservative
    cons.update_hashes(h, counts=cnts)
    est_c = cons.estimate_hashes(h)
    est_n = a.estimate_hashes(h)
    assert np.all(est_c >= cnts) and np.all(est_n >= cnts)
    assert np.all(est_n >= est_c)  # CU never exceeds the plain sums


def test_cms_conservative_flag_not_serialized():
    from sgp_sketch.kernels.cms import CMS

    c = CMS(depth=2, width=32, conservative=False)
    c.update_hashes(hash64(np.arange(10, dtype=np.uint64)))
    back = CMS.from_bytes(c.to_bytes())
    assert back.conservative is True  # documented: policy, not state
    assert np.array_equal(back.table, c.table)


def test_cms_merge_propagates_update_policy():
    """merge keeps non-conservative ONLY when both inputs are — one
    CU-updated input already broke the plain-sum invariant."""
    from sgp_sketch.kernels.cms import CMS

    nc = lambda: CMS(depth=2, width=32, conservative=False)  # noqa: E731
    cu = lambda: CMS(depth=2, width=32)  # noqa: E731
    assert nc().merge(nc()).conservative is False
    assert nc().merge(cu()).conservative is True
    assert cu().merge(nc()).conservative is True
    assert cu().merge(cu()).conservative is True
    # and the non-conservative merged state keeps accepting plain-sum
    # updates without an explicit override
    m = nc().merge(nc())
    h = hash64(np.arange(50, dtype=np.uint64))
    m.update_hashes(h, counts=np.full(50, 3, dtype=np.int64))
    cols = m._rows(h)
    exp = np.zeros(32, dtype=np.int64)
    np.add.at(exp, cols[0], np.full(50, 3, dtype=np.int64))
    assert np.array_equal(m.table[0], exp)


def test_bloom_positions_replay(con):
    """The Bloom oracle's position math (block, h1 + i*(h2|1) double
    hashing) re-derives kernels/bloom.py:_positions exactly."""
    from sgp_sketch.kernels.bloom import Bloom

    rng = np.random.default_rng(5)
    toks = rng.integers(0, 2**60, size=200, dtype=np.uint64)
    h = hash64(toks)
    flt = Bloom(n_blocks=1024, k=8, seed=11)
    widx, masks = flt._positions(h)
    bits = np.log2(masks.astype(np.float64)).astype(np.int64)

    q = f"""
    WITH base AS (SELECT v, {sm64_cols('v', 'h', 'qa')}
                  FROM {_values_rel(toks)}),
    s1 AS (SELECT v, h, {seeded_sm64_cols('h', 11, 'hb', 'qb')} FROM base),
    s2 AS (SELECT v, h, hb, {seeded_sm64_cols('h', 12, 'h1', 'qc')} FROM s1),
    s3 AS (SELECT v, hb, h1, {seeded_sm64_cols('h', 13, 'h2r', 'qd')} FROM s2)
    SELECT v, i, block + pos // 64 AS widx, pos % 64 AS bit FROM (
        SELECT v, i, (hb % 1024) * 8 AS block,
               (h1 + i * (CASE WHEN h2r % 2 = 0 THEN h2r + 1 ELSE h2r END))
               % 512 AS pos
        FROM s3 CROSS JOIN range(8) AS kk(i))
    ORDER BY v, i
    """
    got = {(int(r[0]), int(r[1])): (int(r[2]), int(r[3]))
           for r in con.execute(q).fetchall()}
    for n, t in enumerate(toks):
        for i in range(8):
            assert got[(int(t), i)] == (int(widx[i, n]), int(bits[i, n]))


def test_minhash_lane_seeds_match_kernel():
    """The oracle's 16 lane constants equal dedup.minhash_batch's seeds:
    splitmix64((i+1) * GOLDEN) for 0-based lane i."""
    from sgp_sketch.kernels.hashing import GOLDEN
    from sgp_sketch.oracle_replay import GOLDEN_CONST

    assert GOLDEN_CONST == int(GOLDEN)
    k = 16
    kernel_seeds = splitmix64(np.arange(1, k + 1, dtype=np.uint64) * GOLDEN)
    oracle_seeds = [splitmix64_const(((i + 1) * GOLDEN_CONST) % 2**64)
                    for i in range(k)]
    assert oracle_seeds == [int(s) for s in kernel_seeds]


def test_minhash_simhash_sql_replay_small(con):
    """End-to-end kernel-vs-SQL on a tiny in-memory doc set: minhash lanes
    and simhash bit-majorities re-derived with the same SQL shapes the
    oracles use (the full table run is contract-gated)."""
    from sgp_sketch.dedup import minhash_batch, simhash_batch
    from sgp_sketch.kernels.hashing import GOLDEN
    from sgp_sketch.oracle_replay import GOLDEN_CONST

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 2**60, size=n, dtype=np.int64)
            for n in (1, 5, 17, 40)]
    k = 4
    mh = minhash_batch(docs, k=k)           # (4, k) uint64
    sh = simhash_batch(docs)                # (4,) uint64

    rel = "(VALUES " + ", ".join(
        f"({d}, CAST({int(t)} AS HUGEINT))"
        for d, arr in enumerate(docs) for t in arr) + ") AS t(doc, v)"
    seeds = [splitmix64_const(((i + 1) * GOLDEN_CONST) % 2**64)
             for i in range(k)]
    whens = " ".join(f"WHEN {i} THEN CAST({s} AS HUGEINT)"
                     for i, s in enumerate(seeds[:-1]))
    lane_case = f"CASE lane {whens} ELSE CAST({seeds[-1]} AS HUGEINT) END"
    q = f"""
    WITH lanes AS (SELECT i AS lane FROM range({k}) AS r(i)),
    hh AS (SELECT doc, lane, {sm64_cols(f'xor(v, {lane_case})', 'h', 'a')}
           FROM {rel} CROSS JOIN lanes)
    SELECT doc, lane, MIN(h) FROM hh GROUP BY 1, 2 ORDER BY 1, 2
    """
    for doc, lane, got in con.execute(q).fetchall():
        assert int(got) == int(mh[doc, lane]), (doc, lane)

    q2 = f"""
    WITH h AS (SELECT doc, {sm64_cols('v', 'h', 'a')} FROM {rel}),
    n AS (SELECT doc, COUNT(*) AS ntok FROM h GROUP BY 1),
    lanes AS (SELECT i AS b, CAST(power(2, i) AS HUGEINT) AS p2
              FROM range(64) AS r(i)),
    bits AS (SELECT doc, b, p2, SUM((h // p2) % 2) AS ones
             FROM h CROSS JOIN lanes GROUP BY 1, 2, 3),
    fp AS (SELECT bits.doc,
                  SUM(CASE WHEN ones * 2 > n.ntok THEN p2
                      ELSE CAST(0 AS HUGEINT) END) AS f
           FROM bits JOIN n ON n.doc = bits.doc GROUP BY 1)
    SELECT doc, f FROM fp ORDER BY doc
    """
    for doc, got in con.execute(q2).fetchall():
        assert int(got) == int(sh[doc]), doc


def test_theta_algebra_order_statistic_model():
    """The theta_algebra_replay oracle models each group's final state as
    order statistics of the whole hash set (retained = k smallest, theta
    = (k+1)-th) regardless of build partitioning, and pair algebra as
    plain set ops below min-theta with a union re-trim. Pin that model
    against the kernel built through an arbitrary chunked merge tree."""
    from sgp_sketch.kernels.theta import Theta

    rng = np.random.default_rng(13)
    k = 32
    a_vals = splitmix64(rng.integers(0, 2**60, size=300, dtype=np.uint64))
    b_vals = splitmix64(np.concatenate([
        rng.integers(0, 2**60, size=150, dtype=np.uint64),
        rng.integers(0, 2**60, size=100, dtype=np.uint64)]))
    # share some hashes so the intersection is non-trivial
    b_vals[:40] = a_vals[:40]

    def build_chunked(vals, chunks):
        parts = []
        for sl in np.array_split(vals, chunks):
            t = Theta(k=k)
            t.update_hashes(sl)
            parts.append(t)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        return acc

    a = build_chunked(a_vals, 7)
    b = build_chunked(b_vals, 3)

    # group model: retained = k smallest uniques, theta = (k+1)-th
    ua, ub = np.unique(a_vals), np.unique(b_vals)
    assert np.array_equal(a.retained, ua[:k]) and int(a.theta) == int(ua[k])
    assert np.array_equal(b.retained, ub[:k]) and int(b.theta) == int(ub[k])

    thm = min(int(a.theta), int(b.theta))
    ra = ua[:k][ua[:k] < thm]
    rb = ub[:k]
    # intersect / a_not_b: set ops below thm (b side unfiltered)
    assert int(a.intersect(b).retained.size) == \
        np.intersect1d(ra, rb).size
    assert int(a.a_not_b(b).retained.size) == \
        np.setdiff1d(ra, rb).size
    # union: re-trim to (k+1)-th smallest of the filtered union
    u = np.union1d(ra, rb[rb < thm])
    m = a.merge(b)
    if u.size > k:
        assert int(m.retained.size) == k and int(m.theta) == int(u[k])
    else:
        assert int(m.retained.size) == u.size and int(m.theta) == thm
    # estimates are the single division the oracle replays
    assert float(m.estimate()) == m.retained.size / (float(m.theta) / 2**64)


# ---------------------------------------------- t-digest centroid replay

def _tdigest_rows(docs, src_delta=10.0, merge_delta=100.0):
    """Pure-pandas replica of q_tdigest_centroid_replay's Spark side."""
    from sgp_sketch.kernels.tdigest import TDigest

    def emit(scope, td):
        rows = [(scope, "stat", 0, float(td.n)),
                (scope, "stat", 1, td.vmin), (scope, "stat", 2, td.vmax)]
        rows += [(scope, "mean", i, float(m))
                 for i, m in enumerate(td.means)]
        rows += [(scope, "weight", i, float(w))
                 for i, w in enumerate(td.weights)]
        return rows

    out = []
    for src, g in docs.groupby("source"):
        out += emit(src, TDigest(src_delta).update(
            g["n_chars"].to_numpy(np.float64)))
    halves = {}
    for par, scope in ((0, "__evens__"), (1, "__odds__")):
        g = docs[docs["doc_id"] % 2 == par]
        halves[scope] = TDigest(merge_delta).update(
            g["n_chars"].to_numpy(np.float64))
        out += emit(scope, halves[scope])
    out += emit("__merged__", halves["__evens__"].merge(halves["__odds__"]))
    return out


def test_tdigest_centroid_replay_oracle_matches_kernel():
    """End-to-end (no Spark): the DuckDB oracle re-derives the kernel's
    exact centroid state — per-source builds, the evens/odds builds, and
    the merge() fold — on a synthetic integer documents table."""
    import pandas as pd

    from sgp_sketch.oracle_replay import tdigest_centroid_replay_sql

    rng = np.random.default_rng(11)
    n = 600
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": rng.integers(40, 560, size=n).astype(np.int64),
    })
    c = duckdb.connect()
    c.register("documents", docs)
    got = c.execute(tdigest_centroid_replay_sql()).df()
    exp = (pd.DataFrame(_tdigest_rows(docs),
                        columns=["scope", "fam", "idx", "val"])
           .sort_values(["scope", "fam", "idx"]).reset_index(drop=True))
    got = got.sort_values(["scope", "fam", "idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["scope"] == exp["scope"]).all()
    assert (got["fam"] == exp["fam"]).all()
    assert (got["idx"].to_numpy() == exp["idx"].to_numpy()).all()
    # integer inputs keep single-batch sums exact; merged-leg weighted
    # means carry only summation-order noise (<< the driver's 6dp)
    np.testing.assert_allclose(got["val"].to_numpy(),
                               exp["val"].to_numpy(), rtol=0, atol=1e-9)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_tdigest_asin_bucket_boundary_margin(sf):
    """Pins the numeric-safety claim in tdigest_centroid_replay_sql: the
    only cross-engine drift is asin (<= 2 ulp ~ 3e-15 on k(q)); a floor
    bucket can flip only within that distance of an integer. Assert the
    real data's mid-rank k(q) grids stay >= 1e-9 away for every scope
    and both deltas (measured margins are ~1e-5)."""
    import os

    import pandas as pd

    path = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata scale absent")
    docs = pd.read_parquet(path, columns=["doc_id", "source", "n_chars"])
    grids = [len(g) for _, g in docs.groupby("source")]
    grids += [(docs["doc_id"] % 2 == 0).sum(),
              (docs["doc_id"] % 2 == 1).sum()]
    worst = 1.0
    for delta, ns in ((10.0, grids), (100.0, grids)):
        for n in ns:
            i = np.arange(1, n + 1, dtype=np.float64)
            x = 2 * ((i - 0.5) / n) - 1
            kq = (delta / (2 * np.pi)) * np.arcsin(x)
            d = np.abs(kq - np.round(kq))
            # an odd-count group's middle element sits exactly at q=0.5:
            # x == 0.0 bit-exactly, and asin(0.0) == 0.0 in every
            # implementation — an exact hit, not a near-boundary risk
            d = d[x != 0.0]
            if d.size:
                worst = min(worst, float(d.min()))
    assert worst >= 1e-9, worst


# ---------------------------------------------- KLL compactor replay

def _kll_rows(docs, k=16):
    """Pure-pandas replica of q_kll_compactor_replay's Spark side."""
    import pandas as pd

    from sgp_sketch.kernels.kll import KLL
    from sgp_sketch.oracle_replay import KLL_FOLD_SOURCES

    def emit(scope, kll):
        rows = []
        for lvl, arr in enumerate(kll.levels):
            rows += [(scope, "item", lvl, slot, float(v))
                     for slot, v in enumerate(np.sort(arr))]
        rows += [(scope, "stat", k1, 0, v) for k1, v in enumerate(
            [float(kll.flips), float(len(kll.levels)), float(kll.n),
             kll.vmin, kll.vmax])]
        return rows

    out, per = [], {}
    for src, g in docs.groupby("source"):
        per[src] = KLL(k).update(g["n_chars"].to_numpy(np.float64))
        out += emit(src, per[src])
    acc = None
    for src in KLL_FOLD_SOURCES:
        if src not in per:
            continue
        acc = per[src] if acc is None else acc.merge(per[src])
    out += emit("__merged__", acc)
    return pd.DataFrame(out, columns=["scope", "fam", "k1", "k2", "val"])


@pytest.mark.parametrize("n", [60, 500, 5000, 50000])
def test_kll_compactor_replay_oracle_matches_kernel(n):
    """End-to-end (no Spark): the DuckDB oracle re-derives the kernel's
    exact compactor state — per-source single-batch closed form AND the
    generic unrolled compress steps of the fixed-order merge fold — at
    sizes bracketing sf0.001..beyond-sf0.1 per-source counts. A fold
    needing more than the unrolled iters_per_fold=4 compress steps would
    surface here as a value mismatch, not silence."""
    import pandas as pd

    from sgp_sketch.oracle_replay import kll_compactor_replay_sql

    rng = np.random.default_rng(17)
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": rng.integers(40, 560, size=n).astype(np.int64)})
    c = duckdb.connect()
    c.register("documents", docs)
    got = (c.execute(kll_compactor_replay_sql()).df()
           .sort_values(["scope", "fam", "k1", "k2"])
           .reset_index(drop=True))
    exp = (_kll_rows(docs).sort_values(["scope", "fam", "k1", "k2"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("scope", "fam", "k1", "k2"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    # values are integer n_chars carried verbatim — exact equality
    assert (got["val"].to_numpy() == exp["val"].to_numpy()).all()


def test_tdigest_merged_leg_boundary_margin():
    """Finding from review: the single-batch margin test leaves the
    MERGED-leg compress grid (cum - w/2)/tot unmeasured. Pin it too, on
    the real data at every available sf: build the evens/odds digests
    with the kernel, form the concat grid exactly as the oracle's mr/mb
    CTEs do, and assert k(q) stays >= 1e-9 from every floor boundary
    (exact x == 0 hits excluded, as before)."""
    import os

    import pandas as pd

    from sgp_sketch.kernels.tdigest import TDigest

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        docs = pd.read_parquet(path, columns=["doc_id", "n_chars"])
        halves = [TDigest(100.0).update(
            docs[docs["doc_id"] % 2 == p]["n_chars"]
            .to_numpy(np.float64)) for p in (0, 1)]
        w = np.concatenate([halves[0].weights, halves[1].weights])
        m = np.concatenate([halves[0].means, halves[1].means])
        part = np.concatenate([np.zeros(halves[0].means.size),
                               np.ones(halves[1].means.size)])
        idx = np.concatenate([np.arange(halves[0].means.size),
                              np.arange(halves[1].means.size)])
        order = np.lexsort((idx, part, m))     # ORDER BY mean, part, idx
        w = w[order]
        cum = np.cumsum(w)
        x = 2.0 * ((cum - w / 2.0) / cum[-1]) - 1.0
        kq = (100.0 / (2 * np.pi)) * np.arcsin(np.clip(x, -1, 1))
        d = np.abs(kq - np.round(kq))
        d = d[x != 0.0]
        if d.size:
            assert float(d.min()) >= 1e-9, (sf, float(d.min()))
        checked += 1
    assert checked, "no testdata scale available"


def _md5tok(w):
    import hashlib
    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)


def test_mg_fold_replay_oracle_matches_kernel():
    """End-to-end (no Spark): mg_fold_replay_sql re-derives the kernel's
    exact per-source Misra-Gries summaries AND the fixed-order fold —
    including threshold subtractions with real evictions (vocab >> k) and
    sources missing from the data (src19 absent)."""
    import pandas as pd

    from sgp_sketch.kernels.mg import MG
    from sgp_sketch.oracle_replay import (MG_REPLAY_SOURCES,
                                          mg_fold_replay_sql)

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for s in range(19):                      # src19 deliberately absent
        for d in range(12):
            words = rng.choice(vocab, size=40)
            rows.append((f"src{s}", " ".join(words)))
    docs = pd.DataFrame(rows, columns=["source", "text"])

    per = {}
    out = []
    for src, g in docs.groupby("source"):
        toks = {}
        for t in g["text"]:
            for w in t.split(" "):
                k = _md5tok(w)
                toks[k] = toks.get(k, 0) + 1
        st = MG(16).update(np.array(list(toks), dtype=np.int64),
                           np.array(list(toks.values()), dtype=np.int64))
        per[src] = st
        out.append((src, -1, -1, st.dec, st.n_items))
        out += [(src, int(k), int(c), st.dec, st.n_items)
                for k, c in zip(st.keys, st.counts)]
    merged = MG(16)
    for src in MG_REPLAY_SOURCES:
        if src in per:
            merged = merged.merge(per[src])
    out.append(("__merged__", -1, -1, merged.dec, merged.n_items))
    out += [("__merged__", int(k), int(c), merged.dec, merged.n_items)
            for k, c in zip(merged.keys, merged.counts)]
    exp = (pd.DataFrame(out, columns=["scope", "token", "cnt", "dec",
                                      "n_items"])
           .sort_values(["scope", "token"]).reset_index(drop=True))

    c = duckdb.connect()
    c.register("documents", docs)
    got = (c.execute(mg_fold_replay_sql()).df()
           .sort_values(["scope", "token"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for col in exp.columns:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_cms_cu_replay_oracle_matches_kernel():
    """End-to-end (no Spark): cms_cu_replay_sql re-derives the kernel's
    conservative-update cell table and min-over-lanes estimates under
    the fixed two-phase schedule, with enough users per type (300 >> 64
    cells) that real cell sharing and cross-phase reads occur."""
    import pandas as pd

    from sgp_sketch.kernels.cms import CMS
    from sgp_sketch.oracle_replay import cms_cu_replay_sql

    rng = np.random.default_rng(29)
    n = 4000
    events = pd.DataFrame({
        "event_type": rng.choice(["click", "view", "buy"], size=n),
        "user_id": rng.integers(1, 300, size=n).astype(np.int64),
    })
    out = []
    for grp, g in events.groupby("event_type"):
        cnts = g.groupby("user_id").size()
        toks = np.array([_md5tok(str(u)) for u in cnts.index],
                        dtype=np.int64)
        counts = cnts.to_numpy(np.int64)
        phase = toks % 2
        cm = CMS(depth=4, width=64, seed=7, conservative=True)
        for ph in (0, 1):
            m = phase == ph
            if m.any():
                cm.update_hashes(hash64(toks[m].astype(np.uint64)),
                                 counts=counts[m])
        out += [(grp, "cell", j, cpos, int(cm.table[j, cpos]))
                for j in range(4) for cpos in range(64)]
        ests = cm.estimate_hashes(hash64(toks.astype(np.uint64)))
        out += [(grp, "est", int(t), int(p), int(e))
                for t, p, e in zip(toks, phase, ests)]
    exp = (pd.DataFrame(out, columns=["grp", "fam", "k1", "k2", "val"])
           .sort_values(["grp", "fam", "k1", "k2"])
           .reset_index(drop=True))

    c = duckdb.connect()
    c.register("events", events)
    got = (c.execute(cms_cu_replay_sql()).df()
           .sort_values(["grp", "fam", "k1", "k2"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in exp.columns:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


@pytest.mark.parametrize("seed", [3, 7, 31, 101])
def test_mg_fold_replay_oracle_random_corpora(seed):
    """Seed sweep over corpus shapes for the MG fold oracle: varying
    vocab size (some below k=16 — no eviction — some far above), doc
    counts, and a random subset of sources present. Catches threshold
    edge cases (exact k+1 ties, all-evicted sources) the single fixed
    corpus cannot."""
    import pandas as pd

    from sgp_sketch.kernels.mg import MG
    from sgp_sketch.oracle_replay import (MG_REPLAY_SOURCES,
                                          mg_fold_replay_sql)

    rng = np.random.default_rng(seed)
    vocab_n = int(rng.integers(8, 200))
    vocab = [f"w{i}" for i in range(vocab_n)]
    present = rng.choice(20, size=int(rng.integers(2, 20)), replace=False)
    rows = []
    for s in present:
        for d in range(int(rng.integers(1, 15))):
            rows.append((f"src{s}",
                         " ".join(rng.choice(vocab, size=int(
                             rng.integers(1, 60))))))
    docs = pd.DataFrame(rows, columns=["source", "text"])

    per, out = {}, []
    for src, g in docs.groupby("source"):
        toks = {}
        for t in g["text"]:
            for w in t.split(" "):
                kk = _md5tok(w)
                toks[kk] = toks.get(kk, 0) + 1
        st = MG(16).update(np.array(list(toks), dtype=np.int64),
                           np.array(list(toks.values()), dtype=np.int64))
        per[src] = st
        out.append((src, -1, -1, st.dec, st.n_items))
        out += [(src, int(kk), int(cc), st.dec, st.n_items)
                for kk, cc in zip(st.keys, st.counts)]
    merged = MG(16)
    for src in MG_REPLAY_SOURCES:
        if src in per:
            merged = merged.merge(per[src])
    out.append(("__merged__", -1, -1, merged.dec, merged.n_items))
    out += [("__merged__", int(kk), int(cc), merged.dec, merged.n_items)
            for kk, cc in zip(merged.keys, merged.counts)]
    exp = (pd.DataFrame(out, columns=["scope", "token", "cnt", "dec",
                                      "n_items"])
           .sort_values(["scope", "token"]).reset_index(drop=True))

    c = duckdb.connect()
    c.register("documents", docs)
    got = (c.execute(mg_fold_replay_sql()).df()
           .sort_values(["scope", "token"]).reset_index(drop=True))
    assert len(got) == len(exp), (len(got), len(exp))
    for col in exp.columns:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


@pytest.mark.parametrize("seed", [5, 13, 47])
def test_kll_compactor_replay_oracle_random_shapes(seed):
    """Seed sweep for the KLL oracle: random per-source sizes (1-row
    sources, power-of-two boundaries, sources absent from the fold set)
    so the closed-form s* CASE and the fold's no-op/compress branches
    all fire."""
    import pandas as pd

    from sgp_sketch.oracle_replay import kll_compactor_replay_sql

    rng = np.random.default_rng(seed)
    rows = []
    present = rng.choice(20, size=int(rng.integers(3, 20)), replace=False)
    for s in present:
        n = int(rng.choice([1, 2, 8, 16, 17, 32, 64, 100,
                            int(rng.integers(1, 700))]))
        for v in rng.integers(40, 560, size=n):
            rows.append((len(rows), f"src{s}", int(v)))
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])

    c = duckdb.connect()
    c.register("documents", docs)
    got = (c.execute(kll_compactor_replay_sql()).df()
           .sort_values(["scope", "fam", "k1", "k2"])
           .reset_index(drop=True))
    exp = (_kll_rows(docs).sort_values(["scope", "fam", "k1", "k2"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("scope", "fam", "k1", "k2"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (got["val"].to_numpy() == exp["val"].to_numpy()).all()


@pytest.mark.parametrize("seed", [2, 19, 71])
def test_tdigest_centroid_replay_oracle_random_shapes(seed):
    """Seed sweep for the t-digest oracle (symmetric with the MG/KLL
    sweeps): random doc counts, value ranges, and missing sources —
    single-batch clustering, the evens/odds legs and the kernel merge()
    all re-derived by the same static SQL."""
    import pandas as pd

    from sgp_sketch.oracle_replay import tdigest_centroid_replay_sql

    rng = np.random.default_rng(seed)
    rows = []
    present = rng.choice(20, size=int(rng.integers(2, 20)), replace=False)
    for s in present:
        n = int(rng.integers(1, 120))
        for v in rng.integers(1, int(rng.integers(10, 3000)), size=n):
            rows.append((len(rows), f"src{s}", int(v)))
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])

    c = duckdb.connect()
    c.register("documents", docs)
    got = (c.execute(tdigest_centroid_replay_sql()).df()
           .sort_values(["scope", "fam", "idx"]).reset_index(drop=True))
    exp = (pd.DataFrame(_tdigest_rows(docs),
                        columns=["scope", "fam", "idx", "val"])
           .sort_values(["scope", "fam", "idx"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("scope", "fam", "idx"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    np.testing.assert_allclose(got["val"].to_numpy(),
                               exp["val"].to_numpy(), rtol=0, atol=1e-9)


# ------------------------------------------------ xxHash64 (Spark) replay

def _rng_ascii(rng, lo=0, hi=31):
    chars = np.array(list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 _-.!~'|,:/"))
    n = int(rng.integers(lo, hi + 1))
    return "".join(rng.choice(chars, size=n))


def test_xxh64_long_sql_matches_python_ref(con):
    """Every signed-long magnitude class through the SQL chain equals the
    scalar Python reference (itself Spark-parity-gated below)."""
    from sgp_sketch.oracle_replay import xxh64_long_const, xxh64_long_sql

    rng = np.random.default_rng(13)
    vals = ([0, 1, -1, 42, 2**31, -(2**31), 2**63 - 1, -(2**63)]
            + [int(v) for v in
               rng.integers(-2**63, 2**63, size=400, dtype=np.int64)])
    rel = ("SELECT v FROM (VALUES "
           + ", ".join(f"(CAST({v} AS BIGINT))" for v in vals) + ") AS t(v)")
    got = {int(v): int(h) for v, h in
           con.execute(xxh64_long_sql(rel, "v", ["v"])).fetchall()}
    for v in vals:
        assert got[v] == xxh64_long_const(v), v


def test_xxh64_str_sql_matches_python_ref(con):
    """Every byte length 0..127 (all stripe/4-byte/byte-tail branch
    combinations AND 1-3 four-accumulator 32-byte blocks) through the
    SQL chain equals the scalar reference."""
    from sgp_sketch.oracle_replay import xxh64_ascii_const, xxh64_str_sql

    rng = np.random.default_rng(17)
    strs = [""] + [_rng_ascii(rng, L, L) for L in range(128)
                   for _ in range(3)]
    rel = ("SELECT s FROM (VALUES "
           + ", ".join("('" + s.replace("'", "''") + "')" for s in strs)
           + ") AS t(s)")
    rows = con.execute(xxh64_str_sql(rel, "s", ["s"],
                                     max_len=127)).fetchall()
    assert len(rows) == len(strs)
    for s, h in rows:
        assert int(h) == xxh64_ascii_const(s), repr(s)


def test_xxh64_str_sql_seed_expression(con):
    """Per-row seed columns (Spark's multi-column xxhash64 chaining — the
    banded-LSH bucket-id shape) match the scalar reference for every
    length class and seed magnitude."""
    from sgp_sketch.oracle_replay import xxh64_ascii_const, xxh64_str_sql

    rng = np.random.default_rng(19)
    seeds = [0, 1, 42, 2**63 - 1, 2**64 - 1, 12345678901234567]
    rows_in = [(_rng_ascii(rng, L, L), sd)
               for L in range(0, 128, 7) for sd in seeds]
    rel = ("SELECT s, sd FROM (VALUES " + ", ".join(
        "('" + s.replace("'", "''") + f"', CAST({sd} AS HUGEINT))"
        for s, sd in rows_in) + ") AS t(s, sd)")
    q = xxh64_str_sql(rel, "s", ["s", "sd"], out="hh", prefix="y_",
                      max_len=127, seed="sd")
    rows = con.execute(q).fetchall()
    assert len(rows) == len(rows_in)
    for s, sd, h in rows:
        assert int(h) == xxh64_ascii_const(s, seed=int(sd)), (repr(s), sd)


def test_xxh64_str_sql_loud_guards(con):
    """Silent-wrong-answer inputs must error, not hash: non-ASCII (substr
    is per-character) and byte length > max_len (missing stripes)."""
    from sgp_sketch.oracle_replay import xxh64_str_sql

    with pytest.raises(Exception, match="xxh64_str_sql"):
        con.execute(xxh64_str_sql("SELECT 'é' AS s", "s", ["s"])).fetchall()
    with pytest.raises(Exception, match="xxh64_str_sql"):
        con.execute(xxh64_str_sql(f"SELECT '{'x' * 9}' AS s", "s", ["s"],
                                  max_len=8)).fetchall()
    with pytest.raises(ValueError):
        xxh64_str_sql("SELECT 'a' AS s", "s", ["s"], max_len=128)


def test_xxh64_ascii_const_accumulator_loop_lengths():
    """The scalar reference's >= 32-byte four-accumulator path is
    Spark-parity-gated in tests/test_xxh64_spark_parity.py; here pin the
    branch boundaries are all exercised without error and distinct."""
    from sgp_sketch.oracle_replay import xxh64_ascii_const

    hs = {n: xxh64_ascii_const("x" * n) for n in
          (0, 1, 31, 32, 33, 63, 64, 95, 96, 127, 200)}
    assert len(set(hs.values())) == len(hs)
