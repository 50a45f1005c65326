"""Property-based tests (hypothesis, seeded) — SURVEY.md §5.2.2.

The load-bearing invariants for distributed execution:
  * merge associativity/commutativity (byte-equal for HLL/CMS/Bloom whose
    merges are register-max / cell-sum / bit-or; bound-equal for KLL/t-digest)
  * identity: merge(a, empty) == a
  * chunking invariance: build-from-one-batch == build-from-chunks-then-merge
    — this is exactly what makes arbitrary Spark partitioning safe.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sgp_sketch.kernels import bloom, cms, hll, kll, registry, tdigest

SETTINGS = dict(max_examples=25, deadline=None)

u64_arrays = st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=500).map(
    lambda xs: np.array(xs, dtype=np.uint64))
f64_arrays = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False), min_size=0, max_size=500).map(
    lambda xs: np.array(xs, dtype=np.float64))


# --------------------------------------------------- byte-stable sketches

@given(a=u64_arrays, b=u64_arrays, c=u64_arrays)
@settings(**SETTINGS)
def test_hll_merge_associative_commutative_bytes(a, b, c):
    mk = lambda v: hll.HLL(p=8).update(v)
    ha, hb, hc = mk(a), mk(b), mk(c)
    left = ha.merge(hb).merge(hc)
    right = ha.merge(hb.merge(hc))
    assert left.to_bytes() == right.to_bytes()
    assert ha.merge(hb).to_bytes() == hb.merge(ha).to_bytes()
    assert ha.merge(hll.HLL(p=8)).to_bytes() == ha.to_bytes()


@given(a=u64_arrays, b=u64_arrays, c=u64_arrays)
@settings(**SETTINGS)
def test_cms_merge_associative_commutative_bytes(a, b, c):
    mk = lambda v: cms.CMS(depth=3, width=256).update(v)
    sa, sb, sc = mk(a), mk(b), mk(c)
    assert sa.merge(sb).merge(sc).to_bytes() == sa.merge(sb.merge(sc)).to_bytes()
    assert sa.merge(sb).to_bytes() == sb.merge(sa).to_bytes()
    assert sa.merge(cms.CMS(depth=3, width=256)).to_bytes() == sa.to_bytes()


@given(a=u64_arrays, b=u64_arrays, c=u64_arrays)
@settings(**SETTINGS)
def test_bloom_merge_associative_commutative_bytes(a, b, c):
    mk = lambda v: bloom.Bloom(n_blocks=32).update(v)
    ba, bb, bc = mk(a), mk(b), mk(c)
    assert ba.merge(bb).merge(bc).to_bytes() == ba.merge(bb.merge(bc)).to_bytes()
    assert ba.merge(bb).to_bytes() == bb.merge(ba).to_bytes()
    assert ba.merge(bloom.Bloom(n_blocks=32)).to_bytes() == ba.to_bytes()
    # idempotence
    assert ba.merge(ba).words.tobytes() == ba.words.tobytes()


# --------------------------------------------------- chunking invariance

@given(v=u64_arrays, splits=st.lists(st.integers(0, 500), max_size=4))
@settings(**SETTINGS)
def test_hll_chunking_invariance(v, splits):
    whole = hll.HLL(p=8).update(v)
    parts = np.split(v, sorted(s % (len(v) + 1) for s in splits))
    acc = hll.HLL(p=8)
    for part in parts:
        acc = acc.merge(hll.HLL(p=8).update(part))
    assert acc.to_bytes() == whole.to_bytes()


@given(v=u64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_bloom_chunking_invariance(v, cut):
    cut = cut % (len(v) + 1)
    whole = bloom.Bloom(n_blocks=32).update(v)
    merged = bloom.Bloom(n_blocks=32).update(v[:cut]).merge(
        bloom.Bloom(n_blocks=32).update(v[cut:]))
    assert merged.words.tobytes() == whole.words.tobytes()


@given(v=u64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_cms_chunked_never_underestimates(v, cut):
    # CU at batch granularity: chunked builds may differ in bytes but must
    # still never underestimate any item's true count.
    cut = cut % (len(v) + 1)
    merged = cms.CMS(depth=3, width=256).update(v[:cut]).merge(
        cms.CMS(depth=3, width=256).update(v[cut:]))
    if len(v):
        uniq, counts = np.unique(v, return_counts=True)
        assert (merged.estimate(uniq) >= counts).all()


# --------------------------------------------------- bound-stable sketches

@given(a=f64_arrays, b=f64_arrays)
@settings(**SETTINGS)
def test_kll_merge_weight_conservation(a, b):
    ka = kll.KLL(k=64).update(a)
    kb = kll.KLL(k=64).update(b)
    m = ka.merge(kb)
    assert m.n == len(a) + len(b)
    if len(a) + len(b):
        total_w = sum(arr.size * (1 << i) for i, arr in enumerate(m.levels))
        assert total_w == len(a) + len(b)
        allv = np.concatenate([a, b])
        assert m.quantiles([0.0])[0] == allv.min()
        assert m.quantiles([1.0])[0] == allv.max()


@given(a=f64_arrays, b=f64_arrays)
@settings(**SETTINGS)
def test_tdigest_merge_weight_conservation(a, b):
    ta = tdigest.TDigest(delta=50).update(a)
    tb = tdigest.TDigest(delta=50).update(b)
    m = ta.merge(tb)
    assert m.n == len(a) + len(b)
    if len(a) + len(b):
        assert abs(m.weights.sum() - (len(a) + len(b))) < 1e-6
        allv = np.concatenate([a, b])
        assert m.vmin == allv.min() and m.vmax == allv.max()
        # quantile estimates stay inside [min, max]
        qs = m.quantiles(np.linspace(0, 1, 11))
        assert (qs >= m.vmin - 1e-9).all() and (qs <= m.vmax + 1e-9).all()


@given(v=f64_arrays)
@settings(**SETTINGS)
def test_kll_serde_identity(v):
    k = kll.KLL(k=64).update(v)
    assert kll.KLL.from_bytes(k.to_bytes()).to_bytes() == k.to_bytes()


@given(v=f64_arrays)
@settings(**SETTINGS)
def test_tdigest_serde_identity(v):
    t = tdigest.TDigest(delta=50).update(v)
    assert tdigest.TDigest.from_bytes(t.to_bytes()).to_bytes() == t.to_bytes()


@given(st.integers(0, 10**6), st.sampled_from(["hll", "cms", "bloom"]))
@settings(max_examples=20, deadline=None)
def test_merge_identity(seed, kind):
    """merge(a, empty) == a byte-exactly for the byte-stable kinds
    (SURVEY §5.2.2 identity law)."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 40, size=500).astype(np.int64)
    a = registry.make(kind)
    a.update(vals.view(np.uint64))
    empty = registry.make(kind)
    left = a.merge(empty).to_bytes()
    right = empty.merge(a).to_bytes()
    # n_items differs only if empty contributed items — it didn't
    assert left == a.to_bytes()
    assert right == a.to_bytes()


# ------------------------------------------------- real-format codecs

@given(n=st.integers(1, 3000), sr=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_wav_roundtrip_property(n, sr, seed):
    from sgp_sketch import multimodal as mm

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n, dtype=np.int16)
    got, got_sr = mm.decode_wav(mm.encode_wav(samples, sr))
    assert got_sr == sr
    np.testing.assert_array_equal(got, samples)


@given(h=st.integers(1, 40), w=st.integers(1, 40),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_bmp_roundtrip_property(h, w, seed):
    """Any (h, w) — including widths forcing 1-3 bytes of row padding —
    must round-trip pixel-exactly."""
    from sgp_sketch import multimodal as mm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_bmp(mm.encode_bmp(px)), px)


@given(a=u64_arrays, b=u64_arrays, c=u64_arrays)
@settings(**SETTINGS)
def test_theta_merge_associative_commutative_bytes(a, b, c):
    from sgp_sketch.kernels import theta

    mk = lambda v: theta.Theta(k=16).update(v)
    ta, tb, tc = mk(a), mk(b), mk(c)
    left = ta.merge(tb).merge(tc)
    right = ta.merge(tb.merge(tc))
    assert left.to_bytes() == right.to_bytes()
    assert ta.merge(tb).to_bytes() == tb.merge(ta).to_bytes()
    assert ta.merge(theta.Theta(k=16)).to_bytes() == ta.to_bytes()


@given(v=u64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_theta_chunking_invariance(v, cut):
    from sgp_sketch.kernels import theta

    cut = min(cut, v.size)
    one = theta.Theta(k=16).update(v)
    two = theta.Theta(k=16).update(v[:cut]).merge(
        theta.Theta(k=16).update(v[cut:]))
    assert one.to_bytes() == two.to_bytes()

# ----------------------------------------------- bound-stable: MG and FD

int_arrays = st.lists(st.integers(0, 200), min_size=0, max_size=400).map(
    lambda xs: np.array(xs, dtype=np.int64))


@given(a=int_arrays, b=int_arrays, c=int_arrays,
       k=st.integers(2, 16))
@settings(**SETTINGS)
def test_mg_merge_bound_invariants(a, b, c, k):
    """MG counter sets are merge-order-dependent, but for EVERY merge
    order: n_items is exact, dec <= n/(k+1), and every estimate brackets
    the true count (est <= true <= est + dec). Identity merge is exact."""
    from sgp_sketch.kernels.mg import MG

    data = np.concatenate([a, b, c])
    for m in (MG(k).update(a).merge(MG(k).update(b)).merge(MG(k).update(c)),
              MG(k).update(a).merge(MG(k).update(b).merge(MG(k).update(c))),
              MG(k).update(c).merge(MG(k).update(a)).merge(MG(k).update(b))):
        assert m.n_items == data.size
        assert m.dec <= data.size // (k + 1) + 1
        if data.size:
            uniq, counts = np.unique(data, return_counts=True)
            est = m.estimate(uniq)
            assert np.all(est <= counts)
            assert np.all(counts <= est + m.dec)
    s = MG(k).update(a)
    ident = s.merge(MG(k))
    assert np.array_equal(ident.keys, s.keys)
    assert np.array_equal(ident.counts, s.counts) and ident.dec == s.dec


small_mats = st.integers(0, 60).flatmap(
    lambda n: st.lists(
        st.lists(st.floats(-100, 100, allow_nan=False),
                 min_size=6, max_size=6),
        min_size=n, max_size=n)).map(
    lambda rows: np.array(rows, dtype=np.float64).reshape(-1, 6))


@given(a=small_mats, b=small_mats, ell=st.integers(2, 5))
@settings(**SETTINGS)
def test_fd_merge_bound_invariants(a, b, ell):
    """For any split and ell: the merged FD sketch's Gram error is within
    its own tracked shed, shed <= ||A||_F^2/ell, and A'A - B'B is PSD
    (the sketch never overestimates any direction)."""
    from sgp_sketch.kernels.fd import FD

    A = np.concatenate([a, b]) if a.size or b.size else a
    m = FD(ell, 6).update(a).merge(FD(ell, 6).update(b))
    assert m.n_rows == A.shape[0]
    G = A.T @ A if A.size else np.zeros((6, 6))
    D = G - m.gram()
    tol = 1e-6 * max(1.0, float(np.abs(G).max()))
    assert np.linalg.norm(D, 2) <= m.shed + tol
    frob = float((A ** 2).sum())
    assert m.shed <= frob / ell + tol
    assert np.linalg.eigvalsh(D).min() >= -tol


@given(a=u64_arrays, b=u64_arrays, c=u64_arrays)
@settings(**SETTINGS)
def test_cs_merge_associative_commutative_bytes(a, b, c):
    from sgp_sketch.kernels import cs

    mk = lambda v: cs.CS(depth=3, width=256).update(v)
    sa, sb, sc = mk(a), mk(b), mk(c)
    assert (sa.merge(sb).merge(sc).to_bytes()
            == sa.merge(sb.merge(sc)).to_bytes())
    assert sa.merge(sb).to_bytes() == sb.merge(sa).to_bytes()
    assert sa.merge(cs.CS(depth=3, width=256)).to_bytes() == sa.to_bytes()


@given(v=u64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_cs_chunking_invariance_bytes(v, cut):
    """Signed cell addition is exact: any chunk split must rebuild the
    byte-identical state AND the same unbiased estimates."""
    from sgp_sketch.kernels import cs

    cut = min(cut, v.size)
    whole = cs.CS(depth=3, width=256).update(v)
    split = (cs.CS(depth=3, width=256).update(v[:cut])
             .merge(cs.CS(depth=3, width=256).update(v[cut:])))
    assert whole.to_bytes() == split.to_bytes()
    assert whole.n_items == v.size


@given(a=f64_arrays, b=f64_arrays, c=f64_arrays)
@settings(**SETTINGS)
def test_dd_merge_associative_commutative_bytes(a, b, c):
    """DDSketch merges are cell-wise counter addition over canonical sorted
    sparse stores — byte-stable like HLL/CMS/Bloom/CS, unlike KLL/t-digest
    which only promise bounds."""
    from sgp_sketch.kernels import dd

    mk = lambda v: dd.DD(alpha=0.02).update(v)
    sa, sb, sc = mk(a), mk(b), mk(c)
    assert (sa.merge(sb).merge(sc).to_bytes()
            == sa.merge(sb.merge(sc)).to_bytes())
    assert sa.merge(sb).to_bytes() == sb.merge(sa).to_bytes()
    assert sa.merge(dd.DD(alpha=0.02)).to_bytes() == sa.to_bytes()


@given(v=f64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_dd_chunking_invariance_bytes(v, cut):
    from sgp_sketch.kernels import dd

    cut = min(cut, v.size)
    whole = dd.DD(alpha=0.02).update(v)
    split = (dd.DD(alpha=0.02).update(v[:cut])
             .merge(dd.DD(alpha=0.02).update(v[cut:])))
    assert whole.to_bytes() == split.to_bytes()
    assert whole.n == v.size


# ------------------------------------------------------- moments (exact)

i64_arrays = st.lists(
    st.integers(-(2**40), 2**40), min_size=0, max_size=500).map(
    lambda xs: np.array(xs, dtype=np.int64))


@given(a=i64_arrays, b=i64_arrays, c=i64_arrays)
@settings(**SETTINGS)
def test_moments_merge_associative_commutative_bytes(a, b, c):
    """Moments merges are arbitrary-precision integer addition — byte-stable
    under ANY order with zero rounding, the strongest equivalence class."""
    from sgp_sketch.kernels import moments

    mk = lambda v: moments.Moments().update(v)
    sa, sb, sc = mk(a), mk(b), mk(c)
    assert (sa.merge(sb).merge(sc).to_bytes()
            == sa.merge(sb.merge(sc)).to_bytes())
    assert sa.merge(sb).to_bytes() == sb.merge(sa).to_bytes()
    assert sa.merge(moments.Moments()).to_bytes() == sa.to_bytes()


@given(v=i64_arrays, cut=st.integers(0, 500))
@settings(**SETTINGS)
def test_moments_chunking_invariance_and_exactness(v, cut):
    """Chunked build == whole build byte-for-byte, AND the power sums equal
    a direct arbitrary-precision computation — the kernel is EXACT."""
    from sgp_sketch.kernels import moments

    cut = min(cut, v.size)
    whole = moments.Moments().update(v)
    split = (moments.Moments().update(v[:cut])
             .merge(moments.Moments().update(v[cut:])))
    assert whole.to_bytes() == split.to_bytes()
    xs = [int(x) for x in v.tolist()]
    assert whole.n == len(xs)
    for p in range(1, 5):
        assert whole.s[p - 1] == sum(x ** p for x in xs)
    if xs:
        assert whole.mn == min(xs) and whole.mx == max(xs)
    rt = registry.from_bytes(whole.to_bytes())
    assert rt.to_bytes() == whole.to_bytes()
