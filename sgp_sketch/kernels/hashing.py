"""Vectorized 64-bit hashing over numpy arrays.

The reference buckets vertices with ``floorMod(vertexID.hashCode(), k)``
(`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:122`).
We need the same "stateless hash bucket" primitive but (a) 64-bit with good
avalanche so the same hash feeds HLL register/rank extraction, CMS rows, Bloom
bits and shard routing, and (b) vectorized — one numpy expression per Arrow
batch, never per-row Python (BASELINE.json input_hint).

splitmix64 (public domain, Steele et al., used as the seeding PRNG of
java.util.SplittableRandom) is a full-avalanche finalizer over uint64.

NOTE numpy 1.26 promotion rules: a uint64 array combined with a Python int
scalar silently promotes to float64 — every constant here must stay wrapped in
``np.uint64``.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)
_S30 = np.uint64(30)
_S27 = np.uint64(27)
_S31 = np.uint64(31)

GOLDEN = _C1  # exported: stride for deriving independent seeds


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Full-avalanche 64-bit mix. Accepts any integer dtype; returns uint64."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x += _C1
    x ^= x >> _S30
    x *= _C2
    x ^= x >> _S27
    x *= _C3
    x ^= x >> _S31
    return x


def hash64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of an integer array (vectorized).

    ``seed`` selects an independent hash function (CMS rows, Bloom probes,
    salting) by pre-mixing the seed and xoring before the finalizer.
    """
    v = np.asarray(values).astype(np.uint64, copy=False)
    if seed:
        v = v ^ splitmix64(np.uint64(seed))
    return splitmix64(v)


def hash_str_array(values, seed: int = 0) -> np.ndarray:
    """Vectorized-ish hash of a string sequence → uint64.

    Only used in test helpers and small lookup paths; the hot path hashes
    strings JVM-side with ``F.xxhash64`` before data ever reaches Python.
    Implemented with a polynomial rolling hash over the UTF-8 bytes of the
    whole batch (one concatenated buffer, offsets vectorized via reduceat).
    """
    vals = list(values)
    if not vals:
        return np.empty(0, dtype=np.uint64)
    bufs = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in vals]
    lens = np.fromiter((len(b) for b in bufs), count=len(bufs), dtype=np.int64)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    # polynomial hash base^i per byte position, restarted per string
    starts = np.zeros(len(bufs), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
    base = np.uint64(0x100000001B3)  # FNV prime as polynomial base
    weights = np.empty(flat.size, dtype=np.uint64)
    if flat.size:
        # base**pos mod 2^64, computed by cumulative product per string
        weights.fill(np.uint64(1))
        w = np.ones(int(lens.max()), dtype=np.uint64)
        if w.size > 1:
            w[1:] = base
            np.cumprod(w, out=w)
        weights = w[pos]
    terms = flat * weights
    # segment sums: reduceat needs non-empty segments
    out = np.zeros(len(bufs), dtype=np.uint64)
    nonempty = lens > 0
    if nonempty.any():
        seg = np.add.reduceat(terms, np.maximum(starts[nonempty], 0))
        out[nonempty] = seg
    out ^= lens.astype(np.uint64)
    return hash64(out, seed=seed)


def pmod(h: np.ndarray, k: int) -> np.ndarray:
    """Non-negative bucket in [0, k) — the `floorMod(hash, k)` analog."""
    return (h % np.uint64(k)).astype(np.int64)
