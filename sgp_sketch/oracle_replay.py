"""Cross-engine EXACT replay of the kernel hash chain in DuckDB SQL.

Every hash sketch in this library consumes ``h = splitmix64(token)``
(agg.py feeds kernels pre-hashed uint64s; seeded lanes are
``splitmix64(h XOR splitmix64(seed))`` — kernels/hashing.py).  splitmix64
is pure wrapping uint64 arithmetic, and DuckDB's HUGEINT is wide enough
to replay it bit-for-bit: add/mod are native, xor works on HUGEINT, a
logical right-shift of a non-negative value is floor-division by a power
of two, and a wrapping 64-bit multiply splits into 32×64-bit partial
products that each fit in 128 bits.

That turns the sketch STATE itself into an oracle-checkable quantity:
an external engine with no knowledge of the Python kernels re-derives
HLL registers, theta retained-hash order statistics, Bloom bit
positions and CMS counter sums from the raw tables, and the driver
hash-compares them row-for-row against the blobs Spark built.  (The
same move as the md5-based `hash_split_counts` oracle, extended from
one modulus to the full hash chain.)

Token ids for the kernel-state replay queries are md5-derived —
``CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)`` on the Spark side,
``CAST('0x' || substr(md5(x),1,15) AS UBIGINT)`` in DuckDB (15 hex chars
= 60 bits, so values are non-negative in BIGINT and the int64→uint64
view inside agg.py is the identity).  The PRODUCTION tokenization —
Spark's ``F.xxhash64`` (testdata.doc_tokens, routing.route_tokens_salted)
— is ALSO replayable since round 5: for inputs < 32 bytes XXH64 is a
fixed unrolled chain of the same wrapping-uint64 ops, generated below by
``xxh64_long_sql`` / ``xxh64_str_sql`` and used by the
``xxhash_token_replay`` / ``doc_fingerprint`` / ``salted_token_routing``
oracles, so the driver adjudicates Spark's own hash values end-to-end.

Reference tie-in: the reference proves partitioner correctness by
re-deriving assignments from an independent implementation
(`/root/reference/src/main/java/ca/uwaterloo/cs/sgp/streaming/EdgeCutSGP.java:122`
floorMod bucketing checked against the Scala converters); these oracles
are that discipline applied to every hash-sketch kernel.
"""

from __future__ import annotations

M64 = 1 << 64
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
GOLDEN_CONST = _C1  # == kernels.hashing.GOLDEN (seed stride, e.g. minhash)


def splitmix64_const(seed: int) -> int:
    """Python-side splitmix64 of a scalar (for precomputing seed lanes)."""
    x = (seed + _C1) % M64
    x ^= x >> 30
    x = (x * _C2) % M64
    x ^= x >> 27
    x = (x * _C3) % M64
    x ^= x >> 31
    return x


def _mulmod(col: str, c: int) -> str:
    """(col * c) mod 2^64 for col in [0, 2^64) HUGEINT, c a 64-bit const.

    Splits c into 32-bit halves so every partial product stays < 2^96.
    """
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (f"(({col}) * {cl} + (((({col}) % 4294967296) * {ch}) "
            f"% 4294967296) * 4294967296) % {M64}")


def sm64_cols(in_expr: str, out: str, prefix: str) -> str:
    """SELECT-list fragment computing ``splitmix64(in_expr) AS out``.

    Uses DuckDB lateral column aliases (each step names the previous
    step), so the generated SQL stays linear in the 6 steps instead of
    exponentially duplicating subexpressions.  ``in_expr`` must be a
    non-negative HUGEINT expression < 2^64; ``prefix`` must be unique
    within the SELECT.
    """
    p = prefix
    return (f"(({in_expr}) + {_C1}) % {M64} AS {p}1, "
            f"xor({p}1, {p}1 // 1073741824) AS {p}2, "          # >> 30
            f"{_mulmod(p + '2', _C2)} AS {p}3, "
            f"xor({p}3, {p}3 // 134217728) AS {p}4, "           # >> 27
            f"{_mulmod(p + '4', _C3)} AS {p}5, "
            f"xor({p}5, {p}5 // 2147483648) AS {out}")          # >> 31


def seeded_sm64_cols(h_col: str, seed: int, out: str, prefix: str) -> str:
    """``hash64(h, seed) = splitmix64(h XOR splitmix64(seed))`` fragment
    (hashing.py:44 — seed must be non-zero, as in the kernels)."""
    if not seed:
        raise ValueError("seeded lane needs a non-zero seed")
    return sm64_cols(f"xor({h_col}, {splitmix64_const(seed)})", out, prefix)


def md5_token_sql(expr: str) -> str:
    """DuckDB: 60-bit md5-derived token of a string expression, HUGEINT."""
    return (f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) "
            f"AS HUGEINT)")


def hll_register_cols(h_col: str, p: int) -> str:
    """(idx, rank) register coordinates of hash ``h_col`` at precision p —
    the exact convention of kernels/hll.py:_codes_from_hashes:
    idx = h >> (64-p); rank = min(clz64(h << p) + 1, 64-p+1), which for
    rest = h mod 2^(64-p) equals (65-p) - bit_length(rest) including the
    rest == 0 cap (bit_length(0) = 0 → rank = 64-p+1)."""
    rest_div = 1 << (64 - p)
    return (f"CAST(({h_col}) // {rest_div} AS INT) AS idx, "
            f"CAST({65 - p} - (CASE WHEN ({h_col}) % {rest_div} = 0 THEN 0 "
            f"ELSE length(bin(CAST(({h_col}) % {rest_div} AS UBIGINT))) END) "
            f"AS INT) AS rank")


def md5_token_col():
    """Spark: the same 60-bit md5-derived token as md5_token_sql, JVM-side
    (no Python UDF).  Returns a function str-column → long-column."""
    from pyspark.sql import functions as F

    def tok(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return tok


# ------------------------------------------------ xxHash64 (Spark) replay
#
# Spark's ``F.xxhash64`` (XXH64, default seed 42 — public algorithm, Collet;
# Spark's unrolled Java port is sql/catalyst XXH64.java) is the PRODUCTION
# tokenizer of this engine (testdata.doc_tokens: token = xxhash64(word)) and
# the production router hash (routing.route_tokens_salted).  For inputs
# shorter than 32 bytes the algorithm is a FIXED unrolled chain of wrapping
# uint64 ops — the same op set splitmix64 needed — so DuckDB HUGEINT replays
# it bit-for-bit and the md5 stand-in is no longer required for these paths:
# the oracle re-derives Spark's own hash values from the raw strings/longs.
#
# Preconditions (guarded loudly in the generated SQL):
#   * string inputs: ASCII (substr/ord are per-CHARACTER; a multi-byte
#     code point would silently shift every byte index) and byte length
#     ≤ max_len < 32 (the ≥ 32-byte four-accumulator loop is not unrolled
#     here; testdata words are ≤ 8 bytes, doc ids ≤ 20 digits).
#   * long inputs: any BIGINT (negatives are viewed as uint64, exactly
#     Spark's reinterpretation).
# Parity with Spark is pytest-gated for BOTH generators over random longs
# and random ASCII strings of every supported length
# (tests/test_oracle_replay.py::test_xxh64_*).
#
# Unlike the 6-step splitmix chain, these are deep enough (up to ~50
# steps) that DuckDB's LATERAL-ALIAS select-list form blows up: the
# binder expands each alias textually, and a step that references its
# predecessor twice (every xor/rotl/mulmod does) doubles the tree —
# 2^50 nodes.  Nested one-column-per-level subqueries stay linear
# (measured: 96 double-ref steps over 10k rows bind+run in 0.22 s), so
# these generators emit a full wrapped subquery, not a select-list
# fragment.

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
XXH64_DEFAULT_SEED = 42  # Spark's XxHash64 default


def _rotl(col: str, r: int) -> str:
    """rotate-left of a [0, 2^64) HUGEINT expression; partial products
    stay < 2^128.  ``col`` is referenced twice — pass an alias name."""
    return f"((({col}) * {1 << r}) % {M64} + ({col}) // {1 << (64 - r)})"


def _xxh_fmix_steps(h_col: str, out: str, prefix: str) -> list:
    """XXH64 avalanche finalizer as (alias, expr) steps."""
    p = prefix
    return [
        (f"{p}f1", f"xor({h_col}, ({h_col}) // {1 << 33})"),
        (f"{p}f2", _mulmod(p + "f1", _XP2)),
        (f"{p}f3", f"xor({p}f2, {p}f2 // {1 << 29})"),
        (f"{p}f4", _mulmod(p + "f3", _XP3)),
        (out, f"xor({p}f4, {p}f4 // {1 << 32})"),
    ]


def _steps_subquery(inner_sql: str, steps: list, keep_cols: list,
                    out: str) -> str:
    """Wrap ``inner_sql`` in one nested subquery per step (one new column
    per level).  DuckDB's binder expands same-SELECT lateral aliases
    textually — a 50-step chain whose every step references its
    predecessor twice becomes a 2^50-node tree; one-column-per-level
    nesting keeps it linear (see module comment)."""
    q = inner_sql
    for alias, expr in steps:
        q = f"SELECT *, {expr} AS {alias} FROM ({q})"
    return f"SELECT {', '.join(list(keep_cols) + [out])} FROM ({q})"


def xxh64_long_sql(inner_sql: str, long_expr: str, keep_cols: list,
                   out: str = "h", prefix: str = "x_",
                   seed: int = XXH64_DEFAULT_SEED) -> str:
    """Subquery SQL: ``keep_cols`` of ``inner_sql`` plus
    ``xxhash64(long_expr) AS out`` — Spark XXH64.hashLong of a BIGINT
    (signed ok) or HUGEINT expression, bit-exact.  ``out`` is a HUGEINT
    in [0, 2^64) (uint64 view; wrap with the signed CASE to compare
    against Spark's BIGINT output)."""
    p = prefix
    h0 = (seed + _XP5 + 8) % M64
    steps = [
        (f"{p}u", f"(CAST({long_expr} AS HUGEINT) % {M64} + {M64}) % {M64}"),
        (f"{p}k1", _mulmod(p + "u", _XP2)),
        (f"{p}k2", _rotl(p + "k1", 31)),
        (f"{p}k3", _mulmod(p + "k2", _XP1)),
        (f"{p}h1", f"xor(CAST({h0} AS HUGEINT), {p}k3)"),
        (f"{p}h2", _rotl(p + "h1", 27)),
        (f"{p}h3", f"({_mulmod(p + 'h2', _XP1)} + {_XP4}) % {M64}"),
    ] + _xxh_fmix_steps(p + "h3", out, p)
    return _steps_subquery(inner_sql, steps, keep_cols, out)


def xxh64_str_sql(inner_sql: str, str_expr: str, keep_cols: list,
                  out: str = "h", prefix: str = "x_", max_len: int = 31,
                  seed: int | str = XXH64_DEFAULT_SEED) -> str:
    """Subquery SQL: ``keep_cols`` of ``inner_sql`` plus
    ``xxhash64(str_expr) AS out`` for an ASCII string expression of byte
    length ≤ max_len (< 128) — Spark XXH64.hashUnsafeBytes over the
    UTF-8 bytes, bit-exact.

    Layout of the unrolled chain: for len ≥ 32, up to max_len//32
    four-accumulator 32-byte blocks (each CASE-guarded on length) merged
    by the rotl(1/7/12/18) fold; h += len; then the shared tail — one
    8-byte little-endian stripe per remaining full 8 bytes at dynamic
    offset 32·(len//32) + 8·i, one 4-byte word if len%8 ≥ 4 at dynamic
    offset (len//8)·8, len%4 single bytes, fmix.  Dynamic offsets are
    resolved with substr's expression position, so one generated chain
    serves every length class.

    ``seed`` may be an int constant or an SQL expression (a column of
    ``inner_sql``) — the latter replays Spark's multi-column
    ``xxhash64(a, b)`` chaining, where column b's seed is column a's
    hash (precompute it with xxh64_int_const/xxh64_long_const).

    Guards that would make silent wrong answers are loud errors
    instead: non-ASCII (char length ≠ byte length) and over-length both
    CAST a message string to BIGINT, which DuckDB rejects at run time
    on the offending row."""
    if not 0 <= max_len < 128:
        raise ValueError("xxh64_str_sql unrolls at most 3 acc blocks "
                         "(max_len < 128)")
    p = prefix
    seed_u = (f"((CAST({seed} AS HUGEINT)) % {M64} + {M64}) % {M64}"
              if isinstance(seed, str) else str(seed % M64))
    steps = [
        (f"{p}s", f"({str_expr})"),
        (f"{p}L",
         f"CASE WHEN length({p}s) > {max_len} OR "
         f"strlen({p}s) <> length({p}s) "
         f"THEN CAST('xxh64_str_sql: input over max_len={max_len} "
         f"or non-ASCII' AS BIGINT) ELSE length({p}s) END"),
        (f"{p}sd", f"CAST({seed_u} AS HUGEINT)"),
    ]
    # byte at dynamic 1-based position expr (0 when past the end; every
    # use is CASE-guarded, the 0 is never part of a taken branch)
    # HUGEINT so byte*2^56 products and their sums never overflow INT64
    byte = lambda pos: (f"CASE WHEN ({pos}) <= {p}L "
                        f"THEN CAST(ord(substr({p}s, {pos}, 1)) AS HUGEINT) "
                        f"ELSE CAST(0 AS HUGEINT) END")
    n_blocks = max_len // 32
    if n_blocks:
        # four-accumulator 32-byte blocks (XXH64's len >= 32 main loop);
        # lane aliases are versioned per block — nested SELECT * levels
        # cannot redefine an existing column name
        lane = {i: f"{p}v{i}_0" for i in range(1, 5)}
        steps += [
            (lane[1], f"({p}sd + {(_XP1 + _XP2) % M64}) % {M64}"),
            (lane[2], f"({p}sd + {_XP2}) % {M64}"),
            (lane[3], f"{p}sd"),
            (lane[4], f"({p}sd + {M64 - _XP1}) % {M64}"),
        ]
        for j in range(n_blocks):
            guard = f"{p}L >= {32 * (j + 1)}"
            for i in range(1, 5):
                w = " + ".join(
                    f"{byte(f'{32 * j + 8 * (i - 1) + k + 1}')} "
                    f"* {1 << (8 * k)}" for k in range(8))
                nxt = f"{p}v{i}_{j + 1}"
                steps += [
                    (f"{p}bw{j}_{i}", f"CAST({w} AS HUGEINT)"),
                    (f"{p}bt{j}_{i}",
                     f"({lane[i]} + {_mulmod(f'{p}bw{j}_{i}', _XP2)}) "
                     f"% {M64}"),
                    (f"{p}br{j}_{i}", _rotl(f"{p}bt{j}_{i}", 31)),
                    (nxt,
                     f"CASE WHEN {guard} THEN "
                     f"{_mulmod(f'{p}br{j}_{i}', _XP1)} ELSE {lane[i]} END"),
                ]
                lane[i] = nxt
        steps.append(
            (f"{p}am",
             f"({_rotl(lane[1], 1)} + {_rotl(lane[2], 7)} + "
             f"{_rotl(lane[3], 12)} + {_rotl(lane[4], 18)}) % {M64}"))
        prev_acc = f"{p}am"
        for i in range(1, 5):
            steps += [
                (f"{p}fa{i}", _mulmod(lane[i], _XP2)),
                (f"{p}fb{i}", _rotl(f"{p}fa{i}", 31)),
                (f"{p}fc{i}", _mulmod(f"{p}fb{i}", _XP1)),
                (f"{p}fd{i}", f"xor({prev_acc}, {p}fc{i})"),
                (f"{p}fe{i}",
                 f"({_mulmod(f'{p}fd{i}', _XP1)} + {_XP4}) % {M64}"),
            ]
            prev_acc = f"{p}fe{i}"
        init_ge32 = f"({prev_acc} + {p}L) % {M64}"
    else:
        init_ge32 = "NULL"
    steps.append(
        (f"{p}g0",
         f"CASE WHEN {p}L >= 32 THEN {init_ge32} "
         f"ELSE (({p}sd + {_XP5}) % {M64} + {p}L) % {M64} END"))
    prev = f"{p}g0"
    # tail 8-byte stripes at dynamic offset 32*(len//32) + 8*i; worst
    # remaining-length class is len%32 = 31 (3 stripes) once max_len
    # admits any len with len%32 >= 24
    n_tail = 3 if max_len >= 24 else max_len // 8
    for i in range(n_tail):
        w = " + ".join(
            f"{byte(f'({p}L // 32) * 32 + {8 * i + k + 1}')} "
            f"* {1 << (8 * k)}" for k in range(8))
        steps += [
            (f"{p}w{i}", f"CAST({w} AS HUGEINT)"),
            (f"{p}a{i}", _mulmod(f"{p}w{i}", _XP2)),
            (f"{p}b{i}", _rotl(f"{p}a{i}", 31)),
            (f"{p}c{i}", _mulmod(f"{p}b{i}", _XP1)),
            (f"{p}d{i}", f"xor({prev}, {p}c{i})"),
            (f"{p}e{i}", _rotl(f"{p}d{i}", 27)),
            (f"{p}g{i + 1}",
             f"CASE WHEN {p}L % 32 >= {8 * (i + 1)} THEN "
             f"({_mulmod(f'{p}e{i}', _XP1)} + {_XP4}) % {M64} "
             f"ELSE {prev} END"),
        ]
        prev = f"{p}g{i + 1}"
    # 4-byte word at dynamic offset (len//8)*8, taken iff len%8 >= 4
    u32 = " + ".join(f"{byte(f'({p}L // 8) * 8 + {k + 1}')} * {1 << (8 * k)}"
                     for k in range(4))
    steps += [
        (f"{p}q", f"CAST({u32} AS HUGEINT)"),
        (f"{p}q1", f"xor({prev}, {_mulmod(p + 'q', _XP1)})"),
        (f"{p}q2", _rotl(p + "q1", 23)),
        (f"{p}t0",
         f"CASE WHEN {p}L % 8 >= 4 THEN "
         f"({_mulmod(p + 'q2', _XP2)} + {_XP3}) % {M64} "
         f"ELSE {prev} END"),
    ]
    prev = f"{p}t0"
    # trailing len%4 single bytes at offsets L - L%4 + j
    for j in range(3):
        b = byte(f"{p}L - ({p}L % 4) + {j + 1}")
        steps += [
            (f"{p}x{j}", f"xor({prev}, ({b}) * {_XP5} % {M64})"),
            (f"{p}y{j}", _rotl(f"{p}x{j}", 11)),
            (f"{p}t{j + 1}",
             f"CASE WHEN {p}L % 4 > {j} THEN {_mulmod(f'{p}y{j}', _XP1)} "
             f"ELSE {prev} END"),
        ]
        prev = f"{p}t{j + 1}"
    steps += _xxh_fmix_steps(prev, out, p + "z")
    return _steps_subquery(inner_sql, steps, keep_cols, out)


def xxh64_long_const(v: int, seed: int = XXH64_DEFAULT_SEED) -> int:
    """Python scalar XXH64 of a long — Spark XXH64.hashLong (uint64 out)."""
    v %= M64  # signed → uint64 view, exactly Spark's reinterpretation
    h = (seed + _XP5 + 8) % M64
    h ^= _protl((v * _XP2) % M64, 31) * _XP1 % M64
    h = (_protl(h, 27) * _XP1 + _XP4) % M64
    return _pfmix(h)


def xxh64_int_const(v: int, seed: int = XXH64_DEFAULT_SEED) -> int:
    """Python scalar XXH64 of an INT32 input — Spark XXH64.hashInt
    (uint64 out).  Needed to precompute constant seeds for multi-column
    ``F.xxhash64(F.lit(b), str_col)`` chains (Spark threads the hash of
    each column as the next column's seed)."""
    u = v & 0xFFFFFFFF
    h = (seed + _XP5 + 4) % M64
    h ^= (u * _XP1) % M64
    h = (_protl(h, 23) * _XP2 + _XP3) % M64
    return _pfmix(h)


def xxh64_ascii_const(s: str | bytes,
                      seed: int = XXH64_DEFAULT_SEED) -> int:
    """Python scalar XXH64 of a byte string — Spark XXH64.hashUnsafeBytes
    (uint64 out), any length (the ≥ 32-byte four-accumulator loop
    included)."""
    b = s.encode() if isinstance(s, str) else s
    n = len(b)
    o = 0
    if n >= 32:
        v = [(seed + _XP1 + _XP2) % M64, (seed + _XP2) % M64,
             seed % M64, (seed - _XP1) % M64]
        while o + 32 <= n:
            for i in range(4):
                k = int.from_bytes(b[o + 8 * i:o + 8 * i + 8], "little")
                v[i] = (_protl((v[i] + k * _XP2) % M64, 31) * _XP1) % M64
            o += 32
        h = (_protl(v[0], 1) + _protl(v[1], 7)
             + _protl(v[2], 12) + _protl(v[3], 18)) % M64
        for i in range(4):
            h ^= (_protl((v[i] * _XP2) % M64, 31) * _XP1) % M64
            h = (h * _XP1 + _XP4) % M64
        h = (h + n) % M64
    else:
        h = (seed + _XP5 + n) % M64
    while o + 8 <= n:
        k = int.from_bytes(b[o:o + 8], "little")
        h ^= _protl((k * _XP2) % M64, 31) * _XP1 % M64
        h = (_protl(h, 27) * _XP1 + _XP4) % M64
        o += 8
    if o + 4 <= n:
        k = int.from_bytes(b[o:o + 4], "little")
        h ^= (k * _XP1) % M64
        h = (_protl(h, 23) * _XP2 + _XP3) % M64
        o += 4
    while o < n:
        h ^= (b[o] * _XP5) % M64
        h = (_protl(h, 11) * _XP1) % M64
        o += 1
    return _pfmix(h)


def _protl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) % M64


def _pfmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XP2) % M64
    h ^= h >> 29
    h = (h * _XP3) % M64
    h ^= h >> 32
    return h


# ----------------------------------------------------- greedy route replay

def greedy_route_replay_ctes(algorithm: str, n_shards: int = 8,
                             slack: float = 0.3, gamma: float = 1.5,
                             limit: int = 512) -> str:
    """WITH-RECURSIVE body re-deriving `routing.route_stream_sequential`
    assignments from the raw `documents` table — the reference's
    sequential greedy loop (EdgeCutSGP.java:211-246: record i scored
    against state as of i-1) replayed record-by-record in SQL.

    The recursion carries the full assignment prefix and shard sizes;
    per step it rebuilds the doc's neighbor histogram from the
    FIRST-CONTAINING-DOC positions of its token occurrences (token home
    = shard of the first doc, in stream order, that carried it — the
    router's first-writer-wins `_remember`), masks full shards, scores
    with the exact LDG / Fennel formula (routing.py:98-115), and breaks
    score ties with `splitmix64(doc_key) % n_ties` over the tied shards
    in index order (`_tiebreak_argmax`). Every arithmetic step is a
    correctly-rounded IEEE op on identical doubles in both engines
    (division, one multiply, sqrt), so assignments hash-match exactly.

    Ends with CTEs: `docs(pos, doc_id, hkey, fds)`, `occ(pos, tok)`,
    `fp(tok, fd)`, `assignments(pos, shard)`. Caller appends the final
    SELECT. The string starts with 'WITH RECURSIVE'."""
    if algorithm not in ("ldg", "fennel"):
        raise ValueError(f"no replay oracle for algorithm {algorithm!r}")
    k = int(n_shards)
    cap_factor = repr(1.0 + slack)
    if algorithm == "ldg":
        score = "(1.0 - r.sizes[p+1] / c.cap) * hist[p+1]"
    else:
        score = (f"hist[p+1] - ({gamma!r} * c.alpha) "
                 f"* sqrt(CAST(r.sizes[p+1] AS DOUBLE))")
    zeros = "[" + ", ".join("0" for _ in range(k)) + "]::BIGINT[]"
    return f"""WITH RECURSIVE
sel AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {limit}),
base AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY doc_id) - 1 AS INT) AS pos,
                list_transform(string_split(text, ' '),
                               t -> {md5_token_sql('t')}) AS toks
         FROM sel),
hk AS (SELECT pos, doc_id,
              {sm64_cols(md5_token_sql('CAST(doc_id AS VARCHAR)'),
                         'hkey', 'hk')}
       FROM base),
occ AS (SELECT pos, unnest(toks) AS tok FROM base),
fp AS (SELECT tok, MIN(pos) AS fd FROM occ GROUP BY tok),
fdl AS (SELECT o.pos,
               COALESCE(list(f.fd) FILTER (WHERE f.fd < o.pos),
                        CAST([] AS INTEGER[])) AS fds
        FROM occ o JOIN fp f USING (tok) GROUP BY o.pos),
docs AS (SELECT h.pos, h.doc_id, h.hkey,
                COALESCE(d.fds, CAST([] AS INTEGER[])) AS fds
         FROM hk h LEFT JOIN fdl d USING (pos)),
consts AS (SELECT GREATEST(1.0,
                           CAST((SELECT COUNT(*) FROM base) AS DOUBLE)
                           / {k} * {cap_factor}) AS cap,
                  (sqrt(CAST({k} AS DOUBLE))
                   * (SELECT COUNT(*) FROM occ))
                  / ((SELECT COUNT(*) FROM base)
                     * sqrt(CAST(GREATEST((SELECT COUNT(*) FROM base), 1)
                                 AS DOUBLE))) AS alpha),
r AS (
  SELECT -1 AS i, CAST([] AS INTEGER[]) AS assign, {zeros} AS sizes
  UNION ALL
  SELECT i, assign, sizes FROM (
    SELECT d.pos AS i,
           list_transform(range({k}), p ->
             CAST(len(list_filter(d.fds,
                                  fd -> r.assign[fd+1] = p)) AS DOUBLE))
               AS hist,
           list_transform(range({k}), p ->
             CASE WHEN r.sizes[p+1] >= c.cap THEN '-infinity'::DOUBLE
                  ELSE {score} END) AS scores,
           list_filter(range({k}),
                       p -> scores[p+1] = list_max(scores)) AS tied,
           CASE WHEN len(list_filter(range({k}),
                                     p -> r.sizes[p+1] < c.cap)) = 0
                THEN CAST(list_position(r.sizes, list_min(r.sizes)) - 1
                          AS INT)
                ELSE CAST(tied[CAST(d.hkey % len(tied) AS INT) + 1] AS INT)
           END AS choice,
           list_append(r.assign, choice) AS assign,
           list_transform(range({k}), p ->
             r.sizes[p+1] + CASE WHEN p = choice THEN 1 ELSE 0 END)
               AS sizes
    FROM r, docs d, consts c
    WHERE d.pos = r.i + 1
  )
),
assignments AS (SELECT i AS pos, CAST(assign[i+1] AS INT) AS shard
                FROM r WHERE i >= 0)"""


# ------------------------------------------------- MG summary fold replay

# Fixed source enumeration shared by q_mg_summary_replay and its oracle:
# the fold order IS part of the adjudicated contract (MG counter sets are
# order-dependent across merges — kernels/mg.py module docstring), so both
# engines must walk the same list.  Lexicographic, matching VARCHAR order.
MG_REPLAY_SOURCES = tuple(sorted(f"src{i}" for i in range(20)))


def mg_fold_replay_sql(k: int = 16,
                       sources: tuple = MG_REPLAY_SOURCES) -> str:
    """Exact SQL re-derivation of q_mg_summary_replay: per-source
    Misra–Gries summaries (ONE batch-absorb each) plus their fold-merge,
    replayed step by step.

    The kernel rule being replayed (kernels/mg.py:_absorb, the PODS'12
    mergeable-summaries reduce): union counter sets, sum duplicate keys,
    and if more than k keys survive, subtract the (k+1)-th LARGEST count
    (duplicates counted — np.partition at position size-(k+1)) from every
    counter and drop the non-positive ones; `dec` accumulates every
    subtracted threshold, `n_items` the raw occurrence totals.  A single
    update() into an EMPTY sketch is one such absorb of the per-source
    (token → occurrence count) table, so it is order-independent and
    plain SQL; the merge fold is replayed by unrolling one CTE block per
    source in the SHARED fixed order.  Rank-(k+1) is computed with
    row_number (ties broken arbitrarily) because only the VALUE at that
    rank is used — identical under any tie order.

    Emits rows (scope, token, cnt, dec, n_items): one summary row per
    scope with token = cnt = -1 (so dec/n_items stay adjudicated even if
    every counter were evicted) plus one row per retained counter.
    Scope is each source plus '__merged__' for the fold result."""
    if len(sources) < 2:
        raise ValueError("fold replay needs at least two sources")
    srclist = ", ".join(f"'{s}'" for s in sources)
    kp1 = int(k) + 1
    # every fold step references `ret` — MATERIALIZED collapses the
    # 20-step unrolling to ONE parquet scan (without it DuckDB re-opens
    # the file per reference and trips the fd limit)
    parts = [f"""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS wd
           FROM documents WHERE source IN ({srclist})),
tc AS MATERIALIZED (SELECT source, {md5_token_sql('wd')} AS token,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM w GROUP BY 1, 2),
sstat AS (SELECT source, SUM(cnt) AS n_items FROM tc GROUP BY 1),
rk AS (SELECT source, token, cnt,
              row_number() OVER (PARTITION BY source
                                 ORDER BY cnt DESC) AS rn
       FROM tc),
sth AS MATERIALIZED (SELECT source,
               COALESCE(MAX(CASE WHEN rn = {kp1} THEN cnt END), 0) AS t
        FROM rk GROUP BY 1),
ret AS MATERIALIZED (SELECT r.source, r.token, r.cnt - s.t AS cnt
        FROM rk r JOIN sth s USING (source)
        WHERE r.cnt - s.t > 0),
m0 AS (SELECT token, cnt FROM ret WHERE source = '{sources[0]}')"""]
    # u/t/m are each referenced 2-3 times by the next block; without
    # MATERIALIZED DuckDB inlines the recursion ~3^|sources|-fold and the
    # query never finishes — materializing pins each fold step to one
    # KB-sized intermediate
    for i in range(1, len(sources)):
        parts.append(f""",
u{i} AS MATERIALIZED (SELECT token, SUM(cnt) AS cnt FROM (
           SELECT token, cnt FROM m{i - 1}
           UNION ALL
           SELECT token, cnt FROM ret WHERE source = '{sources[i]}')
         GROUP BY 1),
t{i} AS MATERIALIZED (
         SELECT COALESCE(MAX(CASE WHEN rn = {kp1} THEN cnt END), 0) AS t
         FROM (SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS rn
               FROM u{i})),
m{i} AS MATERIALIZED (
         SELECT token, cnt - (SELECT t FROM t{i}) AS cnt FROM u{i}
         WHERE cnt - (SELECT t FROM t{i}) > 0)""")
    last = len(sources) - 1
    step_decs = " + ".join(f"(SELECT t FROM t{i})"
                           for i in range(1, len(sources)))
    parts.append(f""",
mdec AS (SELECT (SELECT COALESCE(SUM(t), 0) FROM sth)
                + {step_decs} AS dec),
mn AS (SELECT COALESCE(SUM(n_items), 0) AS n FROM sstat)
SELECT source AS scope, CAST(-1 AS BIGINT) AS token,
       CAST(-1 AS BIGINT) AS cnt, CAST(s.t AS BIGINT) AS dec,
       CAST(st.n_items AS BIGINT) AS n_items
FROM sth s JOIN sstat st USING (source)
UNION ALL
SELECT r.source, CAST(r.token AS BIGINT), CAST(r.cnt AS BIGINT),
       CAST(s.t AS BIGINT), CAST(st.n_items AS BIGINT)
FROM ret r JOIN sth s USING (source) JOIN sstat st USING (source)
UNION ALL
SELECT '__merged__', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST((SELECT dec FROM mdec) AS BIGINT),
       CAST((SELECT n FROM mn) AS BIGINT)
UNION ALL
SELECT '__merged__', CAST(token AS BIGINT), CAST(cnt AS BIGINT),
       CAST((SELECT dec FROM mdec) AS BIGINT),
       CAST((SELECT n FROM mn) AS BIGINT)
FROM m{last}
ORDER BY 1, 2""")
    return "".join(parts)


# ------------------------------------------- CMS conservative-update replay

def cms_cu_replay_sql(depth: int = 4, width: int = 64,
                      seed: int = 7) -> str:
    """Exact SQL re-derivation of q_cms_cu_replay — the CONSERVATIVE
    update policy itself (kernels/cms.py:update_hashes, the production
    default), which cms_counter_replay deliberately side-stepped with
    plain sums.

    The kernel's vectorized CU step over one batch of UNIQUE items:
    read cells, target_i = min-over-lanes(cell) + count_i, then
    scatter-MAX targets back (cells shared by several items take the
    largest target and never shrink).  A fixed TWO-phase schedule
    (phase = token % 2, phase 0 then phase 1) makes the sequential
    inter-batch semantics adjudicable: phase-1 targets read the cell
    table phase 0 wrote.  From a zero table, phase-0 cells are
    MAX(count) over colliding items; phase-1 cells are the scatter-max
    of min-over-lanes(phase-0 cells) + count; the final table is the
    elementwise max of both.  Every probe answers min over its lanes.

    Emits (grp, fam, k1, k2, val): fam='cell' rows for ALL depth×width
    cells (zeros included — the table shape is part of the contract)
    with (k1, k2) = (lane, column); fam='est' rows per distinct
    (grp, token) with (k1, k2) = (token, phase)."""
    lane_whens = " ".join(
        f"WHEN {j} THEN CAST({splitmix64_const(seed + j)} AS HUGEINT)"
        for j in range(depth - 1))
    lane_case = (f"CASE j {lane_whens} ELSE "
                 f"CAST({splitmix64_const(seed + depth - 1)} AS HUGEINT) END")
    t = md5_token_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH c AS (SELECT event_type AS grp, {t} AS token,
                          CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM events WHERE user_id IS NOT NULL
                   GROUP BY 1, 2),
        h0 AS (SELECT grp, token, cnt, token % 2 AS phase,
                      {sm64_cols('token', 'h', 'a')} FROM c),
        pj AS (SELECT grp, token, cnt, phase, j,
                      {sm64_cols(f'xor(h, {lane_case})', 'hj', 'b')}
               FROM h0 CROSS JOIN range({depth}) AS js(j)),
        pos AS (SELECT grp, token, cnt, phase, j, hj % {width} AS pos
                FROM pj),
        cell1 AS (SELECT grp, j, pos, MAX(cnt) AS v
                  FROM pos WHERE phase = 0 GROUP BY 1, 2, 3),
        tgt AS (SELECT p.grp, p.token,
                       MIN(COALESCE(c1.v, 0)) + MIN(p.cnt) AS target
                FROM pos p
                LEFT JOIN cell1 c1 ON c1.grp = p.grp AND c1.j = p.j
                                   AND c1.pos = p.pos
                WHERE p.phase = 1 GROUP BY 1, 2),
        cell2 AS (SELECT p.grp, p.j, p.pos, MAX(t2.target) AS v
                  FROM pos p
                  JOIN tgt t2 ON t2.grp = p.grp AND t2.token = p.token
                  WHERE p.phase = 1 GROUP BY 1, 2, 3),
        grid AS (SELECT g.grp, CAST(js.j AS BIGINT) AS j,
                        CAST(ps.pos AS BIGINT) AS pos
                 FROM (SELECT DISTINCT grp FROM c) g
                 CROSS JOIN range({depth}) AS js(j)
                 CROSS JOIN range({width}) AS ps(pos)),
        cells AS (SELECT grid.grp, grid.j, grid.pos,
                         GREATEST(COALESCE(c1.v, 0), COALESCE(c2.v, 0))
                             AS v
                  FROM grid
                  LEFT JOIN cell1 c1 ON c1.grp = grid.grp
                        AND c1.j = grid.j AND c1.pos = grid.pos
                  LEFT JOIN cell2 c2 ON c2.grp = grid.grp
                        AND c2.j = grid.j AND c2.pos = grid.pos),
        est AS (SELECT p.grp, p.token, MIN(p.phase) AS phase,
                       MIN(ce.v) AS est
                FROM pos p
                JOIN cells ce ON ce.grp = p.grp AND ce.j = p.j
                             AND ce.pos = p.pos
                GROUP BY 1, 2)
        SELECT grp, 'cell' AS fam, j AS k1, pos AS k2,
               CAST(v AS BIGINT) AS val
        FROM cells
        UNION ALL
        SELECT grp, 'est', CAST(token AS BIGINT), CAST(phase AS BIGINT),
               CAST(est AS BIGINT)
        FROM est
        ORDER BY 1, 2, 3, 4
    """


# --------------------------------------------------- t-digest centroid replay

def tdigest_centroid_replay_sql(src_delta: float = 10.0,
                                merge_delta: float = 100.0) -> str:
    """Exact SQL re-derivation of q_tdigest_centroid_replay: the t-digest
    MERGING-variant centroid state (kernels/tdigest.py:_compress) for (a)
    a per-source single-batch build at delta=src_delta and (b) an
    evens/odds doc_id split at delta=merge_delta plus their merge() —
    the PODS-mergeable reduce step itself — replayed as plain SQL.

    The kernel rule: sort (mean, weight) pairs (stable — ties keep
    concat order, here (mean, part, idx)), mid-rank
    q_i = (cum_w_i - w_i/2) / W, scale k(q) = (delta/2pi)*asin(2q-1),
    bucket by floor(k), collapse each bucket to its weighted mean.

    Numeric-exactness contract (why a hash-exact oracle is possible):
    inputs are integer n_chars, so single-batch sums/counts/means are
    exact in double regardless of summation order; cum weights are
    integers; the only cross-engine drift is asin (numpy SIMD vs libm,
    measured <= 2 ulp), which can flip floor(k) only within ~3e-15 of a
    bucket boundary — the data's measured minimum boundary distance is
    ~5e-7 (tests/test_oracle_replay.py pins this margin). Merged-leg
    weighted sums carry ~1e-16 relative order noise, far below the
    driver's ~6dp float rounding."""
    halfpi_src = f"({src_delta!r}/(2*pi()))"
    halfpi_mrg = f"({merge_delta!r}/(2*pi()))"
    return f"""
        WITH vals AS (
            SELECT source AS scope, CAST(n_chars AS DOUBLE) AS x,
                   {halfpi_src} AS c
            FROM documents
            UNION ALL
            SELECT CASE WHEN doc_id % 2 = 0 THEN '__evens__'
                        ELSE '__odds__' END,
                   CAST(n_chars AS DOUBLE), {halfpi_mrg}
            FROM documents),
        r AS (SELECT scope, c, x,
                     CAST(row_number() OVER (PARTITION BY scope
                                             ORDER BY x) AS DOUBLE) AS i,
                     CAST(COUNT(*) OVER (PARTITION BY scope) AS DOUBLE)
                         AS n
              FROM vals),
        b AS (SELECT scope, x,
                     CAST(floor(c * asin(2.0*((i-0.5)/n) - 1.0))
                          AS BIGINT) AS bin
              FROM r),
        cent AS (SELECT scope, bin, SUM(x)/COUNT(*) AS mean,
                        CAST(COUNT(*) AS DOUBLE) AS w
                 FROM b GROUP BY 1, 2),
        cidx AS (SELECT scope,
                        row_number() OVER (PARTITION BY scope
                                           ORDER BY bin) - 1 AS idx,
                        mean, w
                 FROM cent),
        -- merge(): concat evens-then-odds (stable tie order = mean,
        -- part, idx), one weighted compress at merge_delta
        mc AS (SELECT CASE scope WHEN '__evens__' THEN 0 ELSE 1 END
                          AS part, idx, mean, w
               FROM cidx WHERE scope IN ('__evens__', '__odds__')),
        mr AS (SELECT mean, w,
                      SUM(w) OVER (ORDER BY mean, part, idx
                                   ROWS UNBOUNDED PRECEDING) AS cum,
                      SUM(w) OVER () AS tot
               FROM mc),
        mb AS (SELECT mean, w,
                      CAST(floor({halfpi_mrg} *
                           asin(2.0*((cum - w/2.0)/tot) - 1.0))
                           AS BIGINT) AS bin
               FROM mr),
        mcent AS (SELECT bin, SUM(w*mean)/SUM(w) AS mean, SUM(w) AS w
                  FROM mb GROUP BY 1),
        midx AS (SELECT '__merged__' AS scope,
                        row_number() OVER (ORDER BY bin) - 1 AS idx,
                        mean, w
                 FROM mcent),
        allc AS (SELECT scope, idx, mean, w FROM cidx
                 UNION ALL
                 SELECT scope, idx, mean, w FROM midx),
        st0 AS (SELECT scope, CAST(COUNT(*) AS DOUBLE) AS n,
                       MIN(x) AS vmin, MAX(x) AS vmax
                FROM vals GROUP BY 1),
        st AS (SELECT * FROM st0
               UNION ALL
               SELECT '__merged__', SUM(n), MIN(vmin), MAX(vmax)
               FROM st0 WHERE scope IN ('__evens__', '__odds__'))
        SELECT scope, 'mean' AS fam, CAST(idx AS BIGINT) AS idx,
               mean AS val
        FROM allc
        UNION ALL
        SELECT scope, 'weight', CAST(idx AS BIGINT), w FROM allc
        UNION ALL
        SELECT scope, 'stat', 0, n FROM st
        UNION ALL
        SELECT scope, 'stat', 1, vmin FROM st
        UNION ALL
        SELECT scope, 'stat', 2, vmax FROM st
        ORDER BY 1, 2, 3
    """


# ---------------------------------------------- KLL compactor-state replay

KLL_FOLD_SOURCES = tuple(sorted(f"src{i}" for i in range(20))[:8])


def _kll_caps(k: int = 16, max_depth: int = 26) -> list:
    """Per-depth level capacities, exactly kernels/kll.py:_capacity."""
    import math
    return [max(8, int(math.ceil(k * (2.0 / 3.0) ** d)))
            for d in range(max_depth)]


def kll_compactor_replay_sql(k: int = 16,
                             sources: tuple = KLL_FOLD_SOURCES,
                             iters_per_fold: int = 4) -> str:
    """Exact SQL re-derivation of q_kll_compactor_replay: per-source
    single-batch KLL builds (kernels/kll.py:update) plus a fixed-order
    fold of merge() over `sources`, replayed compactor step by step.

    Single-batch closed form (validated against the kernel in
    tests/test_oracle_replay.py): one update() into an empty sketch
    compacts each level exactly once bottom-up with offset 0 (flips
    starts at 0), so the final state is ONE nonempty level s* holding
    the sorted ranks ≡ 0 (mod 2^s*), where s* is the least s with
    ceil(n/2^s) <= cap_total(s), flips = 2^s*-1, n_levels = s*+1.

    The fold replays merge() generically: concat levels, xor flips, max
    n_levels, then up to `iters_per_fold` unrolled compress steps — each
    finds the lowest over-capacity level (caps 16,11,8,8,... by depth
    from top for k=16), promotes the sorted even/odd half chosen by the
    level's CURRENT flips bit, and flips that bit. Measured step count
    per fold is <= 3 across 3..2500 values/source; 4 gives margin and a
    mismatch (not silence) if ever exceeded. MATERIALIZED CTEs keep the
    ~100-step chain from exponential inlining (same as the MG/BPE
    oracles).

    Emits (scope, fam, k1, k2, val): fam='item' rows (k1=level,
    k2=slot rank within level by value) and fam='stat' rows
    (k1=0..4 -> flips, n_levels, n, vmin, vmax; k2=0)."""
    if k != 16:
        raise ValueError("generated caps are specialized to k=16")
    caps = _kll_caps(k)
    cap_tot = [sum(caps[:s + 1]) for s in range(len(caps))]
    sstar_case = "CASE " + " ".join(
        f"WHEN ((n + {(1 << s) - 1}) // {1 << s}) <= {cap_tot[s]} "
        f"THEN {s}" for s in range(25)) + " ELSE 25 END"
    # cap_total(nlev) = sum of caps for depths 0..nlev-1
    captot_case = ("CASE nlev " + " ".join(
        f"WHEN {s + 1} THEN {cap_tot[s]}" for s in range(25)) +
        f" ELSE {cap_tot[24]} + 8 * (nlev - 25) END")
    cap_by_depth = ("CASE WHEN ({d}) = 0 THEN 16 WHEN ({d}) = 1 THEN 11 "
                    "ELSE 8 END")
    srclist = ", ".join(f"'{s}'" for s in sources)
    parts = [f"""WITH base AS MATERIALIZED (
  SELECT source AS scope, CAST(n_chars AS DOUBLE) AS x FROM documents),
cnt AS (SELECT scope, COUNT(*) AS n FROM base GROUP BY 1),
sstar AS MATERIALIZED (SELECT scope, n, {sstar_case} AS s FROM cnt),
rk AS (SELECT scope, x,
              row_number() OVER (PARTITION BY scope ORDER BY x) - 1 AS r
       FROM base),
items AS MATERIALIZED (
  SELECT b.scope, s.s AS lvl, b.x AS val
  FROM rk b JOIN sstar s USING (scope)
  WHERE b.r % (1 << s.s) = 0),
st AS MATERIALIZED (
  SELECT s.scope, s.n, (1 << s.s) - 1 AS flips,
         s.s + 1 AS nlev, v.vmin, v.vmax
  FROM sstar s JOIN (SELECT scope, MIN(x) AS vmin, MAX(x) AS vmax
                     FROM base GROUP BY 1) v USING (scope)),
i0_0 AS MATERIALIZED (SELECT lvl, val FROM items
                      WHERE scope = '{sources[0]}'),
m0_0 AS MATERIALIZED (
  SELECT COALESCE(MAX(flips), 0) AS flips,
         COALESCE(MAX(nlev), 1) AS nlev
  FROM st WHERE scope = '{sources[0]}')"""]

    def compress_block(prev: str, cur: str) -> str:
        d = f"d{cur}"
        return f""",
{d} AS MATERIALIZED (
  SELECT m.flips, m.nlev, t.total,
         ({captot_case.replace('nlev', 'm.nlev')}) AS captot,
         tg.target,
         (t.total > ({captot_case.replace('nlev', 'm.nlev')})
          AND tg.target IS NOT NULL) AS act
  FROM m{prev} m
  CROSS JOIN (SELECT COUNT(*) AS total FROM i{prev}) t
  CROSS JOIN (SELECT MIN(lc.lvl) AS target
              FROM (SELECT lvl, COUNT(*) AS c FROM i{prev}
                    GROUP BY 1) lc, m{prev} mm
              WHERE lc.c > ({cap_by_depth.format(
                  d='mm.nlev - 1 - lc.lvl')})) tg),
i{cur} AS MATERIALIZED (
  SELECT i.lvl, i.val FROM i{prev} i, {d} x
  WHERE (NOT x.act) OR i.lvl <> x.target
  UNION ALL
  SELECT x.target + 1, s.val
  FROM {d} x,
       (SELECT i2.val,
               row_number() OVER (ORDER BY i2.val) - 1 AS r
        FROM i{prev} i2, {d} x2
        WHERE x2.act AND i2.lvl = x2.target) s
  WHERE x.act AND s.r % 2 = (x.flips // (1 << x.target)) % 2),
m{cur} AS MATERIALIZED (
  SELECT CASE WHEN act THEN xor(flips, 1 << target) ELSE flips END
             AS flips,
         CASE WHEN act THEN GREATEST(nlev, target + 2) ELSE nlev END
             AS nlev
  FROM {d})"""

    prev = "0_0"
    for f in range(1, len(sources)):
        cur = f"{f}_0"
        parts.append(f""",
i{cur} AS MATERIALIZED (
  SELECT lvl, val FROM i{prev}
  UNION ALL
  SELECT lvl, val FROM items WHERE scope = '{sources[f]}'),
m{cur} AS MATERIALIZED (
  SELECT xor(m.flips, COALESCE(s.flips, 0)) AS flips,
         GREATEST(m.nlev, COALESCE(s.nlev, 1)) AS nlev
  FROM m{prev} m
  LEFT JOIN (SELECT flips, nlev FROM st
             WHERE scope = '{sources[f]}') s ON TRUE)""")
        prev = cur
        for j in range(1, iters_per_fold + 1):
            cur = f"{f}_{j}"
            parts.append(compress_block(prev, cur))
            prev = cur
    parts.append(f""",
mstat AS (SELECT COALESCE(SUM(n), 0) AS n, MIN(vmin) AS vmin,
                 MAX(vmax) AS vmax
          FROM st WHERE scope IN ({srclist}))
SELECT scope, 'item' AS fam, CAST(lvl AS BIGINT) AS k1,
       row_number() OVER (PARTITION BY scope, lvl ORDER BY val) - 1
           AS k2,
       val
FROM items
UNION ALL
SELECT '__merged__', 'item', CAST(lvl AS BIGINT),
       row_number() OVER (PARTITION BY lvl ORDER BY val) - 1, val
FROM i{prev}
UNION ALL
SELECT scope, 'stat', s.k1, 0,
       CASE s.k1 WHEN 0 THEN CAST(flips AS DOUBLE)
                 WHEN 1 THEN CAST(nlev AS DOUBLE)
                 WHEN 2 THEN CAST(n AS DOUBLE)
                 WHEN 3 THEN vmin ELSE vmax END
FROM st CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3), (4))
    s(k1)
UNION ALL
SELECT '__merged__', 'stat', s.k1, 0,
       CASE s.k1 WHEN 0 THEN CAST(m.flips AS DOUBLE)
                 WHEN 1 THEN CAST(m.nlev AS DOUBLE)
                 WHEN 2 THEN CAST(ms.n AS DOUBLE)
                 WHEN 3 THEN ms.vmin ELSE ms.vmax END
FROM m{prev} m CROSS JOIN mstat ms
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3), (4)) s(k1)
ORDER BY 1, 2, 3, 4""")
    return "".join(parts)
