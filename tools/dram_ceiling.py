"""Quantify the single-box memory-bandwidth ceiling behind the 8→32 band.

Every round, local[8]→local[32] scaling efficiency lands in 0.45-0.6 while
2→8 holds ≥0.8, and BENCH.md attributes the gap to shared DRAM bandwidth.
This tool turns that attribution into a measurement (round-4 verdict #10):

For K worker PROCESSES in 1,2,4,8,16,32 (separate address spaces — no GIL,
no shared allocator), barrier-synchronized so the timed windows overlap:

  * memcpy leg — each worker repeatedly copies a private 256 MB buffer.
    Aggregate copy traffic (2 bytes moved per byte copied: read + write)
    versus K is the box's usable DRAM bandwidth curve. Pure bandwidth,
    zero compute: where THIS saturates is the hardware ceiling.
  * kernel leg — each worker runs the sketch scan's exact numpy hot path
    (hash64 splitmix finalizer → np.unique dedupe → HLL dense register
    scatter, sgp_sketch/kernels/{hashing,hll}.py) over a private 16M-token
    chunk. Aggregate tokens/s versus K is the workload curve.
  * alu leg — control: same K processes, same barrier, but a register-width
    multiply-xor chain over ONE cache-resident 64 KB block (loops in L1/L2,
    touches no DRAM). If contention were scheduler- or thermal-induced
    rather than bandwidth-induced, this leg would bend the same way as the
    others. It staying near-linear isolates the cause to memory traffic.

Outputs one JSON line (and a markdown table on stderr) with, per leg,
aggregate throughput at each K, per-doubling efficiency, and the implied
kernel bytes/token at saturation:

    implied_B_per_tok = memcpy_ceiling_bytes_per_sec / kernel_tok_per_sec_plateau

which can be sanity-checked against the analytic pass count of the hot path
(hash64 ≈ 6 read+write passes over 8 B/token, np.unique sort ≈ 4-8 passes,
register scatter ≈ 4 passes over mixed widths → roughly 200-500 B/token of
DRAM traffic per token once chunks exceed cache).

Usage: python tools/dram_ceiling.py [--quick] [--json OUT.json]
  --quick: K in 1,4,16,32 and half the repetitions (~90 s instead of ~4 min).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MEMCPY_MB = 256
KERNEL_TOKENS = 16_000_000
ALU_BLOCK = 8192  # uint64 → 64 KB, L1/L2-resident


def _memcpy_worker(barrier, reps, out, slot):
    buf = np.ones(MEMCPY_MB * 131072, dtype=np.uint64)  # 256 MB
    dst = np.empty_like(buf)
    np.copyto(dst, buf)  # fault the pages before the timed window
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, buf)
    out[slot] = time.perf_counter() - t0


def _kernel_worker(barrier, reps, out, slot):
    from sgp_sketch.kernels.hashing import hash64
    from sgp_sketch.kernels.hll import HLL

    rng = np.random.default_rng(slot)
    # Zipf-ish token ids like the bench table: dedupe does real work
    toks = rng.integers(0, 1 << 20, size=KERNEL_TOKENS, dtype=np.int64)
    h = HLL(p=14)
    h._to_dense()  # measure the steady-state dense path, not sparse churn
    h.update(toks[:1024])  # import/JIT warmth
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        h.update_hashes(np.unique(hash64(toks)), assume_unique=True)
    out[slot] = time.perf_counter() - t0


def _alu_worker(barrier, reps, out, slot):
    block = np.arange(ALU_BLOCK, dtype=np.uint64)
    mul = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros_like(block)
    barrier.wait()
    t0 = time.perf_counter()
    # ~1-2 s window per worker (a KERNEL_TOKENS-scaled count gave ~20 ms,
    # which barrier jitter + interpreter dispatch noise dominated)
    for _ in range(reps * 25_000):
        acc ^= block * mul
        acc ^= acc >> np.uint64(29)
    out[slot] = time.perf_counter() - t0


LEGS = {
    # leg -> (worker, reps, work-per-rep, unit); reps sized so every
    # worker's timed window is >= ~2 s — sub-second windows get polluted
    # by scheduler jitter and co-tenant bursts even under best-of
    "memcpy": (_memcpy_worker, 48, 2 * MEMCPY_MB * 1024 * 1024, "bytes"),
    "kernel": (_kernel_worker, 6, KERNEL_TOKENS, "tokens"),
    # work-per-rep: 25k iterations x 2 vector statements x ALU_BLOCK lanes
    "alu": (_alu_worker, 8, 25_000 * 2 * ALU_BLOCK, "ops"),
}


def run_leg(leg: str, k: int, reps_scale: float = 1.0) -> float:
    """Aggregate throughput (work units/sec) with k synchronized workers.

    Throughput is total work / SLOWEST worker's window — the pessimistic
    aggregate, matching how a barrier-synchronized Spark stage completes.
    """
    worker, reps, work, _ = LEGS[leg]
    reps = max(1, int(reps * reps_scale))
    barrier = mp.Barrier(k)
    out = mp.Array("d", k)
    procs = [mp.Process(target=worker, args=(barrier, reps, out, i))
             for i in range(k)]
    for p in procs:
        p.start()
    # join with a timeout: a worker killed pre-barrier (e.g. OOM on the
    # 16 GB K=32 memcpy allocation) leaves the others blocked in
    # Barrier.wait() forever; and a dead worker's out[slot] stays 0.0,
    # which `max` would silently skip while its work is still credited —
    # fail loudly instead of reporting an inflated curve point
    deadline = time.monotonic() + 600
    for p in procs:
        p.join(timeout=max(1.0, deadline - time.monotonic()))
    if any(p.is_alive() or p.exitcode != 0 for p in procs):
        for p in procs:
            p.kill()
        raise RuntimeError(
            f"{leg} k={k}: worker died or hung "
            f"(exitcodes={[p.exitcode for p in procs]})")
    slowest = max(out[:])
    return k * reps * work / slowest


def main() -> int:
    quick = "--quick" in sys.argv
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    # --merge prev.json (repeatable): fold previous runs' curves in by
    # elementwise max. Same estimator as best-of-tries WITHIN a run —
    # a co-tenant burst can only LOWER a barrier-synchronized window's
    # throughput, so the max across independent runs is the
    # least-contended (closest-to-hardware) estimate of each point.
    # A single run on this shared VM reliably has 1-2 polluted points
    # (observed: a K=16 kernel window at 0.39x its K=8 neighbor).
    merge_files = [sys.argv[i + 1] for i, a in enumerate(sys.argv)
                   if a == "--merge"]
    ks = [1, 4, 16, 32] if quick else [1, 2, 4, 8, 16, 32]
    scale = 0.5 if quick else 1.0
    results: dict = {"ks": ks, "legs": {}}
    for leg in LEGS:
        # best-of-N per point: a co-tenant burst can only LOWER a window's
        # throughput, so max over tries is the least-contended estimate;
        # low-K points are cheap, so buy them extra tries
        curve = [max(run_leg(leg, k, scale)
                     for _ in range(1 if quick else (3 if k <= 4 else 2)))
                 for k in ks]
        results["legs"][leg] = [round(c, 1) for c in curve]
        print(f"{leg}: " + "  ".join(
            f"K={k}:{c:,.3g}/s" for k, c in zip(ks, curve)), file=sys.stderr)

    results["runs_merged"] = 1
    for mf in merge_files:
        with open(mf) as f:
            prev = json.load(f)
        if prev.get("ks") != ks:
            print(f"merge: {mf} has ks={prev.get('ks')} != {ks}, skipped",
                  file=sys.stderr)
            continue
        for leg, curve in results["legs"].items():
            results["legs"][leg] = [max(a, b) for a, b in
                                    zip(curve, prev["legs"][leg])]
        results["runs_merged"] += prev.get("runs_merged", 1)

    # per-step efficiency: throughput(K_j) / (throughput(K_i) * K_j/K_i)
    eff = {}
    for leg, curve in results["legs"].items():
        eff[leg] = [round(curve[j] / (curve[j - 1] * ks[j] / ks[j - 1]), 3)
                    for j in range(1, len(ks))]
    results["step_efficiency"] = eff

    mem = results["legs"]["memcpy"]
    ker = results["legs"]["kernel"]
    alu = results["legs"]["alu"]
    results["memcpy_ceiling_gbs"] = round(max(mem) / 1e9, 2)
    results["kernel_plateau_tok_s"] = round(max(ker), 1)
    results["implied_bytes_per_token"] = round(max(mem) / max(ker), 1)
    # Bandwidth-attribution verdict, reported as NUMBERS (r4's booleans
    # flipped on threshold noise): the DRAM-bound legs (memcpy, kernel)
    # should show materially lower final-doubling efficiency than the
    # cache-resident ALU control. If contention were scheduler/thermal/
    # hypervisor-steal instead, all three legs would bend together.
    last = len(ks) - 1
    results["verdict"] = {
        "final_step_eff": {leg: eff[leg][-1] for leg in eff},
        "kernel_plateau_vs_linear": round(
            ker[last] / (ker[0] * ks[last]), 3),
        "alu_scaling_vs_linear": round(
            alu[last] / (alu[0] * ks[last]), 3),
        "alu_minus_kernel_final_eff": round(
            eff["alu"][-1] - eff["kernel"][-1], 3),
    }
    line = json.dumps(results)
    print(line)
    if json_out:
        with open(json_out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
