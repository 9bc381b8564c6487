"""Memory-bandwidth ceiling measurement for the scaling evidence.

The north-rule criterion is throughput scaling efficiency >= 0.8 from N to
4N EXECUTORS.  On a real cluster, 4x executors bring 4x memory channels; on
this one box, every core shares one memory controller.  BASELINE.md argues
the local[8] -> local[32] job efficiency (~0.29) is that shared-DRAM wall,
not a plan defect.  This benchmark makes the argument quantitative: it
measures the BOX's aggregate achievable memory bandwidth at 1/2/8/32
concurrent processes with a STREAM-style triad kernel (a[:] = b + s*c) over
arrays far larger than L3.  If raw hardware bandwidth itself stops scaling
past ~8 workers, no memory-traffic-bound job on this box can scale past it
either — the job's 8->32 efficiency is bounded above by STREAM's.

Protocol: one OS process per worker (no GIL, no shared allocator), each
touches its arrays before the barrier (page-fault cost excluded), then runs
the kernel for DURATION seconds and reports bytes moved (standard STREAM
triad accounting: 24 B/element — two reads + one write, write-allocate not
counted).  Aggregate GB/s = sum(worker bytes) / max(worker elapsed).

Usage: python BENCH/membw.py [--workers 1,2,8,32] [--mb 64] [--seconds 3]
[--repeat 3].  Prints one JSON line per level plus a summary with the
2->8 and 8->32 scaling efficiency of the hardware itself.  Each level runs
--repeat times and keeps the MAX bandwidth (same rationale as run_one.py's
min-of-repeats: the host reclaims idle guest frames, so any single run can
absorb re-fault stalls; the best repeat is the steady state).  Run on an
otherwise-idle box — concurrent load (e.g. a pytest Spark session) deflates
low-worker levels most and skews the ratio.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(mb: int, seconds: float, barrier, out_q) -> None:
    os.environ["NUMPY_MADVISE_HUGEPAGE"] = "0"  # see webdedup/session.py
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.zeros(n)
    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    s = 1.000001
    # prewarm: touch every page of all three arrays and JIT nothing
    np.add(b, c, out=a)
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while True:
        np.multiply(c, s, out=a)
        np.add(a, b, out=a)  # a = b + s*c, two passes (numpy has no fma)
        iters += 1
        el = time.perf_counter() - t0
        if el >= seconds:
            break
    # per iteration: pass1 reads c + writes a, pass2 reads a,b + writes a
    # -> 5 array touches x 8 B x n (conservative; write-allocate would add 2)
    out_q.put((5 * 8 * n * iters, el))


def run_level(workers: int, mb: int, seconds: float, repeat: int = 3) -> dict:
    runs = [_run_once(workers, mb, seconds) for _ in range(repeat)]
    best = max(runs, key=lambda r: r["gb_per_sec"])
    best["all_runs_gb_per_sec"] = [r["gb_per_sec"] for r in runs]
    return best


def _run_once(workers: int, mb: int, seconds: float) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(workers)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(mb, seconds, barrier, q))
        for _ in range(workers)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    total_bytes = sum(r[0] for r in results)
    elapsed = max(r[1] for r in results)
    return {
        "workers": workers,
        "gb_per_sec": round(total_bytes / elapsed / 1e9, 2),
        "seconds": round(elapsed, 2),
        "mb_per_worker": mb * 3 * 8 // 8,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,8,32")
    ap.add_argument("--mb", type=int, default=64, help="MB per array (x3 arrays)")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    levels = [int(w) for w in args.workers.split(",")]
    out = {}
    for w in levels:
        r = run_level(w, args.mb, args.seconds, args.repeat)
        out[w] = r
        print(json.dumps(r), flush=True)
    for lo, hi in ((2, 8), (8, 32)):
        if lo in out and hi in out:
            eff = out[hi]["gb_per_sec"] / out[lo]["gb_per_sec"] / (hi // lo)
            print(
                json.dumps(
                    {
                        "metric": f"membw_scaling_efficiency_{lo}_to_{hi}",
                        "value": round(eff, 3),
                        f"bw_{lo}": out[lo]["gb_per_sec"],
                        f"bw_{hi}": out[hi]["gb_per_sec"],
                    }
                )
            )


if __name__ == "__main__":
    main()
