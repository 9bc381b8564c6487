"""Microbench: minhash_block chunk-size sweep, solo vs all-cores.

Hypothesis: the (num_perm x _CHUNK_SHINGLES) scratch matrices (66 MB at
1<<16) blow the L2/L3 cache, making the kernel DRAM-bandwidth-bound — which
is why the signature stage only scaled 1.3x from local[8] to local[32]
(32 workers share one memory bus).  A chunk that keeps the working set
cache-resident should scale near-linearly.

Run: python BENCH/microbench_minhash.py
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def work(args):
    chunk, n_batches = args
    import webdedup.signatures as sig

    sig._CHUNK_SHINGLES = chunk
    sig._SCRATCH.clear()
    rng = np.random.default_rng(1234)
    # one Arrow-batch-shaped call: ~300 docs x ~200 shingles
    lists = [rng.integers(-(2**62), 2**62, size=200, dtype=np.int64) for _ in range(300)]
    vals = np.array(lists, dtype=object)
    lengths = np.fromiter((len(s) for s in vals), dtype=np.int64)
    seeds = sig._perm_params(126, 97531)
    # warm scratch
    for s, e in sig._row_chunks(lengths, chunk):
        sig.minhash_block(vals[s:e], seeds, 126)
    t0 = time.time()
    for _ in range(n_batches):
        for s, e in sig._row_chunks(lengths, chunk):
            sig.minhash_block(vals[s:e], seeds, 126)
    dt = time.time() - t0
    return 300 * n_batches / dt  # docs/sec per process


def main() -> None:
    for chunk in (1 << 16, 1 << 14, 1 << 12, 1 << 11):
        solo = work((chunk, 20))
        nproc = 32
        with ProcessPoolExecutor(nproc) as ex:
            rates = list(ex.map(work, [(chunk, 20)] * nproc))
        agg = sum(rates)
        print(
            f"chunk={chunk:>6}  solo={solo:>8.0f} docs/s  "
            f"x{nproc}={agg:>9.0f} docs/s  scaling={agg / solo / nproc:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
