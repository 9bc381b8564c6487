"""Run the full dedup pipeline at a given parallelism; print one JSON line
{cores, n_docs, runs: [...], wall_sec, docs_per_sec, clusters_checksum}.

Invoked as a subprocess by scaling.py (one JVM per parallelism level).

`--repeat N` (default 2) runs the pipeline N times in the same JVM, clearing
the Spark cache between runs; `wall_sec` reports the MINIMUM across runs
(the steady state).  Rationale: this sandbox's VM returns freed guest frames to the host
(free-page reporting), so the first run of any footprint re-faults cold
memory at hypervisor speed — a cost a long-running production job on a real
cluster pays once per executor lifetime, not per job.  The cold run is still
reported in `runs` for transparency.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webdedup.config import DedupConfig  # noqa: E402
from webdedup.pipeline import run_dedup  # noqa: E402
from webdedup.session import get_spark, warm_python_workers  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True, help="parquet dir with the pages table")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name=f"scaling-{args.cores}", cores=args.cores)
    warm_python_workers(spark, args.cores)  # worker pool up (not timed)
    pages = spark.read.parquet(args.input)
    n_docs = pages.count()  # warm: JVM up, footers read (not timed)

    runs: list[float] = []
    checksum = ""
    for _ in range(max(args.repeat, 1)):
        spark.catalog.clearCache()
        # big heaps GC rarely, so the ContextCleaner (which piggybacks on
        # driver GC to delete finished shuffle files) lags a whole run
        # behind — two repeats accumulated ~35 GB of dead shuffle files and
        # filled the disk.  Force a full GC so each repeat starts clean.
        spark.sparkContext._jvm.System.gc()
        pages = spark.read.parquet(args.input)
        t0 = time.time()
        out = run_dedup(spark, pages, DedupConfig(), with_golden=False)
        # distributed, order-insensitive output checksum: no driver collect
        # (ANSI mode: decimal(38,0) keeps the sum overflow-proof)
        from pyspark.sql import functions as F

        row = (
            out["clusters"]
            .agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("url", "gid").cast("decimal(38,0)")).alias("h"),
            )
            .collect()[0]
        )
        runs.append(round(time.time() - t0, 2))
        checksum = hashlib.md5(f"{row['n']}:{row['h']}".encode()).hexdigest()
        print(f"  run {len(runs)}: {runs[-1]}s", file=sys.stderr, flush=True)

    # min across repeats: the host reclaims idle guest frames continuously,
    # so any single run can absorb tens of seconds of re-fault noise; the
    # minimum is the standard low-noise estimator of the engine's real cost
    wall = min(runs)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_docs": n_docs,
                "runs": runs,
                "wall_sec": wall,
                "docs_per_sec": round(n_docs / wall, 1),
                "clusters_checksum": checksum,
            }
        )
    )


if __name__ == "__main__":
    main()
