"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The dedup pipeline (the engine's flagship) runs over the documents table;
relational/ANN/text-analysis queries cover the rest of the operator surface.
Each query is forced with a noop write (full plan execution, no driver
collect).  See BENCH/ for the N-vs-4N scaling-efficiency protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from webdedup.session import get_spark, warm_python_workers  # noqa: E402

# token_jaccard_pairs is deliberately absent: it is the quadratic
# brute-force ORACLE used by the correctness gate, not a production path —
# the LSH pipeline (minhash_clusters) is the scalable equivalent.
HEADLINE = [
    "minhash_clusters",        # flagship: full LSH dedup pipeline
    "dedup_exact_groups",
    "substring_overlaps",
    "ann_cosine_topk",
    "ann_rp_lsh",
    "ann_ivf",
    "semantic_dedup",
    "quality_scores",
    "repetition_stats",
    "chunk_dedup",
    "decontaminate",
    "incremental_dedup",
    "mix_corpus",
    "pii_scrub",
    "gopher_filter",
    "lang_id",
    "doc_fingerprint",
    "bpe_token_counts",
    "media_features",
    "pricing_summary",
    "top_orders_per_customer",
    "nation_revenue",
    "golden_record_users",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


# Repeats per query, SQL cache cleared between runs so every repeat is a
# FULL recompute (no cached-stage reuse): this sandbox VM's host reclaims
# idle guest frames, which can inflate any single run 2-4x (measured
# back-to-back identical runs: 22-82 s; one session measured the SAME
# flagship at 44.2 s then 18.0 s across two bench invocations minutes
# apart) — min across full repeats is the steady state, the same protocol
# BENCH/BASELINE.md documents for the scaling runs.  3 repeats because a
# 2-repeat min still landed entirely inside one bad reclaim window.
REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))


def prewarm_memory(target_gb: int) -> None:
    """Touch `target_gb` of anonymous memory once so the JVM/worker
    allocations land on warm guest frames (same pathology + fix as
    BENCH/prewarm.py: never-touched frames fault at 6-1000 us/page).
    Cheap on an already-warm VM, bounded either way."""
    chunk = 1 << 30
    t0 = time.time()
    for _ in range(target_gb):
        buf = bytearray(chunk)
        for off in range(0, chunk, 4096):
            buf[off] = 1
        del buf
        if time.time() - t0 > 120:  # hard cap: never let warmup eat the run
            break


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="webdedup-bench", cores=cpus)
    qs = entrymod.queries()

    # warm the JVM + python worker pool + parquet footers (not timed), then
    # one tiny flagship pass at sf0.001: compiles the same generated stage
    # classes / JIT paths the sf0.1 flagship uses (a real executor pays this
    # once per lifetime, not once per job)
    prewarm_memory(int(os.environ.get("SPARK_GRAFT_PREWARM_GB", "24")))
    warm_python_workers(spark, cpus)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    # warm against sf0.001 when present (cheapest), else the bench dir
    # itself — a custom SPARK_GRAFT_SF_DIR must not crash the whole bench
    # on a machine without /root/testdata
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{warm_dir}/documents.parquet"):
        warm_dir = sf_dir
    force(qs["minhash_clusters"](spark, warm_dir))
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in HEADLINE:
        best = None
        for _ in range(REPEAT):
            spark.catalog.clearCache()
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - t_all, 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs_per_sec = round(n_docs / timings["minhash_clusters"], 1)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "dedup_docs_per_sec": docs_per_sec,
                "repeats": REPEAT,
                "wall_sec_all_repeats": wall,
            }
        )
    )


if __name__ == "__main__":
    main()
