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
    "quality_scores",
    "lang_id",
    "doc_fingerprint",
    "media_features",
    "pricing_summary",
    "top_orders_per_customer",
    "nation_revenue",
    "golden_record_users",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="webdedup-bench", cores=cpus)
    qs = entrymod.queries()

    # warm the JVM + python worker pool + parquet footers (not timed)
    warm_python_workers(spark, cpus)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

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
            }
        )
    )


if __name__ == "__main__":
    main()
