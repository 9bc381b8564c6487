"""Run the full dedup pipeline once at a given parallelism; print one JSON
line {cores, n_docs, wall_sec, docs_per_sec, clusters_checksum}.

Invoked as a subprocess by scaling.py (one JVM per parallelism level).
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
from webdedup.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True, help="parquet dir with the pages table")
    args = ap.parse_args()

    spark = get_spark(app_name=f"scaling-{args.cores}", cores=args.cores)
    pages = spark.read.parquet(args.input)
    n_docs = pages.count()  # warm: JVM up, footers read (not timed)

    t0 = time.time()
    out = run_dedup(spark, pages, DedupConfig(), with_golden=False)
    rows = out["clusters"].select("url", "gid").orderBy("url", "gid").collect()
    wall = time.time() - t0

    checksum = hashlib.md5(
        "\n".join(f"{r['url']}\t{r['gid']}" for r in rows).encode()
    ).hexdigest()
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "clusters_checksum": checksum,
            }
        )
    )


if __name__ == "__main__":
    main()
