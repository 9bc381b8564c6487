"""Controlled experiment: signatures-stage wall time vs heap config.

Isolates the cause of a 5x signatures regression observed when the driver
heap was raised from 16g to 64g at local[32] (lazy heap growth vs chunk-size
change vs noise).  Usage:
    python BENCH/exp_signatures.py <cores> <heap e.g. 16g|64g> [pretouch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webdedup.config import DedupConfig  # noqa: E402
from webdedup.session import get_spark, warm_python_workers  # noqa: E402
from webdedup.signatures import compute_signatures  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    heap = sys.argv[2]
    pretouch = len(sys.argv) > 3 and sys.argv[3] == "pretouch"
    os.environ["SPARK_DRIVER_MEMORY"] = heap
    extra = {}
    if pretouch:
        extra["spark.driver.extraJavaOptions"] = (
            f"-Xms{heap} -XX:+AlwaysPreTouch"
        )
    t_boot = time.time()
    spark = get_spark(app_name=f"exp-sig-{cores}-{heap}", cores=cores, extra_conf=extra)
    warm_python_workers(spark, cores)
    pages = spark.read.parquet("BENCH/data/pages_150000_x4")
    pages.count()
    boot = time.time() - t_boot

    cfg = DedupConfig()
    t0 = time.time()
    sigs = compute_signatures(pages, cfg).persist()
    n = sigs.count()
    dt = time.time() - t0
    print(
        f"RESULT cores={cores} heap={heap} pretouch={pretouch} "
        f"boot={boot:.1f}s signatures={dt:.1f}s rows={n}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
