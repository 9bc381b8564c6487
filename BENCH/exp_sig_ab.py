"""A/B the signatures stage: old (two UDFs + shingle-table persist + JVM
sketch sort) vs new (fused struct UDF, linear, no persist).  One variant per
JVM:  python BENCH/exp_sig_ab.py {old|new} <cores> [input]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webdedup.config import DedupConfig  # noqa: E402
from webdedup.session import get_spark, warm_python_workers  # noqa: E402


def main() -> None:
    variant = sys.argv[1]
    cores = int(sys.argv[2])
    input_dir = sys.argv[3] if len(sys.argv) > 3 else "BENCH/data/pages_150000_x4"
    if variant == "old":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "old_signatures", "/tmp/oldmod/old_signatures.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    else:
        import webdedup.signatures as mod

    spark = get_spark(app_name=f"sig-ab-{variant}-{cores}", cores=cores)
    warm_python_workers(spark, cores)
    pages = spark.read.parquet(input_dir)
    pages.count()
    cfg = DedupConfig()
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        sigs = mod.compute_signatures(spark.read.parquet(input_dir), cfg).persist()
        n = sigs.count()
        runs.append(round(time.time() - t0, 2))
        sigs.unpersist()
        print(f"  {variant} cores={cores} run: {runs[-1]}s", file=sys.stderr, flush=True)
    print(f"RESULT variant={variant} cores={cores} rows={n} runs={runs} min={min(runs)}")
    spark.stop()


if __name__ == "__main__":
    main()
