"""ml-vs-rule decision-path bench at corpus scale (round-3 verdict punch #6).

The rule path has scaling numbers (BENCH/scaling.py); the learned path
(question-loop label budget -> GBT -> PruningPipe assembly) had none — this
gives it a wall-time + recall baseline before anyone scales it.

Driver mode (no --variant): interleaves rule,ml,rule,ml samples, one JVM
per sample, prints a summary JSON and writes BENCH/ml_bench_<docs>.json.
Sample mode (--variant rule|ml): one timed pipeline run in this JVM.

The planted truth (the ml path's labeler AND both paths' recall oracle) is
rebuilt via synth.generate_truth_spark with the corpus snapshot's exact
generation parameters — truth never ships in the snapshot.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = Path(__file__).parent

# the BENCH/data/pages_150000_x4 snapshot's generation parameters
GEN = dict(n_docs=150_000, seed=42, partitions=64, text_scale=4)


def run_sample(
    variant: str, cores: int, input_dir: str, questions: int, cv: bool = False
) -> dict:
    from pyspark.sql import functions as F

    from webdedup.config import DedupConfig
    from webdedup.metrics import pair_metrics, pairs_from_clusters
    from webdedup.pipeline import run_dedup
    from webdedup.session import get_spark, warm_python_workers
    from webdedup.synth import generate_truth_spark

    spark = get_spark(app_name=f"ml-bench-{variant}", cores=cores)
    warm_python_workers(spark, cores)
    pages = spark.read.parquet(input_dir)
    n_docs = pages.count()  # warm (not timed)
    assert n_docs == GEN["n_docs"], (n_docs, GEN)
    truth = generate_truth_spark(spark, **GEN).persist()
    truth_pairs = truth.select("url_a", "url_b")
    truth_pairs.count()  # labeler materialized up front (not timed)

    t0 = time.time()
    out = run_dedup(
        spark,
        spark.read.parquet(input_dir),
        DedupConfig(),
        with_golden=False,
        decision=variant,
        truth_pairs=truth_pairs if variant == "ml" else None,
        n_questions=questions,
        cross_validate=cv and variant == "ml",
    )
    row = (
        out["clusters"]
        .agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("url", "gid").cast("decimal(38,0)")).alias("h"),
        )
        .collect()[0]
    )
    wall = round(time.time() - t0, 2)
    checksum = hashlib.md5(f"{row['n']}:{row['h']}".encode()).hexdigest()

    # recall AFTER the clock: the oracle join is bench harness, not engine
    pred = pairs_from_clusters(out["clusters"])
    m = pair_metrics(pred, truth_pairs)
    return {
        "variant": variant,
        "cores": cores,
        "n_docs": n_docs,
        "wall_sec": wall,
        "docs_per_sec": round(n_docs / wall, 1),
        "clusters_checksum": checksum,
        "recall": round(m["recall"], 6),
        "precision": round(m["precision"], 6),
        "n_questions": questions if variant == "ml" else None,
        "cross_validate": cv if variant == "ml" else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["rule", "ml"], default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--input", default=str(HERE / "data" / "pages_150000_x4"))
    ap.add_argument("--questions", type=int, default=200)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument(
        "--cv",
        action="store_true",
        help="ml samples run with cross_validate=True (CrossValidator grid "
        "over the GBT pipeline); result file gets a _cv suffix",
    )
    args = ap.parse_args()

    if args.variant:
        print(
            json.dumps(
                run_sample(
                    args.variant, args.cores, args.input, args.questions, cv=args.cv
                )
            )
        )
        return

    samples: dict[str, list[dict]] = {"rule": [], "ml": []}
    for i in range(args.samples):
        for variant in ("rule", "ml"):  # interleaved: same host-noise regime
            out = subprocess.run(
                [
                    sys.executable,
                    str(HERE / "ml_bench.py"),
                    "--variant",
                    variant,
                    "--cores",
                    str(args.cores),
                    "--input",
                    args.input,
                    "--questions",
                    str(args.questions),
                    *(["--cv"] if args.cv and variant == "ml" else []),
                ],
                capture_output=True,
                text=True,
            )
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-4000:])
                raise SystemExit(f"sample {variant}#{i} failed")
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            res = json.loads(line)
            samples[variant].append(res)
            print(
                f"sample {i}: {variant} -> {res['wall_sec']}s "
                f"recall={res['recall']} precision={res['precision']}",
                file=sys.stderr,
                flush=True,
            )

    def steady(rs: list[dict]) -> dict:
        best = min(rs, key=lambda r: r["wall_sec"])
        return {**best, "runs": [r["wall_sec"] for r in rs]}

    rule, ml = steady(samples["rule"]), steady(samples["ml"])
    result = {
        "n_docs": rule["n_docs"],
        "cores": args.cores,
        "cross_validate": args.cv,
        "rule": rule,
        "ml": ml,
        "ml_over_rule": round(ml["wall_sec"] / rule["wall_sec"], 3),
        "recall_gap": round(ml["recall"] - rule["recall"], 6),
    }
    print(json.dumps(result, indent=2))
    suffix = "_cv" if args.cv else ""
    (HERE / f"ml_bench_{rule['n_docs']}{suffix}.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
