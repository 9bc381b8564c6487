"""spark-submit entry point (north rule: launched via spark-submit --py-files).

Usage:
    # package the library for the executors
    python -m webdedup.cli package --out /tmp/webdedup.zip

    # run the pipeline on a pages parquet table (the primary script is this
    # file; executors import the library from the shipped zip)
    spark-submit --master yarn --py-files /tmp/webdedup.zip cli.py run \
        --input /path/to/pages_parquet --checkpoint /path/to/ckpt --output /path/out

    # generate a synthetic corpus
    python -m webdedup.cli synth --n-docs 10000 --out /tmp/pages

In this sandbox spark-submit and the local SparkSession produce the same
local[N] execution; on a real cluster only --master changes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile
from pathlib import Path


def cmd_package(args: argparse.Namespace) -> None:
    root = Path(__file__).resolve().parent
    out = Path(args.out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(root.rglob("*.py")):
            zf.write(py, arcname=f"webdedup/{py.relative_to(root)}")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


def cmd_synth(args: argparse.Namespace) -> None:
    from webdedup.session import get_spark
    from webdedup.synth import generate_pages, pages_to_spark

    spark = get_spark(app_name="webdedup-synth", cores=args.cores)
    pages_pd, truth_pairs, truth_clusters = generate_pages(
        n_docs=args.n_docs, seed=args.seed
    )
    pages_to_spark(spark, pages_pd, partitions=args.partitions).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/pages")
    spark.createDataFrame(truth_pairs).write.mode("overwrite").parquet(
        f"{args.out}/truth_pairs"
    )
    spark.createDataFrame(truth_clusters).write.mode("overwrite").parquet(
        f"{args.out}/truth_clusters"
    )
    print(f"wrote {args.out}/(pages|truth_pairs|truth_clusters), n={args.n_docs}")


def cmd_run(args: argparse.Namespace) -> None:
    from pyspark.sql import SparkSession

    from webdedup.config import DedupConfig
    from webdedup.pipeline import run_dedup

    # under spark-submit a session already exists; standalone we build one
    active = SparkSession.getActiveSession()
    if active is None:
        from webdedup.session import get_spark

        spark = get_spark(app_name="webdedup-run", cores=args.cores)
    else:
        spark = active

    cfg = DedupConfig(**json.loads(args.config)) if args.config else DedupConfig()
    pages = spark.read.parquet(args.input)
    if args.decision == "ml" and not args.truth:
        raise SystemExit("--decision ml requires --truth (labeled-pairs parquet)")
    truth = spark.read.parquet(args.truth) if args.truth else None
    out = run_dedup(
        spark,
        pages,
        cfg,
        checkpoint_dir=args.checkpoint,
        decision=args.decision,
        truth_pairs=truth.select("url_a", "url_b") if truth is not None else None,
        n_questions=args.n_questions,
        keeper=args.keeper,
    )
    out["clusters"].write.mode("overwrite").parquet(f"{args.output}/clusters")
    if "golden" in out:
        out["golden"].write.mode("overwrite").parquet(f"{args.output}/golden")
    if "keepers" in out:
        out["keepers"].write.mode("overwrite").parquet(f"{args.output}/keepers")
    stats = (
        out["clusters"]
        .groupBy("gid")
        .count()
        .selectExpr(
            "count(*) AS n_groups",
            "sum(CASE WHEN count > 1 THEN 1 ELSE 0 END) AS n_dup_groups",
            "sum(count) AS n_docs",
        )
        .first()
    )
    print(json.dumps({k: int(stats[k]) for k in ("n_groups", "n_dup_groups", "n_docs")}))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="webdedup")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("package", help="zip the library for --py-files")
    pp.add_argument("--out", default="/tmp/webdedup.zip")
    pp.set_defaults(fn=cmd_package)

    ps = sub.add_parser("synth", help="generate a synthetic corpus")
    ps.add_argument("--n-docs", type=int, default=10000)
    ps.add_argument("--seed", type=int, default=42)
    ps.add_argument("--partitions", type=int, default=32)
    ps.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ps.add_argument("--out", required=True)
    ps.set_defaults(fn=cmd_synth)

    pr = sub.add_parser("run", help="run the dedup pipeline")
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--config", default=None, help="JSON dict of DedupConfig overrides")
    pr.add_argument(
        "--decision",
        choices=["rule", "ml"],
        default="rule",
        help="decision stage: triage rule (default) or the learned "
        "question-loop -> GBT path (requires --truth)",
    )
    pr.add_argument(
        "--truth",
        default=None,
        help="parquet of labeled match pairs (url_a, url_b) — the 'human "
        "labeler' for --decision ml (synth emits one at <out>/truth_pairs)",
    )
    pr.add_argument(
        "--n-questions",
        type=int,
        default=20,
        help="label budget per question round (Explorer ask-loop size)",
    )
    pr.add_argument(
        "--keeper",
        choices=["golden", "best"],
        default="golden",
        help="per-cluster output: synthesized golden record (default) or "
        "keep-best-copy — one surviving member per gid scored by "
        "unique-token ratio (writes <output>/keepers)",
    )
    pr.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    pr.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
