"""Plan audit: dump .explain('formatted') for the headline queries and grep
the things that matter at 100 TB — PushedFilters into parquet scans, column
pruning (ReadSchema), broadcast vs sort-merge joins, WholeStageCodegen spans,
AQE nodes.  Run after any operator change; keep the plans honest."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from webdedup.session import get_spark  # noqa: E402

AUDIT = [
    "pricing_summary",
    "nation_revenue",
    "top_orders_per_customer",
    "dedup_exact_groups",
    "ann_cosine_topk",
    "quality_scores",
    "repetition_stats",
    "chunk_dedup",
    "decontaminate",
    "incremental_dedup",
    "pii_scrub",
    "gopher_filter",
    "events_windowed",
    "user_sessions",
    "semantic_dedup",
    "substring_overlaps",
    "ann_rp_lsh",
    "ann_ivf",
    "mix_corpus",
    "golden_record_users",
    "media_features",
    "lang_id",
    "doc_fingerprint",
    "rolling_fingerprint",
    "token_counts",
    "simhash_signatures",
    "id_normalize",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="explain-audit", cores=8)
    qs = entrymod.queries()
    for name in AUDIT:
        plan = plan_of(qs[name](spark, sf_dir))
        print(f"\n{'='*70}\n{name}\n{'='*70}")
        interesting = [
            ln
            for ln in plan.splitlines()
            if any(
                k in ln
                for k in (
                    "Scan parquet",
                    "PushedFilters",
                    "ReadSchema",
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "CartesianProduct",
                    "BroadcastNestedLoop",
                    "AdaptiveSparkPlan",
                    "Exchange",
                )
            )
        ]
        print("\n".join(interesting) or plan)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
