"""Test-set decontamination — flag corpus documents that overlap an
evaluation/benchmark set by shared n-grams.

Standard training-data hygiene (public method: GPT-3 appendix C / Brown et
al. 2020 remove training docs sharing 13-grams with eval sets; Llama/PaLM
pipelines run the same shape).  The reference has no corpus-vs-corpus
overlap op (suricate compares records pairwise within one frame); this is
one of the beyond-reference training-pipeline operators the engine adds.

Semantics: a doc's gram POSITION is contaminated when its n-token gram
(whitespace tokens, textstats.gram_array) appears anywhere in the benchmark
set.  Output is per-doc: total gram positions, contaminated positions,
fraction, and a boolean flag (``n_contaminated >= min_hits``).  Docs with
fewer than n tokens have 0 grams and are never flagged.

Plan shape (the 100 TB story):
  - both sides explode grams narrowly (no shuffle) and join on
    ``xxhash64(gram)`` — an 8-byte key instead of a ~100-byte string, the
    same payload diet as the did-encoded blocking keys in candidates.py.
    Collision bound: flagging a clean gram requires an exact 64-bit
    collision against the bench-gram set; at |bench grams| = 10^9 the
    per-gram probability is ~5e-11 (birthday math is irrelevant — we only
    meet bench grams, not each other), documented like
    exact_candidates' id bound.
  - eval sets are small (10^4-10^6 docs): ``broadcast_bench=True`` (default)
    broadcasts the distinct bench-gram hashes, so the corpus-sized exploded
    side never shuffles — the whole operator is scan + broadcast-probe +
    one doc-keyed partial agg.
  - corpus-vs-corpus decontamination (bench too big to broadcast):
    ``broadcast_bench=False`` pins a shuffle_hash join on the gram hash.
    Per-doc aggregation keys are doc ids, so corpus-wide hot grams cannot
    skew a reducer (same posture as textstats.repetition_stats); hot grams
    DO skew the gram-hash join itself, so ``max_gram_docs`` caps bench-side
    gram fan-in and the dropped mass is RETURNED as a metrics DataFrame
    (the repo's caps convention — never silently truncated).  A gram
    dropped for hotness is boilerplate shared by >= max_gram_docs bench
    docs, the least informative contamination signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.textstats import gram_array, ws_tokens


def _gram_hashes(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id_col, gh) — one row per gram position, gh = xxhash64(gram)."""
    # token array staged before the gram HOF (gram_array's bound-attribute
    # contract — an inline ws_tokens re-tokenizes per gram position)
    return (
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode(gram_array(F.col("__toks"), n)).alias("_g"))
        .select(id_col, F.xxhash64("_g").alias("gh"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
    max_gram_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Per-doc benchmark-overlap stats over ``docs`` vs ``bench``.

    Returns (stats, metrics):
      stats — (id_col, n_grams, n_contaminated, contaminated_frac,
        contaminated) for EVERY doc (zero-gram docs included), where
        n_contaminated counts gram positions whose gram occurs in bench and
        contaminated = n_contaminated >= min_hits.
      metrics — 1-row (bench_grams, dropped_hot_grams): distinct bench
        grams used vs dropped by the ``max_gram_docs`` hotness cap
        (0 when the cap is off).
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")

    bench_grams = _gram_hashes(bench, n, bench_id_col, bench_text_col)
    if max_gram_docs is not None:
        per_gram = bench_grams.groupBy("gh").agg(
            F.count_distinct(bench_id_col).alias("_nd")
        )
        bench_set = per_gram.where(F.col("_nd") < max_gram_docs).select("gh")
        dropped = per_gram.where(F.col("_nd") >= max_gram_docs).select("gh")
    else:
        bench_set = bench_grams.select("gh").distinct()
        dropped = bench_set.limit(0)

    doc_grams = _gram_hashes(docs, n, id_col, text_col)
    if broadcast_bench:
        hits = doc_grams.join(F.broadcast(bench_set), "gh")
    else:
        # bench_set is agg/distinct-derived (planner estimates unusable —
        # see candidates._pairs_from_keys): pin shuffle_hash rather than
        # risking a mis-broadcast of a corpus-sized gram set
        hits = doc_grams.join(bench_set.hint("shuffle_hash"), "gh")
    per_doc = hits.groupBy(id_col).agg(F.count("*").alias("n_contaminated"))

    # n_grams is closed-form (gram_array yields max(len(toks)-n+1, 0)
    # grams): a map-only column on docs, NOT a second corpus-wide gram
    # explode + doc-keyed agg — that branch would double the operator's
    # scan-side work and add a shuffle for a count we can compute per row.
    # per_doc is a corpus-sized agg output (one row per contaminated doc):
    # pin shuffle_hash so a low static estimate can never broadcast it.
    base = docs.select(
        id_col,
        F.greatest(
            F.size(ws_tokens(F.col(text_col))) - F.lit(n - 1), F.lit(0)
        ).alias("n_grams"),
    )
    stats = base.join(per_doc.hint("shuffle_hash"), id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.round(
            F.coalesce("n_contaminated", F.lit(0))
            / F.greatest(F.col("n_grams"), F.lit(1)),
            6,
        ).alias("contaminated_frac"),
        (F.coalesce("n_contaminated", F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )
    metrics = bench_set.agg(F.count("*").alias("bench_grams")).crossJoin(
        dropped.agg(F.count("*").alias("dropped_hot_grams"))
    )
    return stats, metrics
