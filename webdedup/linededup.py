"""Corpus-level duplicated-unit removal — CCNet-style line/paragraph dedup.

CCNet (Wenzek et al., 2019) dedups Common Crawl by hashing each paragraph
and dropping duplicate occurrences corpus-wide; C4/Gopher run the same shape
at line granularity.  The reference dedups whole records only
(suricate/grouping.py) — it has no sub-document restructuring op; this is
one of the beyond-reference training-data operators the engine adds.

Units are either separator-split lines/paragraphs (``sep``) or fixed-width
non-overlapping token chunks (``chunk_width``) for corpora without line
structure.  A unit is "hot" when it appears in >= ``min_docs`` DISTINCT
documents; hot-unit occurrences are dropped, either all of them
(``keep='none'``) or all but the single globally-first occurrence
(``keep='one'``, the CCNet behavior — keeper = min (id, pos), deterministic
under any partitioning).

Plan shape (the 100 TB story):
  - split/explode is narrow (one pass over text, no shuffle);
  - hotness = distinct (unit, id) -> count per unit: both aggregations
    partial-combine map-side, so a boilerplate unit occurring in 10^8 docs
    costs each reducer at most one row per map partition — the same
    skew bound as candidates.bucket_stats;
  - keeper = min(struct(id, pos)) per unit: constant partial state;
  - rebuild groups by doc id (per-doc keys — corpus-wide hot units cannot
    skew it; a doc's units are bounded by its own length).
No driver-side collects; output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.textstats import ws_tokens


def split_units(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    chunk_width: int | None = None,
) -> DataFrame:
    """(id, pos, unit) — one row per unit, pos = 0-based position in doc.

    sep: literal/regex separator (lines: '\\n', paragraphs: '\\n\\n');
    empty/whitespace-only units are dropped (CCNet normalization), their
    positions preserved for order.  chunk_width: non-overlapping token
    chunks (the no-line-structure fallback; the tail chunk may be short).
    """
    if (sep is None) == (chunk_width is None):
        raise ValueError("pass exactly one of sep / chunk_width")
    if sep is not None:
        units = docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "unit"),
        )
        # rlike (?U)\S == python str.strip() truthiness: F.trim strips only
        # ASCII spaces, which would keep tab/CR/NBSP-only lines (e.g. the
        # '\r' residue of CRLF corpora split on '\n') as corpus-hot units.
        return units.where(F.col("unit").rlike(r"(?U)\S"))
    # stage the token array before the chunk HOF: an inline ws_tokens is
    # re-evaluated per chunk inside the lambda (gram_array's trap)
    toks = F.col("__toks")
    n = F.size(toks)
    w = int(chunk_width)
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(n / F.lit(w)).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * w + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.posexplode(chunks).alias("pos", "unit"))


def dedup_units(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    chunk_width: int | None = None,
    min_docs: int = 2,
    keep: str = "one",
    joiner: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Remove corpus-duplicated units and rebuild each document's text.

    Returns (cleaned, metrics):
      cleaned — (id_col, n_units, n_removed, cleaned_text); a doc whose
        every unit was removed keeps a row with cleaned_text = ''.
      metrics — 1-row (hot_units, removed_occurrences, total_units):
        the dropped mass, RETURNED as a metrics DataFrame per the repo's
        skew/caps convention (never silently truncated).

    joiner: string used to reassemble kept units (default: sep if it is a
    1-char literal, else a single space)."""
    if keep not in ("one", "none"):
        raise ValueError(f"keep must be 'one' or 'none', got {keep!r}")
    if joiner is None:
        joiner = sep if (sep is not None and len(sep) == 1) else " "

    units = split_units(docs, id_col, text_col, sep, chunk_width)

    # hotness: distinct docs per unit, two skew-safe partial-agg stages
    doc_counts = (
        units.select("unit", id_col)
        .distinct()
        .groupBy("unit")
        .agg(F.count("*").alias("n_docs"))
    )
    hot = doc_counts.where(F.col("n_docs") >= min_docs).select("unit")

    # hot/keeper tables are agg-derived (planner estimates unusable — see
    # candidates._pairs_from_keys) and corpus-sized in the worst case: pin
    # the shuffle-hash join instead of risking a mis-broadcast
    if keep == "one":
        # keeper per hot unit = globally-first occurrence; min(struct) has
        # constant partial state, so the agg is skew-safe on hot units
        keeper = (
            units.join(hot.hint("shuffle_hash"), "unit")
            .groupBy("unit")
            .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_keep"))
        )
        flagged = units.join(keeper.hint("shuffle_hash"), "unit", "left")
        is_keeper = (F.col(f"_keep.{id_col}") == F.col(id_col)) & (
            F.col("_keep.pos") == F.col("pos")
        )
        kept = flagged.where(F.col("_keep").isNull() | is_keeper)
    else:
        kept = units.join(hot.hint("shuffle_hash"), "unit", "left_anti")

    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
        ).alias("cleaned_text"),
    )
    totals = units.groupBy(id_col).agg(F.count("*").alias("n_units"))
    # totals/rebuilt are corpus-sized agg outputs (one row per doc): pin
    # shuffle_hash so they can never be chosen as a broadcast build off a
    # low static estimate; both joins reuse the aggs' doc-keyed exchanges
    cleaned = (
        docs.select(id_col)
        .join(totals.hint("shuffle_hash"), id_col, "left")
        .join(rebuilt.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_units", F.lit(0)).alias("n_units"),
            (
                F.coalesce("n_units", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
    metrics = units.join(hot.hint("shuffle_hash"), "unit").agg(
        F.count_distinct("unit").alias("hot_units"),
        (F.count("*") - (F.lit(0) if keep == "none" else F.count_distinct("unit"))).alias(
            "removed_occurrences"
        ),
    ).crossJoin(units.agg(F.count("*").alias("total_units")))
    return cleaned, metrics
