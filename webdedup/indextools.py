"""Index / side-by-side utilities — Spark-native equivalents of
suricate/preutils/indextools.py and the ES row-dump helper
(suricate/dbconnectors/esconnector.py:298-319).

Pure column/metadata transforms: every function is a projection (no
shuffle) except separate_sides' dropDuplicates, which is the reference's
own per-side dedup semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_suffix(df: DataFrame, suffix: str, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Suffix every column with _<suffix> (addsuffix, indextools.py:45-72)."""
    return df.select(
        *[
            F.col(c) if c in exclude else F.col(c).alias(f"{c}_{suffix}")
            for c in df.columns
        ]
    )


def rmv_suffix(df: DataFrame, suffix: str) -> DataFrame:
    """Strip the _<suffix> tail from every column carrying it
    (rmvsuffix, indextools.py:75-100)."""
    tail = f"_{suffix}"
    return df.select(
        *[
            F.col(c).alias(c[: -len(tail)]) if c.endswith(tail) else F.col(c)
            for c in df.columns
        ]
    )


def chkixdf(df: DataFrame, ixname: str = "ix") -> DataFrame:
    """Schema/key assertion (chkixdf, indextools.py:21-42): the id column
    must exist, be non-null and unique.  Raises KeyError/ValueError like the
    reference; returns df unchanged.  The uniqueness probe is one count
    aggregate — call it at pipeline boundaries, not per batch."""
    if ixname not in df.columns:
        raise KeyError(f"{ixname} not in df columns")
    row = df.agg(
        F.count("*").alias("n"),
        F.count(ixname).alias("n_notnull"),
        F.countDistinct(ixname).alias("n_distinct"),
    ).collect()[0]
    if row["n_notnull"] != row["n"]:
        raise ValueError(f"{ixname} contains nulls")
    if row["n_distinct"] != row["n"]:
        raise ValueError(f"{ixname} is not unique")
    return df


def separate_sides(
    sbs: DataFrame,
    ixname: str = "ix",
    source_suffix: str = "source",
    target_suffix: str = "target",
    y_true_col: str = "y_true",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Side-by-side table -> (source table, target table, labeled pairs)
    (separatesides, indextools.py:121-156): per side, keep the suffixed
    columns, strip the suffix, drop duplicate ids."""

    def takeside(suffix: str) -> DataFrame:
        tail = f"_{suffix}"
        side = sbs.select(*[c for c in sbs.columns if c.endswith(tail)])
        return rmv_suffix(side, suffix).dropDuplicates([ixname])

    pairs = sbs.select(f"{ixname}_{source_suffix}", f"{ixname}_{target_suffix}", y_true_col)
    return takeside(source_suffix), takeside(target_suffix), pairs


def multiindex21column(
    df: DataFrame,
    ix_source: str = "ix_source",
    ix_target: str = "ix_target",
    out: str = "ix",
    sep: str = "-",
) -> DataFrame:
    """Pair-id columns -> one joined string key (multiindex21column,
    indextools.py:159+)."""
    return df.withColumn(
        out, F.concat_ws(sep, F.col(ix_source).cast("string"), F.col(ix_target).cast("string"))
    )


def df_to_dump(df: DataFrame, ixname: str = "ix") -> DataFrame:
    """Each row as a JSON document: (ix, body) — the ES bulk-index dump
    (df_to_dump, esconnector.py:298-319).  Null fields are dropped from the
    body exactly like the reference's .dropna(); to_json is JVM-side."""
    body = F.to_json(
        F.struct(*[F.col(c) for c in df.columns]),
        {"ignoreNullFields": "true"},
    )
    return df.select(F.col(ixname).alias(ixname), body.alias("body"))
