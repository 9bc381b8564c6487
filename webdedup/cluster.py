"""Duplicate-group assignment: connected components + golden records.

Replaces the reference's incremental mode-vote dedupe loop
(`SingleGrouping.launchdedupe`, suricate/grouping.py:47-221) — whose batch
while-loop realizes transitivity one batch at a time — with connected
components over the match-edge set, computed DataFrame-natively via the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014).  GraphFrames is not
available offline; the alternating algorithm is pure joins/groupBys, runs in
O(log^2 n) rounds, and each round is one shuffle — the right shape for a
1000-executor cluster.

Group id (gid) = min url in the component (deterministic, permutation
invariant).  Golden-record aggregation maps suricate/grouping.py:224-322
(policies popularity/first/last/concat) onto native aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(a, b) undirected -> directed both ways, self-loops dropped.

    NO distinct here: duplicate directed edges do not change min-neighbor
    aggregates or star outputs, and each star op ends in its own dedup —
    a distinct per symmetrize would be a pure extra shuffle per round."""
    fwd = edges.select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
    rev = edges.select(F.col("url_b").alias("u"), F.col("url_a").alias("v"))
    return fwd.unionByName(rev).where(F.col("u") != F.col("v"))


def _min_neighbor(e: DataFrame) -> DataFrame:
    """m(u) = min(neighbors(u) + {u})."""
    return e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: emit (v, m(u)) for every strictly larger neighbor v.

    The groupBy and the join both hash-partition on u, so the exchange under
    the aggregate is reused for the join side (one shuffle, not two); dedup
    is deferred to the end of the round (_small_star)."""
    m = _min_neighbor(e)
    return (
        e.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("url_a"), F.col("m").alias("url_b"))
        .where(F.col("url_a") != F.col("url_b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each u: emit (v, m(u)) for every v <= u, plus (u, m(u))."""
    m = _min_neighbor(e)
    nbr = (
        e.where(F.col("v") <= F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("url_a"), F.col("m").alias("url_b"))
    )
    own = m.select(F.col("u").alias("url_a"), F.col("m").alias("url_b"))
    return (
        nbr.unionByName(own)
        .where(F.col("url_a") != F.col("url_b"))
        .distinct()
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: overflow-proof under ANSI mode at any row count
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("url_a", "url_b").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges(url_a, url_b) -> (url, gid) for every node appearing in edges.

    Alternating large-star/small-star until the edge set reaches a fixpoint
    (checksum-stable).  Each round localCheckpoints to cut lineage — without
    it the plan doubles per iteration and Catalyst analysis time explodes.
    """
    if edges.isEmpty():
        return edges.sparkSession.createDataFrame([], "url string, gid string")

    cur = edges.select("url_a", "url_b").where(F.col("url_a") != F.col("url_b")).distinct()
    cur = cur.localCheckpoint()
    prev_sig = None
    for _ in range(max_iterations):
        cur = _large_star(_symmetrize(cur))
        cur = _small_star(_symmetrize(cur)).localCheckpoint()
        sig = _edge_checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")

    # fixpoint is a star forest: every edge points child -> root
    sym = _symmetrize(cur)
    membership = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("gid"))
    roots = membership.select(F.col("gid").alias("u"), F.col("gid"))
    return (
        membership.unionByName(roots)
        .groupBy("u")
        .agg(F.min("gid").alias("gid"))
        .select(F.col("u").alias("url"), "gid")
    )


def assign_clusters(pages: DataFrame, components: DataFrame) -> DataFrame:
    """Every page gets a gid; non-matched pages are their own singleton group
    (mirrors grouping.py:198-201 'new gid = own ix if no match')."""
    return pages.join(components, "url", "left").withColumn(
        "gid", F.coalesce(F.col("gid"), F.col("url"))
    )


def golden_records(
    clustered: DataFrame,
    policies: dict[str, str] | None = None,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-gid golden record with per-column policy (grouping.py:224-322):
    popularity (mode), first/last (by warc_ts), concat (distinct, ordered).
    """
    policies = policies or {"url": "first", "text": "popularity", "lang": "popularity"}
    aggs = [F.count("*").alias("n_members")]
    for col_name, policy in policies.items():
        if policy == "popularity":
            aggs.append(F.mode(col_name).alias(f"{col_name}_golden"))
        elif policy == "first":
            aggs.append(F.min_by(col_name, ts_col).alias(f"{col_name}_golden"))
        elif policy == "last":
            aggs.append(F.max_by(col_name, ts_col).alias(f"{col_name}_golden"))
        elif policy == "concat":
            aggs.append(
                F.array_join(
                    F.array_distinct(F.sort_array(F.collect_list(col_name))), " "
                ).alias(f"{col_name}_golden")
            )
        else:
            raise ValueError(f"unknown golden-record policy {policy!r} for {col_name}")
    return clustered.groupBy("gid").agg(*aggs)
