"""Triage: pair features -> {0 no-match, 1 mixed, 2 sure} -> final decision.

Maps the reference's Explorer stack (suricate/explore/*):
  - KBinsCluster (kbinscluster.py:6-64): sum features -> uniform-width bins
  - ClusterClassifier (clusterclassifier.py:8-126): bin -> {0,1,2} learned
    from labels; unknown bins -> 0
  - PruningPipe assembly (pruningpipe.py:95-135): neg->0, sure->1,
    mixed->classifier prediction

plus the rule-based `FunctionClassifier` (suricate/preutils/
functionclassifier.py:4-38) which here is the default decision path:
a boolean Catalyst expression over the feature columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.config import DedupConfig
from webdedup.features import FEATURE_COLS, triage_predicates


def triage_rule(features: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Default decision: provenance- and score-based rule (FunctionClassifier
    style — one `when` expression, fully JVM-side).

      sure (2): exact-hash pair, or shingle Jaccard >= sure_threshold
      no  (0): shingle Jaccard < nomatch_threshold and not substring-verified
      mixed(1): everything between -> decided by jaccard_threshold
    """
    sure, nomatch = triage_predicates(
        F.col("shingle_jaccard"), cfg, F.col("methods")
    )
    triage = F.when(sure, 2).when(nomatch, 0).otherwise(1)
    df = features.withColumn("triage", triage)
    is_dup = (
        F.when(F.col("triage") == 2, 1)
        .when(F.col("triage") == 0, 0)
        .otherwise(
            (
                (F.col("shingle_jaccard") >= cfg.jaccard_threshold)
                | F.array_contains(F.col("methods"), "substring")
            ).cast("int")
        )
    )
    return df.withColumn("is_dup", is_dup)


def score_sum(features: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Row-wise feature sum (KBinsCluster._sumscore, kbinscluster.py:30-39)."""
    cols = cols or FEATURE_COLS
    expr = None
    for c in cols:
        expr = F.col(c) if expr is None else expr + F.col(c)
    return features.withColumn("score_sum", expr)


def kbins_cluster(
    features: DataFrame, n_bins: int, cols: list[str] | None = None
) -> DataFrame:
    """Uniform-width binning of the feature sum into n_bins cluster ids —
    KBinsDiscretizer(strategy='uniform', encode='ordinal') semantics
    (kbinscluster.py:42-64).  One agg for min/max, then pure arithmetic
    (no Bucketizer object needed; a closed-form is friendlier to codegen).
    """
    df = score_sum(features, cols)
    row = df.agg(
        F.min("score_sum").alias("lo"), F.max("score_sum").alias("hi")
    ).collect()[0]
    if row["lo"] is None or row["hi"] is None:
        # empty features (a partition with no candidate pairs): empty
        # clustered frame, not a TypeError on float(None)
        return df.withColumn("cluster", F.lit(0))
    lo, hi = float(row["lo"]), float(row["hi"])
    if hi <= lo:
        return df.withColumn("cluster", F.lit(0))
    width = (hi - lo) / n_bins
    bucket = F.floor((F.col("score_sum") - F.lit(lo)) / F.lit(width)).cast("int")
    return df.withColumn(
        "cluster", F.least(F.greatest(bucket, F.lit(0)), F.lit(n_bins - 1))
    )


def cluster_matches(clustered: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-cluster label crosstab (explore/base.py:81-96): counts of y_true
    0/1 on the label-intersected pairs, plus match share."""
    joined = clustered.join(labels, ["url_a", "url_b"], "inner")
    return (
        joined.groupBy("cluster")
        .agg(
            F.count("*").alias("n_labeled"),
            F.sum(F.col("y_true")).alias("n_match"),
        )
        .withColumn("pct_match", F.col("n_match") / F.col("n_labeled"))
    )


def cluster_stats(
    clustered: DataFrame, labels: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Per-cluster stats (explore/base.py:59-78): mean of the row-mean
    feature score over ALL pairs in the cluster, plus the labeled match
    share (pct_match) over the label-intersected pairs only; sorted by
    pct_match desc like the reference pivot.  One groupBy each — the
    avg_score agg never touches the (smaller) label table."""
    cols = cols or FEATURE_COLS
    expr = None
    for c in cols:
        expr = F.col(c) if expr is None else expr + F.col(c)
    per = clustered.withColumn("avg_score", expr / F.lit(float(len(cols))))
    base = per.groupBy("cluster").agg(F.avg("avg_score").alias("avg_score"))
    pct = cluster_matches(clustered, labels).select("cluster", "pct_match")
    return base.join(pct, "cluster", "left").orderBy(
        F.col("pct_match").desc_nulls_last(), "cluster"
    )


def classify_clusters(
    cluster_stats: DataFrame,
) -> DataFrame:
    """cluster -> {0 nomatch, 1 mixed, 2 allmatch} (clusterclassifier.py:50-120):
    all labeled pairs 0 -> nomatch; all 1 -> allmatch; else mixed."""
    return cluster_stats.select(
        "cluster",
        F.when(F.col("pct_match") == 0.0, 0)
        .when(F.col("pct_match") == 1.0, 2)
        .otherwise(1)
        .alias("cluster_class"),
    )


def triage_learned(
    features: DataFrame,
    labels: DataFrame,
    cfg: DedupConfig,
    cols: list[str] | None = None,
) -> DataFrame:
    """Explorer-style learned triage: kbins on feature sum, cluster classes
    from labels, broadcast-joined back; unknown clusters -> 0 (the
    reference's printed-warning path, clusterclassifier.py:117-126)."""
    clustered = kbins_cluster(features, cfg.triage_bins, cols=cols)
    stats = cluster_matches(clustered, labels)
    classes = classify_clusters(stats)
    return clustered.join(F.broadcast(classes), "cluster", "left").withColumn(
        "triage", F.coalesce(F.col("cluster_class"), F.lit(0))
    )
