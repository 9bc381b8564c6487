"""Active-learning question sampling — maps suricate/explore/* (SURVEY §2.7).

The reference samples pair-ids per score-cluster for a human to label:
  - SimpleQuestions (explore/simplequestions.py:5-50): <= n per cluster,
    every cluster
  - HardQuestions (explore/hardquestions.py:46-116): only *mixed* clusters
    (clusters whose labeled pairs disagree)

Sampling here is deterministic (hash-ordered, seeded) instead of RNG-ordered
so runs are reproducible under any parallelism — the synthetic ground truth
plays the role of the human labeler (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_per_cluster(
    pairs: DataFrame,
    n_questions: int,
    cluster_col: str = "cluster",
    seed: int = 42,
) -> DataFrame:
    """<= n_questions pairs per cluster, hash-ordered (QuestionsMixin._transform,
    explore/base.py:22-43)."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.xxhash64("url_a", "url_b", F.lit(seed)), F.col("url_a"), F.col("url_b")
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_questions)
        .drop("__rn")
    )


def simple_questions(
    clustered_pairs: DataFrame, n_questions: int, seed: int = 42
) -> DataFrame:
    """Sample every cluster (SimpleQuestions.transform)."""
    return sample_per_cluster(clustered_pairs, n_questions, seed=seed)


def hard_questions(
    clustered_pairs: DataFrame,
    labels: DataFrame,
    n_questions: int,
    seed: int = 42,
) -> DataFrame:
    """Sample only *mixed* clusters — clusters whose labeled pairs contain
    both matches and non-matches (HardQuestions.fit/transform via the
    cluster_matches crosstab).

    Pairs already in ``labels`` are EXCLUDED before sampling: both rounds
    rank by the same deterministic per-cluster hash, so without the
    anti-join the hard round's top-n per mixed cluster would be exactly
    the simple round's picks and the union would add zero new labels —
    the hard round exists to spend budget on fresh mixed-cluster pairs
    (the reference's random sampler gets fresh draws by chance;
    determinism here has to subtract instead)."""
    from webdedup.triage import classify_clusters, cluster_matches

    classes = classify_clusters(cluster_matches(clustered_pairs, labels))
    mixed = classes.where(F.col("cluster_class") == 1).select("cluster")
    candidates = clustered_pairs.join(F.broadcast(mixed), "cluster", "left_semi")
    fresh = candidates.join(
        F.broadcast(labels.select("url_a", "url_b")),
        ["url_a", "url_b"],
        "left_anti",
    )
    return sample_per_cluster(fresh, n_questions, seed=seed)


def label_budget_union(simple: DataFrame, hard: DataFrame) -> DataFrame:
    """The reference's question-set union (dedupe_pruning_pipeline.py:78)."""
    cols = ["url_a", "url_b"]
    return simple.select(*cols).unionByName(hard.select(*cols)).distinct()
