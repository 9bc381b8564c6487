"""Spark ML classification stage — the learned decision path.

Maps the reference's sklearn surface (SURVEY §2.8/2.9):
  - Pipeline[SimpleImputer(0), Normalizer, PCA(4), GradientBoosting]
    (tests/pipeindexer/test_pruningpipe.py:49-59, tutorial/main/stepbystep/
    41-Predict.py:36-41)  ->  ml.Pipeline[VectorAssembler, PCA, GBTClassifier]
    (imputation already done in feature generation: navalue_score=0)
  - PartialClf (suricate/pipeline/partialclf.py:7-91): fit only on the
    label-intersected pairs, asserting both classes present
  - PruningPipe assembly (pruningpipe.py:128-135): neg->0, sure->1,
    mixed->classifier prediction
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.config import DedupConfig
from webdedup.features import FEATURE_COLS


def _assemble(features: DataFrame, cols: list[str]):
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=cols, outputCol="fvec").transform(features)


def label_candidates(features: DataFrame, truth_pairs: DataFrame) -> DataFrame:
    """Attach y_true to candidate pairs: 1 if the (canonical) pair is in the
    truth set, else 0.  Mirrors getytrue + index intersection
    (suricate/data/companies.py:33-48, metrics/metrics.py:14)."""
    truth = truth_pairs.select(
        F.least("url_a", "url_b").alias("url_a"),
        F.greatest("url_a", "url_b").alias("url_b"),
        F.lit(1).alias("y_true"),
    ).distinct()
    return features.join(truth, ["url_a", "url_b"], "left").fillna({"y_true": 0})


def fit_classifier(
    labeled: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "y_true",
    max_iter: int = 30,
    seed: int = 7,
):
    """Fit the GBT match classifier on labeled pairs (PartialClf semantics:
    caller passes only the labeled subset; both classes must be present)."""
    from pyspark.ml.classification import GBTClassifier

    cols = feature_cols or FEATURE_COLS
    n_classes = labeled.select(F.countDistinct(label_col).alias("n")).first()["n"]
    if n_classes < 2:
        raise ValueError(
            "training labels contain a single class "
            "(PartialClf assertion, suricate/pipeline/partialclf.py:60-66)"
        )
    train = _assemble(labeled, cols)
    gbt = GBTClassifier(
        featuresCol="fvec",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=5,
        seed=seed,
    )
    return gbt.fit(train)


def predict_pairs(model, features: DataFrame, feature_cols: list[str] | None = None) -> DataFrame:
    """Score pairs with the fitted model: adds y_pred (0/1) and y_proba."""
    from pyspark.ml.functions import vector_to_array

    cols = feature_cols or FEATURE_COLS
    scored = model.transform(_assemble(features, cols))
    return scored.withColumn(
        "y_proba", vector_to_array("probability").getItem(1)
    ).withColumn("y_pred", F.col("prediction").cast("int")).drop(
        "fvec", "rawPrediction", "probability", "prediction"
    )


def assemble_decisions(triaged_pred: DataFrame) -> DataFrame:
    """PruningPipe assembly (pruningpipe.py:128-135): triage 0 -> 0,
    triage 2 -> 1, triage 1 (mixed) -> classifier prediction."""
    return triaged_pred.withColumn(
        "is_dup",
        F.when(F.col("triage") == 0, 0)
        .when(F.col("triage") == 2, 1)
        .otherwise(F.col("y_pred")),
    )


def run_ml_decision(
    features: DataFrame,
    truth_pairs: DataFrame,
    cfg: DedupConfig,
    label_fraction: float = 0.5,
    seed: int = 11,
) -> DataFrame:
    """Full learned decision path: rule triage -> train GBT on a seeded
    sample of labeled mixed pairs -> predict the rest -> assemble.

    ``label_fraction`` plays the role of the reference's active-learning
    label budget (the Explorer ask_simple/ask_hard loop, SURVEY §3.3 — here
    labels come from planted truth, so the loop is a deterministic sample).
    """
    from webdedup.triage import triage_rule

    triaged = triage_rule(features, cfg)
    labeled = label_candidates(triaged, truth_pairs)
    mixed = labeled.where(F.col("triage") == 1)
    train = mixed.where(
        F.pmod(F.xxhash64("url_a", "url_b"), F.lit(1000)) < int(label_fraction * 1000)
    )
    model = fit_classifier(train)
    pred = predict_pairs(model, labeled)
    return assemble_decisions(pred)
