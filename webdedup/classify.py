"""Spark ML classification stage — the learned decision path.

Maps the reference's sklearn surface (SURVEY §2.8/2.9):
  - Pipeline[SimpleImputer(0), Normalizer, PCA(4), GradientBoosting]
    (tests/pipeindexer/test_pruningpipe.py:49-59, tutorial/main/stepbystep/
    41-Predict.py:36-41)  ->
    ml.Pipeline[VectorAssembler, Normalizer(p=2), PCA(k=4), GBTClassifier]
    (imputation already done in feature generation: navalue_score=0).
    Semantics note: sklearn's PCA mean-centers before projecting while
    Spark ML's PCA does not; for the downstream GBT (split-point trees,
    affine-invariant per feature) the decision function is unaffected —
    the retained structure, an L2-normalized 4-component projection, is
    the same.
  - GridSearchCV over the pipeline (tests/fullpipeline/
    test_connectors_classifiers.py:83-88) -> optional CrossValidator over
    GBT depth/iterations (cross_validate=True)
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
    pca_k: int = 4,
    cross_validate: bool = False,
    cv_folds: int = 3,
):
    """Fit the match classifier on labeled pairs (PartialClf semantics:
    caller passes only the labeled subset; both classes must be present).

    The model is the reference flagship's full preprocessing pipeline
    (test_pruningpipe.py:49-59): assemble -> L2 Normalizer -> PCA(k=4) ->
    GBT, as one ml.PipelineModel whose transform() runs every stage.
    pca_k=0 disables the Normalizer+PCA stages (raw-feature GBT).
    cross_validate=True wraps the pipeline in a CrossValidator over GBT
    depth {3,5} x maxIter {max_iter//2, max_iter} (the GridSearchCV
    equivalent, test_connectors_classifiers.py:83-88) and returns the
    best model; the labeled set must be large enough that every fold
    keeps both classes.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import PCA, Normalizer, VectorAssembler

    cols = feature_cols or FEATURE_COLS
    n_classes = labeled.select(F.countDistinct(label_col).alias("n")).first()["n"]
    if n_classes < 2:
        raise ValueError(
            "training labels contain a single class "
            "(PartialClf assertion, suricate/pipeline/partialclf.py:60-66)"
        )
    stages: list = [VectorAssembler(inputCols=cols, outputCol="fvec_raw")]
    last = "fvec_raw"
    if pca_k > 0:
        stages.append(Normalizer(inputCol=last, outputCol="fvec_norm", p=2.0))
        stages.append(
            PCA(k=min(pca_k, len(cols)), inputCol="fvec_norm", outputCol="fvec_pca")
        )
        last = "fvec_pca"
    gbt = GBTClassifier(
        featuresCol=last,
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=5,
        seed=seed,
    )
    stages.append(gbt)
    pipe = Pipeline(stages=stages)
    if not cross_validate:
        return pipe.fit(labeled)

    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxDepth, [3, 5])
        .addGrid(gbt.maxIter, sorted({max(1, max_iter // 2), max_iter}))
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol=label_col),
        numFolds=cv_folds,
        seed=seed,
        parallelism=4,
    )
    return cv.fit(labeled).bestModel


_MODEL_WORK_COLS = [
    "fvec_raw", "fvec_norm", "fvec_pca", "rawPrediction", "probability", "prediction",
]


def predict_pairs(model, features: DataFrame, feature_cols: list[str] | None = None) -> DataFrame:
    """Score pairs with the fitted PipelineModel: adds y_pred (0/1) and
    y_proba.  feature_cols is accepted for signature compatibility; the
    pipeline's own VectorAssembler fixes the columns at fit time."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return (
        scored.withColumn("y_proba", vector_to_array("probability").getItem(1))
        .withColumn("y_pred", F.col("prediction").cast("int"))
        .drop(*[c for c in _MODEL_WORK_COLS if c in scored.columns])
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


def questions_label_budget(
    pairs: DataFrame,
    truth_pairs: DataFrame,
    cfg: DedupConfig,
    n_questions: int = 20,
    seed: int = 42,
) -> DataFrame:
    """The reference's Explorer ask-loop as the label budget
    (suricate/explore/explorer.py:8-172, tutorial/main/
    dedupe_pruning_pipeline.py:52-88):

      1. kbins-cluster the pair scores (Explorer.fit)
      2. SimpleQuestions: sample every cluster -> the 'human' (here: the
         planted truth) labels them
      3. cluster classes from those labels (ClusterClassifier.fit)
      4. HardQuestions: sample only the *mixed* clusters
      5. label budget = union of both question rounds

    Returns distinct (url_a, url_b) — the pairs whose labels the trainer
    may use.  Everything is one Spark DAG; the only driver action is the
    kbins min/max 1-row agg.
    """
    from webdedup.questions import (
        hard_questions,
        label_budget_union,
        simple_questions,
    )
    from webdedup.triage import kbins_cluster

    clustered = kbins_cluster(pairs, cfg.triage_bins)
    simple = simple_questions(clustered, n_questions, seed=seed)
    simple_labeled = label_candidates(simple, truth_pairs).select(
        "url_a", "url_b", "y_true"
    )
    hard = hard_questions(clustered, simple_labeled, n_questions, seed=seed)
    return label_budget_union(simple, hard)


def run_ml_decision(
    features: DataFrame,
    truth_pairs: DataFrame,
    cfg: DedupConfig,
    n_questions: int = 20,
    seed: int = 42,
    cross_validate: bool = False,
) -> DataFrame:
    """Full learned decision path, matching the reference flagship
    (suricate/pipeline/pruningpipe.py:59-135 + explore/explorer.py:8-172):
    rule triage -> question-loop label budget -> train GBT on the budgeted
    labels only -> predict every pair -> PruningPipe assembly (neg->0,
    sure->1, mixed->prediction).

    Labels outside the question budget are NEVER seen by the trainer — the
    budget is the active-learning interface; the planted truth plays the
    human labeler (SURVEY §3.3)."""
    from webdedup.triage import triage_rule

    triaged = triage_rule(features, cfg)
    budget = questions_label_budget(triaged, truth_pairs, cfg, n_questions, seed)
    train = label_candidates(
        triaged.join(budget, ["url_a", "url_b"], "left_semi"), truth_pairs
    )
    model = fit_classifier(train, cross_validate=cross_validate)
    pred = predict_pairs(model, triaged)
    return assemble_decisions(pred)
