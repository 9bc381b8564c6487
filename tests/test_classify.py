"""ML decision-path tests: GBT classifier, label join, PruningPipe assembly."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webdedup.classify import (
    assemble_decisions,
    fit_classifier,
    label_candidates,
    predict_pairs,
)


def test_label_candidates_join(spark):
    feats = spark.createDataFrame(
        pd.DataFrame({"url_a": ["a", "a"], "url_b": ["b", "c"], "f": [0.9, 0.1]})
    )
    truth = spark.createDataFrame(pd.DataFrame({"url_a": ["b"], "url_b": ["a"]}))  # reversed
    got = {(r["url_a"], r["url_b"]): r["y_true"] for r in label_candidates(feats, truth).collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 0}  # canonicalized match


def test_fit_requires_both_classes(spark):
    feats = spark.createDataFrame(
        pd.DataFrame({"url_a": ["a"], "url_b": ["b"], "f1": [0.5], "y_true": [1]})
    )
    with pytest.raises(ValueError, match="single class"):
        fit_classifier(feats, feature_cols=["f1"])


def test_gbt_learns_separable_rule(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    n = 400
    f1 = rng.uniform(0, 1, n)
    y = (f1 > 0.5).astype(int)
    pdf = pd.DataFrame(
        {
            "url_a": [f"a{i}" for i in range(n)],
            "url_b": ["x"] * n,
            "f1": f1,
            "f2": rng.uniform(0, 1, n),  # noise feature
            "y_true": y,
        }
    )
    df = spark.createDataFrame(pdf)
    model = fit_classifier(df, feature_cols=["f1", "f2"], max_iter=10)
    pred = predict_pairs(model, df, feature_cols=["f1", "f2"])
    acc = pred.where(F.col("y_pred") == F.col("y_true")).count() / n
    assert acc >= 0.97
    # proba column well-formed
    row = pred.select(F.min("y_proba").alias("lo"), F.max("y_proba").alias("hi")).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_assemble_decisions(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["a", "b", "c", "d"],
                "url_b": ["x"] * 4,
                "triage": [0, 2, 1, 1],
                "y_pred": [1, 0, 1, 0],  # ignored unless mixed
            }
        )
    )
    got = {r["url_a"]: r["is_dup"] for r in assemble_decisions(df).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 0}
