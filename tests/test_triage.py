"""Triage tests: rule decisions, kbins binning vs a pandas oracle, and the
Explorer-style learned triage (suricate/explore/* semantics)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from webdedup.config import DedupConfig
from webdedup.triage import (
    classify_clusters,
    cluster_matches,
    kbins_cluster,
    triage_learned,
    triage_rule,
)


def _feat_df(spark, rows):
    cols = ["url_a", "url_b", "methods", "shingle_jaccard"]
    pdf = pd.DataFrame(rows, columns=cols)
    return spark.createDataFrame(pdf)


def test_triage_rule_mapping(spark):
    cfg = DedupConfig()  # sure>=0.85, nomatch<0.2, jaccard>=0.5
    df = _feat_df(
        spark,
        [
            ("a", "b", ["exact"], 1.0),        # exact -> sure -> dup
            ("a", "c", ["minhash"], 0.9),      # >= sure threshold -> dup
            ("a", "d", ["minhash"], 0.6),      # mixed, >= 0.5 -> dup
            ("a", "e", ["minhash"], 0.3),      # mixed, < 0.5 -> no
            ("a", "f", ["minhash"], 0.1),      # below nomatch -> no
            ("a", "g", ["substring"], 0.05),   # substring-verified -> dup
        ],
    )
    got = {
        (r["url_a"], r["url_b"]): (r["triage"], r["is_dup"])
        for r in triage_rule(df, cfg).collect()
    }
    assert got[("a", "b")] == (2, 1)
    assert got[("a", "c")] == (2, 1)
    assert got[("a", "d")] == (1, 1)
    assert got[("a", "e")] == (1, 0)
    assert got[("a", "f")] == (0, 0)
    assert got[("a", "g")] == (1, 1)


def test_kbins_matches_pandas_oracle(spark):
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 8, size=200)
    pdf = pd.DataFrame({"url_a": [f"a{i}" for i in range(200)], "url_b": "b", "f": vals})
    df = spark.createDataFrame(pdf)
    n_bins = 10
    got = {r["url_a"]: r["cluster"] for r in kbins_cluster(df, n_bins, cols=["f"]).collect()}
    # oracle: KBinsDiscretizer(strategy='uniform', encode='ordinal') semantics
    lo, hi = vals.min(), vals.max()
    width = (hi - lo) / n_bins
    want = np.clip(np.floor((vals - lo) / width), 0, n_bins - 1).astype(int)
    for i in range(200):
        assert got[f"a{i}"] == want[i]


def test_kbins_empty_input(spark):
    """Zero feature rows -> empty clustered frame, not float(None)."""
    df = spark.createDataFrame([], "url_a string, url_b string, f double")
    out = kbins_cluster(df, 5, cols=["f"])
    assert out.count() == 0
    assert "cluster" in out.columns


def test_cluster_matches_and_classify(spark):
    clustered = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["a", "b", "c", "d", "e", "f"],
                "url_b": ["x"] * 6,
                "cluster": [0, 0, 1, 1, 2, 2],
            }
        )
    )
    labels = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["a", "b", "c", "d", "e", "f"],
                "url_b": ["x"] * 6,
                "y_true": [0, 0, 0, 1, 1, 1],
            }
        )
    )
    classes = {
        r["cluster"]: r["cluster_class"]
        for r in classify_clusters(cluster_matches(clustered, labels)).collect()
    }
    assert classes == {0: 0, 1: 1, 2: 2}  # nomatch / mixed / allmatch


def test_triage_learned_unknown_cluster_is_nomatch(spark):
    cfg = DedupConfig(triage_bins=4)
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["a", "b", "c", "d"],
                "url_b": ["x"] * 4,
                "f": [0.0, 0.1, 3.0, 3.1],
            }
        )
    )
    # labels only cover the high-score cluster -> low cluster is unknown -> 0
    labels = spark.createDataFrame(
        pd.DataFrame({"url_a": ["c", "d"], "url_b": ["x", "x"], "y_true": [1, 1]})
    )
    got = {
        r["url_a"]: r["triage"]
        for r in triage_learned(feats, labels, cfg, cols=["f"]).collect()
    }
    assert got["a"] == 0 and got["b"] == 0  # unknown clusters -> nomatch
    assert got["c"] == 2 and got["d"] == 2  # allmatch cluster
