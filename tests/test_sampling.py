"""Deterministic sampling + source mixing (webdedup.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webdedup.sampling import hash_uniform, mix_sources, sample_by_hash


@pytest.mark.parametrize("portable", [False, True])
def test_sample_stable_under_partitioning_and_nested(spark, portable):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = set(r["k"] for r in sample_by_hash(df.repartition(2), "k", 0.3, portable).collect())
    b = set(r["k"] for r in sample_by_hash(df.repartition(13), "k", 0.3, portable).collect())
    assert a == b  # pure function of the row: partitioning can't move it
    # threshold monotonicity: a lower-rate sample is a SUBSET of a higher-
    # rate one (stable nested subsets — curriculum/ablation property)
    small = set(r["k"] for r in sample_by_hash(df, "k", 0.1, portable).collect())
    assert small <= a
    # rate accuracy at n=5000 (binomial 3-sigma ~ 0.02)
    assert abs(len(a) / 5000 - 0.3) < 0.05


def test_sample_rate_bounds():
    with pytest.raises(ValueError):
        sample_by_hash(None, "k", 1.5)
    with pytest.raises(ValueError):
        sample_by_hash(None, "k", -0.1)


def test_mix_sources_proportions_and_binding_source(spark):
    # three sources, equal token mass, weights 1:2:5 -> the weight-5 source
    # binds (kept 100%), others downsample to ~1/5 and ~2/5 of it
    rows = [
        (f"{s}-{i}", s, "tok " * 100)
        for s in ("a", "b", "c")
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    w = (
        F.when(F.col("source") == "a", 1.0)
        .when(F.col("source") == "b", 2.0)
        .otherwise(5.0)
    )
    sampled, rates = mix_sources(
        docs, weight=w, token_count=F.lit(100), key_col="doc_id")
    r = {x["source"]: x for x in rates.collect()}
    assert r["c"]["rate"] == pytest.approx(1.0)  # binding source keeps all
    assert r["a"]["rate"] == pytest.approx(0.2)
    assert r["b"]["rate"] == pytest.approx(0.4)
    got = sampled.groupBy("source").count().collect()
    counts = {x["source"]: x["count"] for x in got}
    assert counts["c"] == 400
    assert abs(counts["a"] - 80) < 40 and abs(counts["b"] - 160) < 50
    # output token mass tracks the weights (each doc = 100 tokens)
    assert counts["b"] / counts["c"] == pytest.approx(0.4, abs=0.12)


def test_mix_sources_uneven_tokens(spark):
    # source sizes differ 10x; equal weights -> rates equalize token mass:
    # the small source binds at rate 1.0, the big one keeps ~10%
    rows = [("s-%d" % i, "small", "t") for i in range(50)] + [
        ("b-%d" % i, "big", "t") for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    _, rates = mix_sources(
        docs, weight=F.lit(1.0), token_count=F.lit(1), key_col="doc_id")
    r = {x["source"]: x["rate"] for x in rates.collect()}
    assert r["small"] == pytest.approx(1.0)
    assert r["big"] == pytest.approx(0.1)


def test_portable_uniform_matches_duckdb(spark):
    """The portable hash arithmetic must replay bit-for-bit in DuckDB —
    the contract the mix_corpus oracle depends on."""
    import duckdb

    df = spark.range(0, 200).select(
        F.col("id"), hash_uniform(F.col("id"), portable=True).alias("u"))
    got = {r["id"]: r["u"] for r in df.collect()}
    want = {
        row[0]: row[1]
        for row in duckdb.sql(
            "SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::UBIGINT"
            " % 1000000 FROM range(0, 200) t(i)"
        ).fetchall()
    }
    assert got == want
