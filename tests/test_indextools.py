"""Index/SBS utilities (indextools.py) vs the reference's pandas semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webdedup.indextools import (
    add_suffix,
    chkixdf,
    df_to_dump,
    multiindex21column,
    rmv_suffix,
    separate_sides,
)


def test_suffix_roundtrip(spark):
    df = spark.createDataFrame(pd.DataFrame({"ix": [1], "name": ["a"]}))
    sfx = add_suffix(df, "source")
    assert sfx.columns == ["ix_source", "name_source"]
    assert rmv_suffix(sfx, "source").columns == ["ix", "name"]


def test_chkixdf(spark):
    ok = spark.createDataFrame(pd.DataFrame({"ix": [1, 2], "v": ["a", "b"]}))
    assert chkixdf(ok) is ok
    with pytest.raises(KeyError):
        chkixdf(ok.drop("ix"))
    dup = spark.createDataFrame(pd.DataFrame({"ix": [1, 1], "v": ["a", "b"]}))
    with pytest.raises(ValueError, match="unique"):
        chkixdf(dup)


def test_separate_sides(spark):
    sbs = spark.createDataFrame(
        pd.DataFrame(
            {
                "ix_source": [1, 1],
                "name_source": ["a", "a"],
                "ix_target": [10, 11],
                "name_target": ["x", "y"],
                "y_true": [1, 0],
            }
        )
    )
    src, tgt, pairs = separate_sides(sbs)
    assert sorted(src.columns) == ["ix", "name"] and src.count() == 1
    assert tgt.count() == 2
    assert pairs.columns == ["ix_source", "ix_target", "y_true"]


def test_multiindex21column_and_dump(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ix_source": [1], "ix_target": [2], "v": [None]})
    )
    got = multiindex21column(df).select("ix").first()[0]
    assert got == "1-2"
    dumped = df_to_dump(df.withColumnRenamed("ix_source", "ix")).first()
    assert dumped["ix"] == 1
    assert '"v"' not in dumped["body"]  # nulls dropped like .dropna()
    assert '"ix":1' in dumped["body"].replace(" ", "")
