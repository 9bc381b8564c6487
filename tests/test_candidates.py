"""Blocking-layer tests: band buckets, skew caps, exact pass, ranking."""

import pandas as pd
from pyspark.sql import functions as F

from webdedup.candidates import (
    _pairs_from_keys,
    bucket_stats,
    exact_candidates,
    rank_candidates,
    union_candidates,
)
from webdedup.config import DedupConfig


def _keys_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "key_idx", "key_hash"]))


def test_pairs_from_keys_basic(spark):
    cfg = DedupConfig()
    keys = _keys_df(
        spark,
        [("a", 0, 1), ("b", 0, 1), ("c", 0, 1), ("d", 0, 2), ("e", 1, 1)],
    )
    pairs, skew = _pairs_from_keys(keys, cfg, "minhash")
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    # bucket (0,1) = {a,b,c} -> 3 pairs; singleton buckets yield nothing;
    # bucket (1,1)={e} disjoint from (0,1) despite same hash (key_idx matters)
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}
    assert skew.first()["dropped_buckets"] == 0


def test_bucket_cap_drops_and_reports(spark):
    cfg = DedupConfig(max_bucket_size=3)
    rows = [(f"u{i}", 0, 99) for i in range(10)] + [("x", 0, 1), ("y", 0, 1)]
    pairs, skew = _pairs_from_keys(_keys_df(spark, rows), cfg, "minhash")
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert got == {("x", "y")}  # the size-10 bucket is capped away
    s = skew.first()
    assert s["dropped_buckets"] == 1
    assert s["dropped_rows"] == 10
    assert s["max_dropped_bucket"] == 10


def test_bucket_stats_two_phase_counts(spark):
    cfg = DedupConfig()
    rows = [(f"u{i}", 0, 7) for i in range(20)] + [("z", 1, 7)]
    stats = {
        (r["key_idx"], r["key_hash"]): r["bucket_size"]
        for r in bucket_stats(_keys_df(spark, rows), cfg).collect()
    }
    assert stats[(0, 7)] == 20
    assert stats[(1, 7)] == 1


def test_exact_candidates_star_shape(spark):
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u3", "u4"],
                "text": ["same", "same", "same", "other"],
            }
        )
    )
    got = {(r["url_a"], r["url_b"]) for r in exact_candidates(pages).collect()}
    # star: every member pairs with min url, linear in group size
    assert got == {("u1", "u2"), ("u1", "u3")}


def test_union_candidates_provenance(spark):
    a = spark.createDataFrame(pd.DataFrame({"url_a": ["x"], "url_b": ["y"]})).withColumn(
        "method", F.lit("minhash")
    )
    b = spark.createDataFrame(pd.DataFrame({"url_a": ["x"], "url_b": ["y"]})).withColumn(
        "method", F.lit("exact")
    )
    row = union_candidates(a, b).first()
    assert row["methods"] == ["exact", "minhash"]


def test_rank_candidates_topk(spark):
    scored = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["s", "s", "s", "t"],
                "url_b": ["b1", "b2", "b3", "b1"],
                "score": [0.9, 0.5, 0.7, 0.3],
            }
        )
    )
    got = {(r["url_a"], r["url_b"]): r["rank"] for r in rank_candidates(scored, "score", k=2).collect()}
    assert got == {("s", "b1"): 1, ("s", "b3"): 2, ("t", "b1"): 1}


def test_canonical_url_and_url_candidates(spark):
    import pandas as pd

    from webdedup.candidates import url_candidates
    from webdedup.normalize import canonical_url

    variants = [
        "https://Site0.example/p/1",
        "http://site0.example/p/1/",
        "www.site0.example/p/1",
        "https://site0.example/p/1#frag",
    ]
    others = [
        "https://site0.example/p/2",          # different path
        "https://site0.example/P/1",          # path IS case-sensitive
        "https://site0.example/p/1?x=1",      # query kept
    ]
    # upper-case www. strips; a path-less url's query string is NOT part
    # of the host (params are case-significant page identity)
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://WWW.Site0.example/p/1",
                    "https://site0.example?Token=AbC",
                    "https://Site0.example/p?q=a/B",
                ]
            }
        )
    )
    canon2 = [r[0] for r in df2.select(canonical_url(F.col("url"))).collect()]
    assert canon2 == [
        "site0.example/p/1",
        "site0.example?Token=AbC",
        "site0.example/p?q=a/B",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"url": variants + others})
    )
    canon = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert canon[:4] == ["site0.example/p/1"] * 4
    assert len(set(canon[4:])) == 3 and "site0.example/p/1" not in canon[4:]

    pairs = url_candidates(df).collect()
    # 4 colliding variants -> star of 3 edges around the min url
    assert len(pairs) == 3
    assert all(r.method == "url" for r in pairs)
    keeper = min(variants)
    assert all(r.url_a == keeper for r in pairs)
