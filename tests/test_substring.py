"""Substring (suffix-anchor) pass tests."""

import pandas as pd

from webdedup.config import DedupConfig
from webdedup.substring import anchor_keys, substring_candidates, verify_overlaps


def _pages(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))


def test_anchor_detects_planted_overlap(spark):
    cfg = DedupConfig()
    span = "the quick brown fox jumps over the lazy dog and runs far away " * 5  # ~315 chars
    pages = _pages(
        spark,
        [
            ("u1", "prefix text here alpha beta gamma " + span + " suffix omega"),
            ("u2", "completely different start " + span + " different ending words"),
            ("u3", "no overlap with anything else at all just some plain words here"),
        ],
    )
    pairs, _ = substring_candidates(pages, cfg)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert ("u1", "u2") in got
    assert all("u3" not in p for p in got)

    verified = verify_overlaps(pairs, pages, cfg).collect()
    assert len(verified) == 1
    # each shared dense gram is one aligned exact >=200-char window; the
    # span here is a 63-char phrase repeated 5x, so DISTINCT grams collapse
    # to one per phase offset (~63), not span_len - L + 1
    assert verified[0]["n_shared_grams"] >= 50


def test_verify_rejects_short_overlap(spark):
    cfg = DedupConfig()
    pages = _pages(
        spark,
        [
            ("a", "shared short bit of text plus lots of unique words " + "x " * 100),
            ("b", "shared short bit of text plus totally other content " + "y " * 100),
        ],
    )
    pairs = spark.createDataFrame(pd.DataFrame({"url_a": ["a"], "url_b": ["b"]}))
    assert verify_overlaps(pairs, pages, cfg).count() == 0  # overlap < 200 chars


def test_anchor_selection_alignment_invariant(spark):
    """Winnowing property: the selected anchors inside a shared span are the
    same regardless of the span's offset in the document."""
    cfg = DedupConfig()
    span = "alignment invariant anchor selection check phrase repeated " * 6
    pages = _pages(
        spark,
        [("p1", "AA " + span), ("p2", "BBBBBBB CCCC DDDDD " + span)],
    )
    from pyspark.sql import functions as F

    dids = {
        r["url"]: r["did"]
        for r in pages.select("url", F.xxhash64("url").alias("did")).collect()
    }
    keys = anchor_keys(pages, cfg).collect()
    k1 = {r["key_hash"] for r in keys if r["did"] == dids["p1"]}
    k2 = {r["key_hash"] for r in keys if r["did"] == dids["p2"]}
    assert len(k1 & k2) >= 3  # shared span selects the same gram hashes
