"""Config + synthetic-fixture tests (maps tests/data/* of the reference)."""

import numpy as np
import pytest

from webdedup.config import NAVALUES, DedupConfig
from webdedup.synth import generate_pages


def test_config_hash_stable_and_sensitive():
    assert DedupConfig().config_hash() == DedupConfig().config_hash()
    assert DedupConfig().config_hash() != DedupConfig(shingle_k=5).config_hash()


def test_config_validates_band_shape():
    with pytest.raises(ValueError):
        DedupConfig(num_perm=100, bands=42, rows_per_band=3)


def test_config_validates_mini_sketch_width():
    # mini_perms > num_perm would read past the minhash array -> NULL packed
    # words -> the in-join gate silently drops every minhash pair
    with pytest.raises(ValueError, match="mini_perms"):
        DedupConfig(num_perm=63, bands=21, rows_per_band=3)
    # legal when the gate is disabled
    DedupConfig(num_perm=63, bands=21, rows_per_band=3, mini_max_hamming=0)


def test_navalues_matches_reference_list():
    # suricate/preutils/preprocessing.py:208-212 (string members)
    for sentinel in ["#", "n.a.", "#REF!", "#DIV/0!", "NaT", "NULL"]:
        assert sentinel in NAVALUES


def test_synth_deterministic():
    a_pages, a_pairs, a_clusters = generate_pages(n_docs=200, seed=7)
    b_pages, b_pairs, b_clusters = generate_pages(n_docs=200, seed=7)
    assert a_pages.equals(b_pages)
    assert a_pairs.equals(b_pairs)
    assert a_clusters.equals(b_clusters)
    c_pages, _, _ = generate_pages(n_docs=200, seed=8)
    assert not a_pages["text"].equals(c_pages["text"])


def test_synth_truth_consistency():
    pages, pairs, clusters = generate_pages(n_docs=300, seed=42)
    # urls unique, every truth url exists
    assert pages["url"].is_unique
    urls = set(pages["url"])
    assert set(pairs["url_a"]) <= urls and set(pairs["url_b"]) <= urls
    # pair canon: url_a < url_b
    assert (pairs["url_a"] < pairs["url_b"]).all()
    # cluster pairs == truth pairs (truth_pairs enumerates intra-cluster pairs)
    by_gid = clusters.groupby("gid")["url"].apply(list)
    n_from_clusters = int(sum(len(v) * (len(v) - 1) // 2 for v in by_gid))
    assert n_from_clusters == len(pairs)
    # planted dup types all present at this size
    assert {"exact", "near", "substring"} <= set(pairs["dup_type"])


def test_synth_exact_dups_byte_identical():
    pages, pairs, _ = generate_pages(n_docs=300, seed=42)
    text = dict(zip(pages["url"], pages["text"]))
    exact = pairs[pairs["dup_type"] == "exact"]
    assert len(exact) > 0
    for _, r in exact.iterrows():
        assert text[r["url_a"]] == text[r["url_b"]]


def test_synth_substring_overlap_planted():
    pages, pairs, _ = generate_pages(n_docs=300, seed=42)
    text = dict(zip(pages["url"], pages["text"]))
    subs = pairs[pairs["dup_type"] == "substring"]
    assert len(subs) > 0
    ok = 0
    for _, r in subs.iterrows():
        a, b = text[r["url_a"]], text[r["url_b"]]
        short, longer = (a, b) if len(a) <= len(b) else (b, a)
        # the planted span is a contiguous substring of the base text
        if any(short[i : i + 200] in longer for i in range(0, max(len(short) - 200, 1), 50)):
            ok += 1
    assert ok >= 0.9 * len(subs)


def test_synth_invalid_utf8_only_in_html():
    pages, _, _ = generate_pages(n_docs=300, seed=42)
    bad = [h for h in pages["html"] if b"\xff\xfe\x80" in h]
    assert len(bad) > 0  # planted
    for t in pages["text"]:
        t.encode("utf-8")  # text must stay clean


def test_synth_boilerplate_skew_present():
    pages, _, _ = generate_pages(n_docs=300, seed=42)
    n_boiler = pages["text"].str.startswith("cookie notice").sum()
    assert n_boiler > 30  # skew driver exists


def test_generate_pages_spark_deterministic_and_unique(spark):
    from pyspark.sql import functions as F

    from webdedup.synth import generate_pages_spark

    df = generate_pages_spark(spark, n_docs=2000, seed=11, partitions=8, text_scale=2)
    row = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("url").alias("nu"),
        F.sum(F.xxhash64("url", "text").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    assert row["n"] == 2000 and row["nu"] == 2000
    df2 = generate_pages_spark(spark, n_docs=2000, seed=11, partitions=8, text_scale=2)
    h2 = df2.agg(
        F.sum(F.xxhash64("url", "text").cast("decimal(38,0)")).alias("h")
    ).collect()[0]["h"]
    assert row["h"] == h2  # same params -> byte-identical corpus


def test_generate_pages_text_scale():
    pages1, _, _ = generate_pages(n_docs=200, seed=3, text_scale=1)
    pages4, _, _ = generate_pages(n_docs=200, seed=3, text_scale=4)
    assert pages4["text"].str.len().mean() > 3 * pages1["text"].str.len().mean()
