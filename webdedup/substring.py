"""Substring-overlap pass: long exact overlaps that MinHash misses.

A doc embedding a >=200-char span of another doc can sit far below any
Jaccard threshold (the container dilutes the shingle set) — the reference's
`contains_score` (suricate/preutils/similarityscores.py:56-75) only handles
whole-string containment and only per pair.  At scale we do it in two
fully-JVM stages:

  1. **Anchor blocking**: hash every anchor_len char-gram of the raw text,
     keep grams whose hash % stride == 0 — a content-defined (Winnowing-
     style, Schleimer et al., SIGMOD 2003) selection that is alignment-
     invariant: two docs sharing a long span select the SAME grams inside
     it, at any offset.  Docs sharing a rare selected gram (2..anchor_max
     docs; hotter grams are boilerplate) become candidate pairs.

  2. **Verification**: for the docs that appear in candidate pairs ONLY,
     compute the dense set of xxhash64(L-grams) (L = min_overlap_chars) and
     verify each pair by native array_intersect — a shared L-gram IS an
     exact >=L-char common substring (modulo 64-bit hash collision).  This
     replaces an earlier difflib longest-common-substring mapInPandas pass
     that was ~10x slower and kept the hot path in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.candidates import _pairs_from_keys
from webdedup.config import DedupConfig


def anchor_keys(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Content-defined anchors as (url, key_idx=0, key_hash) rows.

    All JVM-side.  The text column is referenced through a materialized
    projection so the transform() lambda captures a bound attribute (see
    signatures.py on the CodegenFallback re-evaluation trap).
    """
    alen, stride = cfg.anchor_len, cfg.anchor_stride
    base = pages.select("url", F.coalesce(F.col("text"), F.lit("")).alias("t"))
    t = F.col("t")
    n = F.length(t)
    grams = F.when(
        n >= alen,
        F.transform(
            F.sequence(F.lit(1), n - alen + 1),
            lambda i: F.xxhash64(F.substring(t, i, alen)),
        ),
    ).otherwise(F.array())
    selected = F.array_distinct(
        F.filter(grams, lambda h: F.pmod(h, F.lit(stride)) == 0)
    )
    return base.select("url", F.explode(selected).alias("key_hash")).withColumn(
        "key_idx", F.lit(0)
    )


def substring_candidates(
    pages: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """(pairs(url_a, url_b, method='substring'), skew_metrics)."""
    keys = anchor_keys(pages, cfg)
    return _pairs_from_keys(keys, cfg, "substring", max_bucket=cfg.anchor_max_docs)


def _dense_gram_sets(docs: DataFrame, length: int) -> DataFrame:
    """(url, grams array<long>): xxhash64 of EVERY length-char gram.

    O(n * length) JVM work per doc — only ever applied to candidate-pair
    members, never the full corpus."""
    base = docs.select("url", F.coalesce(F.col("text"), F.lit("")).alias("t"))
    t = F.col("t")
    n = F.length(t)
    grams = F.when(
        n >= length,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - length + 1),
                lambda i: F.xxhash64(F.substring(t, i, length)),
            )
        ),
    ).otherwise(F.array())
    return base.select("url", grams.alias("grams"))


def verify_overlaps(
    pairs: DataFrame, pages: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Keep pairs sharing at least one exact min_overlap_chars-char substring.

    Returns (url_a, url_b, n_shared_grams); n_shared_grams >= 1 certifies a
    common substring of length >= min_overlap_chars (each shared dense-gram
    hash is one aligned exact window).
    """
    p = pairs.select("url_a", "url_b")
    members = (
        p.select(F.col("url_a").alias("url"))
        .unionByName(p.select(F.col("url_b").alias("url")))
        .distinct()
    )
    docs = pages.join(members, "url", "left_semi")
    grams = _dense_gram_sets(docs, cfg.min_overlap_chars)
    a = grams.select(F.col("url").alias("url_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col("url").alias("url_b"), F.col("grams").alias("g_b"))
    return (
        p.join(a, "url_a")
        .join(b, "url_b")
        .select(
            "url_a",
            "url_b",
            F.size(F.array_intersect("g_a", "g_b")).alias("n_shared_grams"),
        )
        .where(F.col("n_shared_grams") >= 1)
    )
