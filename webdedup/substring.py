"""Substring-overlap pass: long exact overlaps that MinHash misses.

A doc embedding a >=200-char span of another doc can sit far below any
Jaccard threshold (the container dilutes the shingle set) — the reference's
`contains_score` (suricate/preutils/similarityscores.py:56-75) only handles
whole-string containment and only per pair.  At scale we do it in two stages:

  1. **Anchor blocking** (JVM-side): hash fixed-width char grams sampled at a
     stride from the raw text; docs sharing a *rare* anchor (2..max docs)
     become candidate pairs.  Any common substring of length
     >= anchor_len + stride - 1 is guaranteed to contain at least one fully
     aligned sampled anchor on one side — we sample anchors on a stride-1
     grid on one side of the join (small side) or, cheaper and symmetric:
     stride-sampled on both sides guarantees detection for overlaps
     >= 2*stride + anchor_len (we size min_overlap_chars comfortably above).
     To keep the guarantee tight we sample *all* positions mod stride on the
     left and every position on the right?  No — both sides stride-sampled
     with the SAME grid only matches aligned offsets.  Instead: left side
     emits anchors at every position (dense), right side at stride positions.
     Density is bounded by doc length; at web scale the dense side uses a
     longer stride with a rolling-hash pandas UDF.  v1: dense side = stride 1
     is too hot, so we use stride on both sides but over a *canonical* grid:
     anchors start at positions where xxhash(gram) % stride == 0 — a
     content-defined (Winnowing-style, Schleimer et al. 2003) selection that
     is alignment-invariant, so both docs select the same anchors inside any
     shared span.

  2. **Verification** (mapInPandas batch): for each candidate pair, the
     longest common substring is computed (difflib C fast path) and pairs
     with overlap >= min_overlap_chars survive, scored by overlap length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webdedup.candidates import _pairs_from_keys
from webdedup.config import DedupConfig


def anchor_keys(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Content-defined anchors: hash every anchor_len char-gram, keep grams
    whose hash % stride == 0 (Winnowing-style selection — alignment
    invariant, so a shared span >= anchor_len + stride*E[gap] yields shared
    anchors regardless of offset).  All JVM-side: sequence/transform/filter.
    """
    alen, stride = cfg.anchor_len, cfg.anchor_stride
    text = F.coalesce(F.col("text"), F.lit(""))
    n = F.length(text)
    grams = F.when(
        n >= alen,
        F.transform(
            F.sequence(F.lit(1), n - alen + 1),
            lambda i: F.xxhash64(F.substring(text, i, alen)),
        ),
    ).otherwise(F.array())
    selected = F.array_distinct(
        F.filter(grams, lambda h: F.pmod(h, F.lit(stride)) == 0)
    )
    return pages.select("url", F.explode(selected).alias("key_hash")).withColumn(
        "key_idx", F.lit(0)
    )


def substring_candidates(
    pages: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """(pairs(url_a, url_b, method='substring'), skew_metrics)."""
    keys = anchor_keys(pages, cfg)
    return _pairs_from_keys(keys, cfg, "substring")


_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType()),
        T.StructField("url_b", T.StringType()),
        T.StructField("overlap_len", T.IntegerType()),
    ]
)


def verify_overlaps(
    pairs: DataFrame, pages: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Join texts onto candidate pairs and measure the longest common
    substring per pair (mapInPandas, difflib C implementation).  Returns
    (url_a, url_b, overlap_len) for pairs meeting min_overlap_chars."""
    min_overlap = cfg.min_overlap_chars
    texts = pages.select("url", "text")
    joined = (
        pairs.select("url_a", "url_b")
        .join(texts.select(F.col("url").alias("url_a"), F.col("text").alias("text_a")), "url_a")
        .join(texts.select(F.col("url").alias("url_b"), F.col("text").alias("text_b")), "url_b")
        .select("url_a", "url_b", "text_a", "text_b")
    )

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from difflib import SequenceMatcher

        for pdf in batches:
            if pdf.empty:
                continue
            lens = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                ta = ta or ""
                tb = tb or ""
                if min(len(ta), len(tb)) < min_overlap:
                    lens.append(0)
                    continue
                m = SequenceMatcher(None, ta, tb, autojunk=False).find_longest_match(
                    0, len(ta), 0, len(tb)
                )
                lens.append(int(m.size))
            out = pdf[["url_a", "url_b"]].copy()
            out["overlap_len"] = pd.array(lens, dtype="int32")
            yield out[out["overlap_len"] >= min_overlap]

    return joined.mapInPandas(measure, schema=_VERIFY_SCHEMA)
