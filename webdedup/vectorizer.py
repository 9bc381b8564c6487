"""TF-IDF cosine similarity over candidate pairs — the VectorizerConnector
equivalent (suricate/dftransformers/vectorizer.py:11-167), re-architected
relationally.

The reference fits a sklearn TfidfVectorizer on both corpora and computes a
dense sources×targets cosine matrix by sparse matmul (vectorizer.py:151-167)
— quadratic, in-RAM.  Here the sparse dot product is three relational ops:

    docs -> explode(terms) -> tf -> idf (one agg) -> l2-normalized weights
    cosine(a, b) = SUM over shared terms of w_a * w_b
                 = pairs ⋈ weights_a ⋈ weights_b(term) -> groupBy(pair).sum

Everything is JVM-side (whole-stage codegen, map-side partial aggregation);
no UDF, no vector types, no driver-side vocabulary.  At 100 TB the weights
table is computed once and reused (the reference's `addvocab='keep'` refit
semantics become: recompute or reuse the weights snapshot).

Semantics pinned to sklearn TfidfVectorizer defaults (what the reference
uses) with ONE deliberate divergence: sklearn's default token pattern is
unicode \\w\\w+ (keeps underscores and non-ASCII word chars); here tokens
are runs of >= 2 ASCII alphanumerics so the DuckDB oracle (RE2: ASCII \\w)
replays the tokenizer bit-for-bit.  Latin-script text should pass through
normalize.fold_ascii first; CJK text has no usable ASCII runs and belongs
to the shingle/MinHash path, not TF-IDF terms.  Otherwise identical:
lowercase, raw term counts, idf = ln((N+1)/(df+1)) + 1 (smooth_idf), L2
document normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, term) multiset -> (url, term, tf); sklearn-style tokens:
    lowercase runs of >=2 word characters."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) >= 2,
    )
    return (
        docs.select("url", F.explode(toks).alias("term"))
        .groupBy("url", "term")
        .agg(F.count("*").alias("tf"))
    )


def fit_term_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The vectorizer's fitted state as a snapshot table: (term, df, n_docs)
    with n_docs replicated per row (parquet/Iceberg-friendly — one table IS
    the whole fit, reusable across runs via a checkpoint stage)."""
    terms = _terms(docs, text_col)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    return (
        terms.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )


def refit_term_stats(
    docs: DataFrame,
    prior: DataFrame | None = None,
    addvocab: str = "replace",
    text_col: str = "text",
) -> DataFrame:
    """The reference's addvocab refit semantics
    (suricate/dftransformers/vectorizer.py:95-148, where _vocab is the
    accumulated fit corpus):

      - 'replace': fit stats from ``docs`` only
      - 'keep':    reuse ``prior`` unchanged (no refit)
      - 'add':     fit on the concatenated corpus — per-term df counts and
                   n_docs ADD across the old snapshot and the new corpus
                   (a full-outer merge; never re-reads the old corpus)
    """
    if addvocab not in ("add", "keep", "replace"):
        raise ValueError("addvocab must be 'add', 'keep' or 'replace'")
    if addvocab == "keep":
        if prior is None:
            raise ValueError("addvocab='keep' requires a prior snapshot")
        return prior
    new = fit_term_stats(docs, text_col)
    if addvocab == "replace" or prior is None:
        return new
    o = prior.select("term", F.col("df").alias("df_o"), F.col("n_docs").alias("n_o"))
    n = new.select("term", F.col("df").alias("df_n"), F.col("n_docs").alias("n_n"))
    # coalesce(max, 0): a snapshot with an EMPTY vocabulary (empty batch,
    # or no token survives the >=2-char filter) has zero rows, so its
    # max(n_docs) is NULL — without the coalesce every merged term's
    # n_docs (and every downstream idf/weight/cosine) would go NULL.
    # Limitation: the doc count rides on term rows, so a token-less batch
    # contributes 0 to n_docs rather than its true doc count.
    totals = (
        prior.select(F.coalesce(F.max("n_docs"), F.lit(0)).alias("n_o"))
        .crossJoin(
            new.select(F.coalesce(F.max("n_docs"), F.lit(0)).alias("n_n"))
        )
        .select((F.col("n_o") + F.col("n_n")).alias("n_docs"))
    )
    return (
        o.join(n, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df_o", F.lit(0)) + F.coalesce("df_n", F.lit(0))).alias("df"),
        )
        .crossJoin(F.broadcast(totals))
    )


def tfidf_weights(
    docs: DataFrame,
    text_col: str = "text",
    term_stats: DataFrame | None = None,
    broadcast_stats: bool = True,
) -> DataFrame:
    """L2-normalized tf-idf term weights: (url, term, w).

    One explode + three hash aggregations; the document count is folded in
    via a 1-row broadcast join (no driver round-trip in the plan).

    term_stats: optional fitted snapshot from fit_term_stats/refit_term_stats
    — idf comes from the snapshot and out-of-vocabulary terms are dropped
    (sklearn transform semantics with a fixed vocabulary); without it the
    stats are fit on ``docs`` itself.

    broadcast_stats: the stats table is term-dictionary-sized; at web scale
    (100s of millions of distinct terms) pass False to let the term join
    shuffle instead of broadcasting."""
    terms = _terms(docs, text_col)
    if term_stats is None:
        term_stats = fit_term_stats(docs, text_col)
    stats = F.broadcast(term_stats) if broadcast_stats else term_stats
    weighted = terms.join(stats, "term").withColumn(
        "w_raw",
        F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
    )
    norms = weighted.groupBy("url").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("l2")
    )
    return (
        weighted.join(norms, "url")
        .select("url", "term", (F.col("w_raw") / F.col("l2")).alias("w"))
    )


def pair_cosine(
    pairs: DataFrame, weights: DataFrame, out_col: str = "tfidf_cosine"
) -> DataFrame:
    """Cosine for candidate pairs (url_a, url_b) from normalized weights:
    sparse dot product as join + sum.  Pairs sharing no term get 0.0."""
    wa = weights.select(
        F.col("url").alias("url_a"), "term", F.col("w").alias("w_a")
    )
    wb = weights.select(
        F.col("url").alias("url_b"), "term", F.col("w").alias("w_b")
    )
    dots = (
        # distinct: a pair fed in k times (e.g. two candidate sources
        # unioned without dedup) would otherwise k-multiply every shared-
        # term row and report k * cosine (values > 1.0)
        pairs.select("url_a", "url_b")
        .distinct()
        .join(wa, "url_a")
        .join(wb, ["url_b", "term"])
        .groupBy("url_a", "url_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias(out_col))
    )
    return (
        pairs.join(dots, ["url_a", "url_b"], "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0)))
    )


TFIDF_SQL_DOC = """DuckDB-equivalent of tfidf_weights + pair_cosine, for oracle
parity (same tokenizer, same smooth idf, same L2 norm):

WITH terms AS (
  SELECT url, t.term, count(*) AS tf
  FROM docs, unnest(list_filter(
         regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2
       )) AS t(term)
  GROUP BY url, t.term
), df AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM docs),
w AS (
  SELECT url, term, tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w_raw
  FROM terms JOIN df USING (term) CROSS JOIN n
), norms AS (SELECT url, sqrt(sum(w_raw * w_raw)) AS l2 FROM w GROUP BY url),
wn AS (SELECT url, term, w_raw / l2 AS w FROM w JOIN norms USING (url))
SELECT a.url AS url_a, b.url AS url_b, sum(a.w * b.w) AS tfidf_cosine
FROM wn a JOIN wn b ON a.term = b.term AND a.url < b.url
GROUP BY 1, 2
"""
