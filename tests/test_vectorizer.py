"""TF-IDF relational cosine (vectorizer.py) vs a pure-python oracle with
sklearn TfidfVectorizer default semantics; haversine sanity."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from webdedup.features import haversine_km
from webdedup.vectorizer import pair_cosine, tfidf_weights

TEXTS = {
    "u1": "the quick brown fox jumps over the lazy dog",
    "u2": "the quick brown fox leaps over a lazy dog",
    "u3": "completely different words entirely unrelated content",
    "u4": "the quick brown fox jumps over the lazy dog",  # exact dup of u1
}


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 2]


def _oracle_cosine(a: str, b: str) -> float:
    docs = {u: _tokens(t) for u, t in TEXTS.items()}
    n = len(docs)
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))

    def vec(u):
        tf = Counter(docs[u])
        w = {t: c * (math.log((n + 1) / (df[t] + 1)) + 1) for t, c in tf.items()}
        l2 = math.sqrt(sum(x * x for x in w.values()))
        return {t: x / l2 for t, x in w.items()}

    va, vb = vec(a), vec(b)
    return sum(va[t] * vb.get(t, 0.0) for t in va)


def test_tfidf_weights_l2_normalized(spark):
    docs = spark.createDataFrame(list(TEXTS.items()), "url string, text string")
    norms = (
        tfidf_weights(docs)
        .groupBy("url")
        .agg(F.sum(F.col("w") * F.col("w")).alias("sq"))
        .collect()
    )
    for r in norms:
        assert abs(r["sq"] - 1.0) < 1e-9


def test_pair_cosine_matches_sklearn_semantics(spark):
    docs = spark.createDataFrame(list(TEXTS.items()), "url string, text string")
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u1", "u4")], "url_a string, url_b string"
    )
    w = tfidf_weights(docs)
    got = {
        (r["url_a"], r["url_b"]): r["tfidf_cosine"]
        for r in pair_cosine(pairs, w).collect()
    }
    assert abs(got[("u1", "u2")] - _oracle_cosine("u1", "u2")) < 1e-9
    assert abs(got[("u1", "u3")] - _oracle_cosine("u1", "u3")) < 1e-9
    assert abs(got[("u1", "u4")] - 1.0) < 1e-9  # exact dup -> cosine 1
    assert got[("u1", "u2")] > got[("u1", "u3")]


def test_pair_cosine_duplicate_pair_rows(spark):
    """A pair fed in twice must NOT double its cosine (the dot product
    dedups pair keys before the weight joins); each input row still gets
    its own output row with the correct value."""
    docs = spark.createDataFrame(list(TEXTS.items()), "url string, text string")
    pairs = spark.createDataFrame(
        [("u1", "u4"), ("u1", "u4")], "url_a string, url_b string"
    )
    got = pair_cosine(pairs, tfidf_weights(docs)).collect()
    assert len(got) == 2
    for r in got:
        assert abs(r["tfidf_cosine"] - 1.0) < 1e-9  # u4 is u1's exact dup


def test_refit_add_with_empty_batch_keeps_prior(spark):
    """addvocab='add' with a token-less batch must not NULL out the merged
    stats (empty snapshots have no rows to carry n_docs on)."""
    from webdedup.vectorizer import fit_term_stats, refit_term_stats

    docs = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "alpha gamma")], "url string, text string"
    )
    prior = fit_term_stats(docs)
    empty = spark.createDataFrame([("c", "x !")], "url string, text string")
    merged = refit_term_stats(empty, prior=prior, addvocab="add")
    rows = {r["term"]: (r["df"], r["n_docs"]) for r in merged.collect()}
    assert rows["alpha"] == (2, 2)
    assert all(nd == 2 for _, nd in rows.values())


def test_pair_cosine_no_shared_terms_is_zero(spark):
    docs = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "gamma delta")], "url string, text string"
    )
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    got = pair_cosine(pairs, tfidf_weights(docs)).collect()[0]
    assert got["tfidf_cosine"] == 0.0


def test_haversine_paris_london(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "la double, na double, lb double, nb double"
    )
    km = df.select(
        haversine_km(F.col("la"), F.col("na"), F.col("lb"), F.col("nb")).alias("km")
    ).collect()[0]["km"]
    assert abs(km - 343.5) < 2.0


# ---------------------------------------------------------------------------
# addvocab refit semantics (suricate/dftransformers/vectorizer.py:95-148)
# ---------------------------------------------------------------------------

CORPUS_A = {"a1": "alpha beta gamma", "a2": "alpha beta"}
CORPUS_B = {"b1": "alpha delta", "b2": "delta epsilon epsilon"}


def _stats_dict(stats_df):
    rows = stats_df.collect()
    n = rows[0]["n_docs"] if rows else 0
    return {r["term"]: r["df"] for r in rows}, n


def _mk(spark, texts):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"url": list(texts), "text": list(texts.values())})
    )


def test_addvocab_replace_and_keep(spark):
    from webdedup.vectorizer import fit_term_stats, refit_term_stats

    a = _mk(spark, CORPUS_A)
    b = _mk(spark, CORPUS_B)
    prior = fit_term_stats(a)
    kept = refit_term_stats(b, prior=prior, addvocab="keep")
    d, n = _stats_dict(kept)
    assert d == {"alpha": 2, "beta": 2, "gamma": 1} and n == 2  # untouched

    repl = refit_term_stats(b, prior=prior, addvocab="replace")
    d, n = _stats_dict(repl)
    assert d == {"alpha": 1, "delta": 2, "epsilon": 1} and n == 2


def test_addvocab_add_merges_counts(spark):
    from webdedup.vectorizer import fit_term_stats, refit_term_stats

    a = _mk(spark, CORPUS_A)
    b = _mk(spark, CORPUS_B)
    merged = refit_term_stats(b, prior=fit_term_stats(a), addvocab="add")
    d, n = _stats_dict(merged)
    # == fitting on the concatenated corpus
    assert n == 4
    assert d == {"alpha": 3, "beta": 2, "gamma": 1, "delta": 2, "epsilon": 1}


def test_fixed_vocab_transform_drops_oov(spark):
    """tfidf_weights with a prior snapshot == sklearn transform with the
    fitted (old) vocabulary: idf from the snapshot, OOV terms dropped."""
    import math

    from webdedup.vectorizer import fit_term_stats, tfidf_weights

    a = _mk(spark, CORPUS_A)
    b = _mk(spark, CORPUS_B)
    w = tfidf_weights(b, term_stats=fit_term_stats(a)).collect()
    by_doc = {}
    for r in w:
        by_doc.setdefault(r["url"], {})[r["term"]] = r["w"]
    # b2 has no in-vocab term at all -> absent; b1 keeps only 'alpha'
    assert "b2" not in by_doc
    assert set(by_doc["b1"]) == {"alpha"}
    # single in-vocab term -> L2 norm makes it exactly 1.0
    assert math.isclose(by_doc["b1"]["alpha"], 1.0, rel_tol=1e-12)
