"""Corpus-level duplicated-unit removal (linededup) + repetition stats."""

import pyspark.sql.functions as F
import pytest

from webdedup.linededup import dedup_units, split_units
from webdedup.textstats import repetition_stats


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        # d1 is globally first (min id) and holds the boilerplate line
        (1, "cookie notice\nalpha unique one\nbeta unique two"),
        (2, "gamma unique three\ncookie notice"),
        (3, "cookie notice\ndelta unique four"),
        (4, "all unique here\nno boilerplate at all"),
        (5, ""),  # empty doc
        (6, "cookie notice"),  # doc that is ONLY boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_split_units_lines(line_docs):
    u = split_units(line_docs, sep="\n").collect()
    assert len(u) == 10  # empty doc contributes nothing
    d1 = sorted((r.pos, r.unit) for r in u if r.doc_id == 1)
    assert d1 == [(0, "cookie notice"), (1, "alpha unique one"), (2, "beta unique two")]


def test_dedup_lines_keep_one(spark, line_docs):
    cleaned, metrics = dedup_units(line_docs, sep="\n", keep="one")
    got = {r.doc_id: r for r in cleaned.collect()}
    assert len(got) == 6
    # keeper = globally-first occurrence: (doc 1, pos 0) keeps its copy
    assert got[1].cleaned_text == "cookie notice\nalpha unique one\nbeta unique two"
    assert got[1].n_removed == 0
    # later occurrences dropped, order of survivors preserved
    assert got[2].cleaned_text == "gamma unique three"
    assert got[2].n_removed == 1
    assert got[3].cleaned_text == "delta unique four"
    # untouched doc byte-identical
    assert got[4].cleaned_text == "all unique here\nno boilerplate at all"
    assert got[4].n_removed == 0
    # empty doc survives as empty
    assert got[5].cleaned_text == "" and got[5].n_units == 0
    # boilerplate-only doc empties out
    assert got[6].cleaned_text == "" and got[6].n_removed == 1
    m = metrics.collect()[0]
    assert (m.hot_units, m.removed_occurrences, m.total_units) == (1, 3, 10)


def test_dedup_lines_keep_none(spark, line_docs):
    cleaned, metrics = dedup_units(line_docs, sep="\n", keep="none")
    got = {r.doc_id: r.cleaned_text for r in cleaned.collect()}
    assert got[1] == "alpha unique one\nbeta unique two"  # keeper also dropped
    assert got[6] == ""
    m = metrics.collect()[0]
    assert (m.hot_units, m.removed_occurrences) == (1, 4)


def test_dedup_chunks(spark):
    base = " ".join(f"w{i}" for i in range(10))  # one exact 10-token chunk
    rows = [
        (1, base + " " + " ".join(f"x{i}" for i in range(7))),  # 10+7 -> 2 chunks
        (2, base),                                              # shares chunk 0 with d1
        (3, " ".join(f"y{i}" for i in range(25))),              # 3 chunks, all unique
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    u = split_units(docs, chunk_width=10)
    per_doc = {r.doc_id: r.n for r in u.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 2, 2: 1, 3: 3}
    cleaned, _ = dedup_units(docs, chunk_width=10, keep="one")
    got = {r.doc_id: r for r in cleaned.collect()}
    # keeper = (doc 1, pos 0); doc 2 loses its only chunk
    assert got[1].cleaned_text.startswith(base) and got[1].n_removed == 0
    assert got[2].cleaned_text == "" and got[2].n_removed == 1
    assert got[3].n_removed == 0 and got[3].n_units == 3


def test_repetition_stats(spark):
    rows = [
        (1, "a b a b a"),     # bigrams: ab ba ab ba -> all duplicated
        (2, "p q r s"),       # 3 distinct bigrams, none repeated
        (3, "solo"),          # < 2 tokens -> no grams
        (4, "z z z"),         # bigrams: zz zz
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in repetition_stats(docs, n=2).collect()}
    assert got[1].n_grams == 4
    assert got[1].dup_gram_frac == 1.0
    assert got[1].top_gram_share == 0.5
    assert got[2].n_grams == 3
    assert got[2].dup_gram_frac == 0.0
    assert round(got[2].top_gram_share, 6) == round(1 / 3, 6)
    assert got[3].n_grams == 0
    assert got[3].dup_gram_frac == 0.0 and got[3].top_gram_share == 0.0
    assert got[4].dup_gram_frac == 1.0 and got[4].top_gram_share == 1.0


# --- property test: Spark dedup_units vs a pure-python reference model ---
# Small line pool forces cross-doc collisions; the model replays the exact
# contract (hotness by distinct docs, keeper = global min (doc_id, pos),
# whitespace-only units dropped but positions preserved).

from hypothesis import given, settings
from hypothesis import strategies as st

_LINE_POOL = ["aa", "bb", "cc", "d d", "", " ", "ee ff", "\t", "\r", "\xa0"]
_doc_texts = st.lists(
    st.lists(st.sampled_from(_LINE_POOL), min_size=0, max_size=5).map("\n".join),
    min_size=1,
    max_size=6,
)


def _model_dedup(texts, min_docs, keep):
    units = []  # (doc_id, pos, unit)
    for did, text in enumerate(texts):
        for pos, u in enumerate(text.split("\n")):
            if u.strip():
                units.append((did, pos, u))
    docs_per_unit = {}
    for did, _, u in units:
        docs_per_unit.setdefault(u, set()).add(did)
    hot = {u for u, d in docs_per_unit.items() if len(d) >= min_docs}
    keeper = {}
    for did, pos, u in units:
        if u in hot and (u not in keeper or (did, pos) < keeper[u]):
            keeper[u] = (did, pos)
    out = {}
    for did, text in enumerate(texts):
        doc_units = [(p, u) for d, p, u in units if d == did]
        if keep == "one":
            kept = [u for p, u in doc_units if u not in hot or keeper[u] == (did, p)]
        else:
            kept = [u for p, u in doc_units if u not in hot]
        out[did] = (len(doc_units), len(doc_units) - len(kept), "\n".join(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(texts=_doc_texts, min_docs=st.sampled_from([2, 3]), keep=st.sampled_from(["one", "none"]))
def test_dedup_units_matches_model(spark, texts, min_docs, keep):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    ).repartition(3)  # exercise the distributed path, not one partition
    cleaned, _ = dedup_units(docs, sep="\n", min_docs=min_docs, keep=keep)
    got = {r.doc_id: (r.n_units, r.n_removed, r.cleaned_text) for r in cleaned.collect()}
    assert got == _model_dedup(texts, min_docs, keep)
