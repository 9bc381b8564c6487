"""Test-set decontamination (n-gram overlap vs a benchmark set)."""

import pyspark.sql.functions as F
import pytest

from webdedup.decontaminate import decontaminate


@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full copy of bench 100 -> every gram contaminated
            (1, "the quick brown fox jumps over the lazy dog"),
            # shares exactly one 4-gram window with bench 101
            (2, "she did pack my box with five of them indeed"),
            # clean
            (3, "completely unrelated words live in this document here"),
            # too short for 4-grams
            (4, "tiny doc"),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    return bench, corpus


def test_decontaminate_basic(corpora):
    bench, corpus = corpora
    stats, metrics = decontaminate(corpus, bench, n=4)
    got = {r.doc_id: r for r in stats.collect()}
    assert len(got) == 5
    # doc 1 is a verbatim bench copy: all 6 grams hit, frac 1.0
    assert (got[1].n_grams, got[1].n_contaminated) == (6, 6)
    assert got[1].contaminated_frac == 1.0 and got[1].contaminated
    # doc 2 shares "pack my box with" and "my box with five" (2 of 7 grams)
    assert (got[2].n_grams, got[2].n_contaminated) == (7, 2)
    assert got[2].contaminated
    assert got[3].n_contaminated == 0 and not got[3].contaminated
    # short/empty docs: zero grams, never flagged
    assert (got[4].n_grams, got[4].contaminated) == (0, False)
    assert (got[5].n_grams, got[5].contaminated) == (0, False)
    m = metrics.collect()[0]
    # bench: 6 + 5 distinct 4-grams, no overlap between the two pangrams
    assert m.bench_grams == 11 and m.dropped_hot_grams == 0


def test_decontaminate_min_hits(corpora):
    bench, corpus = corpora
    stats, _ = decontaminate(corpus, bench, n=4, min_hits=3)
    got = {r.doc_id: r for r in stats.collect()}
    assert got[1].contaminated  # 6 hits >= 3
    assert not got[2].contaminated  # 2 hits < 3
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, n=4, min_hits=0)


def test_decontaminate_shuffle_path_identical(corpora):
    bench, corpus = corpora
    a, _ = decontaminate(corpus, bench, n=4, broadcast_bench=True)
    b, _ = decontaminate(corpus, bench, n=4, broadcast_bench=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_decontaminate_hot_gram_cap(spark):
    # one gram shared by 3 bench docs (hot), one by a single bench doc
    bench = spark.createDataFrame(
        [
            (10, "cookie banner accept all"),
            (11, "cookie banner accept all"),
            (12, "cookie banner accept all"),
            (13, "rare secret eval answer"),
        ],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "cookie banner accept all plus rare secret eval answer")],
        "doc_id int, text string",
    )
    capped, metrics = decontaminate(corpus, bench, n=4, max_gram_docs=3)
    r = capped.collect()[0]
    m = metrics.collect()[0]
    # the boilerplate gram is dropped from the bench set and RETURNED as
    # metrics; the rare gram still matches
    assert m.dropped_hot_grams == 1 and m.bench_grams == 1
    assert r.n_contaminated == 1 and r.contaminated
    uncapped, _ = decontaminate(corpus, bench, n=4)
    assert uncapped.collect()[0].n_contaminated == 2
