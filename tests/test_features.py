"""Comparator goldens — reference semantics parity (SURVEY §2.4, §7.3).

The ratio comparators must reproduce fuzzywuzzy's ratio = 2*M/T semantics
(suricate/preutils/similarityscores.py:23-54).  fuzzywuzzy's primary backend
(python-Levenshtein, its recommended install) computes M as the LCS length;
the oracle here is therefore a naive LCS DP (difflib, its fallback backend,
agrees on all these goldens but can undercount M on adversarial strings).
Plus hand-computed goldens mirroring the reference's foo fixture assertions
(tests/connectors/test_connectors.py:84: np.nansum(exact)==2).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webdedup.features import (
    build_sbs,
    contains_score,
    exact_score,
    jaccard_arrays,
    minhash_similarity,
    simple_ratio,
    token_sort_ratio,
)
from webdedup.normalize import lower_ascii, null_canon, token_set, tokens


@pytest.fixture(scope="module")
def pairs_df(spark):
    # the foo fixture shape: 3x3 cartesian of ['foo','bar','ninja'] x ['foo','bar','baz']
    src = ["foo", "bar", "ninja"]
    tgt = ["foo", "bar", "baz"]
    rows = [(a, b) for a in src for b in tgt]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))


def test_exact_score_foo_golden(spark, pairs_df):
    # np.nansum(exact) == 2 on the foo cartesian (test_connectors.py:84)
    total = pairs_df.select(F.sum(exact_score(F.col("a"), F.col("b"))).alias("s")).first()["s"]
    assert total == 2.0


def test_exact_score_null_is_zero(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": ["x", None], "b": [None, None]}))
    vals = [r[0] for r in df.select(exact_score(F.col("a"), F.col("b"))).collect()]
    assert vals == [0.0, 0.0]


def test_contains_score(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": ["hello world", "abc", None], "b": ["hello", "xyz", "abc"]})
    )
    vals = [r[0] for r in df.select(contains_score(F.col("a"), F.col("b"))).collect()]
    assert vals == [1.0, 0.0, 0.0]


def _lcs_ratio_oracle(a: str, b: str) -> float:
    """Naive O(n*m) LCS DP — the independent oracle for 2*LCS/(|a|+|b|)."""
    if not a or not b:
        return 0.0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(max(prev[j] + (ca == cb), prev[j + 1], cur[-1]))
        prev = cur
    return 2.0 * prev[-1] / (len(a) + len(b))


def test_simple_ratio_matches_lcs_oracle(spark):
    cases = [
        ("hello world", "hello wrld"),
        ("foo", "foo"),
        ("foo", "bar"),
        ("the quick brown fox", "quick brown fox the"),
        ("kitten", "sitting"),
    ]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["a", "b"]))
    got = [r[0] for r in df.select(simple_ratio(F.col("a"), F.col("b"))).collect()]
    want = [_lcs_ratio_oracle(a, b) for a, b in cases]
    assert got == pytest.approx(want)
    # the reference's own golden: ratio('hello world','hello wrld') = 2*10/21
    assert got[0] == pytest.approx(2 * 10 / 21)
    assert got[1] == 1.0


def test_token_sort_ratio_order_invariant(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": ["world hello big", "a b c"], "b": ["big hello world", "c a d"]})
    )
    got = [r[0] for r in df.select(token_sort_ratio(F.col("a"), F.col("b"))).collect()]
    assert got[0] == 1.0  # same tokens, different order
    assert got[1] == pytest.approx(_lcs_ratio_oracle("a b c", "a c d"))


def test_jaccard_arrays(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [[1, 2, 3], [1], []], "b": [[2, 3, 4], [2], []]})
    )
    got = [r[0] for r in df.select(jaccard_arrays(F.col("a"), F.col("b"))).collect()]
    assert got == pytest.approx([2 / 4, 0.0, 0.0])


def test_minhash_similarity_fraction(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [[1, 2, 3, 4]], "b": [[1, 2, 9, 9]]}))
    got = df.select(minhash_similarity(F.col("a"), F.col("b"), 4)).first()[0]
    assert got == pytest.approx(0.5)


def test_null_canon_and_lower_ascii(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["#N/A", "  ", "Héllo Wörld", "NULL", "ok"]})
    )
    got = [r[0] for r in df.select(lower_ascii(F.col("s"))).collect()]
    assert got[0] is None and got[1] is None and got[3] is None
    assert got[2] == "hello world"
    assert got[4] == "ok"


def test_tokens_and_token_set(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["Hello, big-World / hello"]}))
    toks = df.select(tokens(F.col("s"))).first()[0]
    assert toks == ["hello", "big", "world", "hello"]
    tset = df.select(token_set(F.col("s"))).first()[0]
    assert sorted(tset) == ["big", "hello", "world"]


def test_build_sbs_suffixing(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u2"], "text": ["t1", "t2"], "lang": ["en", "de"]})
    )
    pairs = spark.createDataFrame(pd.DataFrame({"url_a": ["u1"], "url_b": ["u2"]}))
    row = build_sbs(pairs, docs, ["text", "lang"]).first()
    assert row["text_source"] == "t1" and row["text_target"] == "t2"
    assert row["lang_source"] == "en" and row["lang_target"] == "de"


def test_lower_ascii_nfkd_udf(spark):
    """NFKD fold parity with the reference lowerascii
    (preprocessing.py:78-99): ligatures + non-latin-1 diacritics that the
    latin-1 translate table cannot fold."""
    import pandas as pd

    from webdedup.normalize import make_lower_ascii_nfkd_udf

    udf = make_lower_ascii_nfkd_udf()
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["ﬁne Œuvre", "Škoda", "Ångström", "café", "#", None]})
    )
    got = [r[0] for r in df.select(udf(F.col("s"))).collect()]
    assert got == ["fine uvre", "skoda", "angstrom", "cafe", None, None]


def test_explain_scores_gating(spark):
    """ES-explain equivalent: per-method score present iff the method
    retrieved the pair (esconnector.py:237-294)."""
    import pandas as pd

    from webdedup.features import explain_scores

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_a": ["a", "c"],
                "url_b": ["b", "d"],
                "methods": [["exact", "minhash"], ["substring"]],
                "minhash_sim": [0.9, 0.2],
                "simhash_sim": [0.8, 0.4],
                "contains": [1.0, 1.0],
            }
        )
    )
    rows = {(r["url_a"], r["url_b"]): r for r in explain_scores(df).collect()}
    r1 = rows[("a", "b")]
    assert r1["exact_score"] == 1.0 and r1["minhash_score"] == 0.9
    assert r1["simhash_score"] is None and r1["substring_score"] is None
    r2 = rows[("c", "d")]
    assert r2["substring_score"] == 1.0 and r2["exact_score"] is None
    assert r2["minhash_score"] is None


def test_packed_sketch_hamming_matches_python_reference(spark):
    """mini_sketch + packed_minhash_hamming against a pure-python replay:
    pack 8-bit reductions of the minhash prefix into longs, then total bit
    hamming — the candidate-join gate must agree with the reference bit for
    bit (it is the only junk filter in the blocking layer)."""
    import numpy as np
    from pyspark.sql import functions as F

    from webdedup.config import DedupConfig
    from webdedup.features import packed_minhash_hamming, packed_minhash_similarity
    from webdedup.signatures import mini_sketch

    cfg = DedupConfig()
    rng = np.random.default_rng(7)
    sig_a = rng.integers(-(2**62), 2**62, size=cfg.num_perm).tolist()
    # b agrees with a on the first 40 positions
    sig_b = sig_a[:40] + rng.integers(-(2**62), 2**62, size=cfg.num_perm - 40).tolist()

    def pack(sig):
        words = []
        for w in range(cfg.mini_perms // 8):
            v = 0
            for j in range(8):
                v |= (sig[8 * w + j] % 256) << (8 * j)
            # python int -> signed 64-bit, as Spark's long arithmetic yields
            words.append(v - (1 << 64) if v >= (1 << 63) else v)
        return words

    pa, pb = pack(sig_a), pack(sig_b)
    expected_ham = sum(bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(pa, pb))
    expected_agree = sum(
        1
        for w in range(cfg.mini_perms // 8)
        for j in range(8)
        if (pa[w] >> (8 * j)) & 255 == (pb[w] >> (8 * j)) & 255
    )

    df = spark.createDataFrame(
        [(sig_a, sig_b)], "ma array<long>, mb array<long>"
    ).select(
        mini_sketch(F.col("ma"), cfg).alias("pa"),
        mini_sketch(F.col("mb"), cfg).alias("pb"),
    )
    row = df.select(
        "pa",
        "pb",
        packed_minhash_hamming(F.col("pa"), F.col("pb"), cfg.mini_perms // 8).alias("ham"),
        packed_minhash_similarity(F.col("pa"), F.col("pb"), cfg.mini_perms).alias("sim"),
    ).first()
    assert list(row["pa"]) == pa
    assert list(row["pb"]) == pb
    assert row["ham"] == expected_ham
    assert abs(row["sim"] - expected_agree / cfg.mini_perms) < 1e-12
    # 40 agreeing positions contribute zero hamming; sim >= 40/120
    assert row["sim"] >= 40 / cfg.mini_perms
