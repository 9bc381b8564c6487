"""Text-analysis ops: language-ID heuristic, rolling fingerprint, quality."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from webdedup.textstats import (
    lang_id,
    quality_features,
    rolling_fingerprint,
    ws_tokens,
)


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")


def test_lang_id_marker_majority(spark):
    df = _df(
        spark,
        [
            "the cat and the dog sat in the yard",       # en
            "der hund und die katze ist nicht da",        # de
            "le chat et les oiseaux est dans une cage",   # fr
            "el perro y los gatos es un animal",          # es
            "xyzzy qwerty plugh",                         # no markers -> und
            "",                                           # empty -> und
        ],
    )
    got = {r["id"]: r["l"] for r in df.select("id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"
    assert got[5] == "und"


def test_lang_id_tie_breaks_by_order(spark):
    # 'es' markers {el, es} vs 'fr' markers {est, le}: one marker each ->
    # tie broken by LANG_ORDER (en, de, es, fr, zh) -> es wins
    df = _df(spark, ["el est"])
    got = df.select(lang_id(F.col("text")).alias("l")).collect()[0]["l"]
    assert got == "es"


def test_rolling_fingerprint_insertion_robust(spark):
    # appending tail text far from the minimal window keeps the fingerprint;
    # a whole-doc hash would change
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _df(spark, [base, base + " lambda mu nu xi omicron"])
    fps = [
        r["fp"]
        for r in df.orderBy("id")
        .select(rolling_fingerprint(F.col("text"), k=5).alias("fp"))
        .collect()
    ]
    # the min window of the longer doc can only be <= the base doc's min
    assert fps[1] <= fps[0]
    # and the base min window is still present in the longer doc
    df2 = _df(spark, [base, "PREFIXWORD " + base])
    fps2 = [
        r["fp"]
        for r in df2.orderBy("id")
        .select(rolling_fingerprint(F.col("text"), k=5).alias("fp"))
        .collect()
    ]
    assert fps2[1] <= fps2[0]


def test_rolling_fingerprint_md5_matches_python(spark):
    text = "one two three four five six seven"
    toks = text.split()
    grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    expect = min(hashlib.md5(g.encode()).hexdigest() for g in grams)
    df = _df(spark, [text])
    got = df.select(
        rolling_fingerprint(F.col("text"), k=5, hash_fn="md5").alias("fp")
    ).collect()[0]["fp"]
    assert got == expect


def test_rolling_fingerprint_short_doc(spark):
    df = _df(spark, ["just three words"])
    got = df.select(
        rolling_fingerprint(F.col("text"), k=5, hash_fn="md5").alias("fp")
    ).collect()[0]["fp"]
    assert got == hashlib.md5(b"just three words").hexdigest()


def test_quality_features(spark):
    df = _df(spark, ["the the cat", ""])
    feats = quality_features(F.col("text"), stopwords=("the",))
    row = (
        df.orderBy("id")
        .select(*[v.alias(k) for k, v in feats.items()])
        .collect()
    )
    r = row[0]
    assert r["n_tokens"] == 3
    assert abs(r["uniq_ratio"] - 2 / 3) < 1e-9
    assert abs(r["stopword_ratio"] - 2 / 3) < 1e-9
    assert r["n_chars"] == 11
    assert abs(r["mean_token_len"] - 3.0) < 1e-9
    empty = row[1]
    assert empty["n_tokens"] == 0
    assert empty["stopword_ratio"] == 0.0


def test_mean_token_len_ignores_extra_whitespace(spark):
    """mean_token_len is the TRUE mean of token lengths — indentation /
    multi-space separators must not count as token mass (the old
    (n_chars - (n-1))/n formula misgraded whitespace-heavy pages)."""
    from webdedup.textstats import quality_features

    df = _df(spark, ["abc \n\t\t  de", "  abc de  "])
    feats = quality_features(F.col("text"), stopwords=("the",))
    rows = (
        df.orderBy("id")
        .select(*[v.alias(k) for k, v in feats.items()])
        .collect()
    )
    for r in rows:
        assert abs(r["mean_token_len"] - 2.5) < 1e-9  # (3 + 2) / 2


def test_lang_id_zh_without_spaces(spark):
    """Real zh text carries no spaces; marker matching must count
    substrings, not whitespace tokens."""
    from webdedup.textstats import lang_id, with_lang_id

    df = _df(spark, ["我有的是时间但是我不知道", "the cat and the dog is here"])
    got = [
        r[0]
        for r in df.orderBy("id").select(lang_id(F.col("text"))).collect()
    ]
    assert got == ["zh", "en"]
    got2 = [
        r["lang_pred"]
        for r in with_lang_id(df).orderBy("id").select("lang_pred").collect()
    ]
    assert got2 == ["zh", "en"]


def test_ws_tokens_empty(spark):
    df = _df(spark, ["", "   ", "a b"])
    got = [r["n"] for r in df.orderBy("id").select(F.size(ws_tokens(F.col("text"))).alias("n")).collect()]
    assert got == [0, 0, 2]


def test_extract_text_roundtrip(spark, corpus):
    """extract_text(html) reproduces the text column byte-identically for
    every page with valid UTF-8 html; the planted invalid-UTF-8 rows (synth
    plants them in html ONLY) decode with U+FFFD instead of failing the
    task under ANSI mode."""
    from pyspark.sql import functions as F

    from webdedup.normalize import extract_text

    pages = corpus["pages"]
    got = pages.select(
        "url", "text", extract_text(F.col("html")).alias("ext")
    )
    bad = got.where(F.col("ext") != F.col("text"))
    n_bad = bad.count()
    # synth plants ~2% invalid-utf8 htmls; everything else must round-trip
    assert n_bad < pages.count() * 0.05
    assert bad.where(~F.col("ext").contains("�")).count() == 0
    # html entities + script stripping
    df = spark.createDataFrame(
        [(b"<html><script>x=1</script><body>a &amp; b</body></html>",)],
        "html binary",
    )
    assert df.select(extract_text(F.col("html"))).first()[0] == "a & b"
    # double-escaped entities decode exactly one level ('&amp;' last)
    df = spark.createDataFrame(
        [(b"<p>a &amp;lt; b &lt; c</p>",)], "html binary"
    )
    assert df.select(extract_text(F.col("html"))).first()[0] == "a &lt; b < c"


def test_gopher_filter_rules(spark):
    from webdedup.textstats import gopher_filter

    # 60 tokens, all bigrams distinct (wi unique), ample stopword evidence
    long_good = " ".join(f"the word{i}" for i in range(30))
    rows = [
        (1, long_good),                     # passes everything
        (2, "the of and to a"),             # too short (5 toks)
        (3, ("the " + "a" * 40 + " of ") * 20),  # mean token len > 10
        (4, ("@@@ ### !!! " * 30) + "the of"),   # alnum ratio < 0.6
        (5, "word " * 60),                  # no stopword hits
        (6, "the of " * 40),                # all bigrams duplicated
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r
        for r in gopher_filter(docs, stopwords=("the", "a", "of", "and", "to")).collect()
    }
    assert got[1].keep and all(
        getattr(got[1], c)
        for c in ("ok_length", "ok_mean_len", "ok_alnum", "ok_stopwords", "ok_repetition")
    )
    assert not got[2].ok_length and not got[2].keep
    assert not got[3].ok_mean_len and not got[3].keep
    assert not got[4].ok_alnum and not got[4].keep
    assert not got[5].ok_stopwords and not got[5].keep
    assert not got[6].ok_repetition and not got[6].keep


def test_bpe_token_count_known_values(spark):
    """Hand-checked counts under BPE_SPLIT_PATTERN (leftmost-first):
    contractions split off, ` ?letters` glues one leading space, interior
    multi-space runs become one whitespace token."""
    from webdedup.textstats import bpe_token_count

    texts = [
        "it's here",      # [it]['s][ here] -> 3
        "a  b",           # [a][ ] [ b]? no: [a][  ]->ws run, then [b]... see below
        "",               # 0
        "42.5%",          # [42][.][5][%] -> 4
    ]
    got = {
        r["id"]: r["n"]
        for r in _df(spark, texts)
        .select("id", bpe_token_count(F.col("text")).alias("n"))
        .collect()
    }
    assert got[0] == 3
    # "a  b": [a], then "  b" -> ` ?\p{L}+` takes " b" only after the ws
    # branch?  leftmost-first at pos 1: ` ?\p{L}+` matches " " + "b"?  No —
    # at pos 1 the char is ' ', ` ?\p{L}+` tries one optional space then
    # needs a letter, sees another space, fails; ws branch takes ONE run
    # greedily (both spaces), leaving bare [b].  So [a][  ][b]... but the
    # second space glues to b via ` ?`: greedy `[ \t\n\r\f]+` consumes both
    # first.  Verified identical in Java and RE2 by the parity test below.
    assert got[1] == 3
    assert got[2] == 0
    assert got[3] == 4


def test_bpe_token_count_duckdb_parity(spark):
    """Spark (java.util.regex) and DuckDB (RE2) must agree token-for-token
    on adversarial inputs: contractions, accents, zh, URLs, whitespace
    runs, quote edge cases."""
    import duckdb

    from webdedup.textstats import bpe_token_count, bpe_token_count_sql

    texts = [
        "it's a test, isn't it?",
        "Hello   world\n\nfoo\tbar",
        "café naïve déjà-vu 123abc 42.5%",
        "的是了在我有 mixed 中文 text",
        "",
        "   ",
        "don't you'll we're I'm o'clock 'quoted'",
        "a'b''c",
        "x2026-08-19T09:00:00Z http://ex.com/a?b=1&c=2",
    ]
    got = {
        r["id"]: r["n"]
        for r in _df(spark, texts)
        .select("id", bpe_token_count(F.col("text")).alias("n"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id int, text varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    for i, n in con.execute(
        f"SELECT id, {bpe_token_count_sql('text')} FROM t ORDER BY id"
    ).fetchall():
        assert got[i] == n, (i, texts[i], got[i], n)
