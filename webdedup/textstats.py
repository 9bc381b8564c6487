"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, fingerprinting.

All pure Catalyst expressions (JVM-side, whole-stage-codegen friendly, and
DuckDB-oracle-expressible).  The reference has no language-ID/quality layer
(it scores *pairs*, not documents) — these are the doc-level ops a 100 TB
web-text corpus needs before dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker-word profiles for the cheap n-gram/stopword language heuristic.
# Pinned tiny lists so the SQL oracle can embed them verbatim.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "los", "que", "es", "y", "un", "una", "por"),
    "fr": ("le", "les", "et", "est", "une", "dans", "pour", "qui"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}
# deterministic preference order for score ties
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def marker_score(toks: Column, lang: str) -> Column:
    """Count of tokens that are marker words for `lang`."""
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def zh_marker_score(text: Column) -> Column:
    """Marker occurrences for zh, counted as SUBSTRINGS of the raw text:
    Chinese is written without spaces, so whitespace tokens never equal a
    single-character marker and the token path would leave zh unreachable
    (real zh text labeled 'und').  Each marker is one character, so its
    count is the length drop after deleting it."""
    total: Column = F.lit(0)
    for m in LANG_MARKERS["zh"]:
        total = total + (
            F.length(text) - F.length(F.replace(text, F.lit(m), F.lit("")))
        )
    return total


def lang_id(text: Column) -> Column:
    """Argmax marker-word language with deterministic tie-break by
    LANG_ORDER; all-zero scores -> 'und' (undetermined, BCP-47 style).

    NOTE: as a single Column expression every marker score inlines
    ``ws_tokens`` and is referenced twice (greatest + when), so the text is
    re-split ~10x per row in CodegenFallback exprs.  Prefer
    :func:`with_lang_id` on DataFrames — it stages the token array and the
    per-language counts as materialized projections (CollapseProject keeps
    non-cheap exprs referenced >1x un-inlined; verified on the physical
    plan), cutting the sf0.1 scan from 28.5s to a few seconds."""
    toks = ws_tokens(text)
    scores = {
        lang: (
            zh_marker_score(text)
            if lang == "zh"
            else marker_score(toks, lang)
        )
        for lang in LANG_ORDER
    }
    return _argmax_lang({lang: scores[lang] for lang in LANG_ORDER})


def _argmax_lang(scores: dict[str, Column]) -> Column:
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (scores[lang] == best), lang).otherwise(expr)
    return expr


def with_lang_id(df, text_col: str = "text", out_col: str = "lang_pred"):
    """lang_id as a staged DataFrame transform: tokenize once, count each
    language's markers once, then argmax over plain column refs.  Same
    semantics (and oracle SQL) as :func:`lang_id`; one text split per row
    instead of ~10."""
    toks_c = "__li_toks"
    score_cols = {lang: f"__li_{lang}" for lang in LANG_ORDER}
    staged = df.withColumn(toks_c, ws_tokens(F.col(text_col)))
    staged = staged.select(
        "*",
        *[
            (
                zh_marker_score(F.col(text_col))
                if lang == "zh"
                else marker_score(F.col(toks_c), lang)
            ).alias(score_cols[lang])
            for lang in LANG_ORDER
        ],
    )
    out = staged.withColumn(
        out_col, _argmax_lang({l: F.col(c) for l, c in score_cols.items()})
    )
    return out.drop(toks_c, *score_cols.values())


def lang_id_sql(text_expr: str = "text") -> str:
    """The DuckDB-equivalent expression of lang_id (same scores, same
    tie-break) for oracle parity."""
    score = {
        lang: (
            f"len(list_filter(regexp_split_to_array(trim({text_expr}), '\\s+'), "
            f"x -> x IN ({', '.join(repr(w) for w in LANG_MARKERS[lang])})))"
        )
        for lang in LANG_ORDER
        if lang != "zh"
    }
    # zh: substring occurrences (space-free script — see zh_marker_score)
    score["zh"] = "(" + " + ".join(
        f"(length({text_expr}) - length(replace({text_expr}, '{m}', '')))"
        for m in LANG_MARKERS["zh"]
    ) + ")"
    best = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    whens = " ".join(
        f"WHEN {best} > 0 AND {score[lang]} = {best} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"CASE {whens} ELSE 'und' END"


# GPT-2-style pre-tokenizer split (the public regex from the GPT-2 release,
# reused by BPE tokenizers since), restricted to the subset java.util.regex
# (Spark) and RE2 (DuckDB) implement IDENTICALLY so the oracle can run the
# same pattern:
#  - the original's `\s+(?!\S)` branch is dropped (RE2 has no lookahead);
#    interior whitespace runs therefore split differently from tiktoken's
#    gpt2 encoding, but the operator defines its own deterministic count —
#    the parity target is Spark == oracle, not == any one tokenizer.
#  - `\s` is spelled as an explicit class: Java's \s includes \x0B,
#    RE2's does not.
# Both engines use leftmost-FIRST alternation (Java NFA; RE2 with
# longest_match off, DuckDB's default), so branch order — contractions
# before the letter branch — behaves the same.
BPE_SPLIT_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+"
    "|[ \\t\\n\\r\\f]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer pieces under
    BPE_SPLIT_PATTERN.  A cheap, vocabulary-free proxy for LLM token cost
    (real BPE merges only ever split WITHIN these pieces, so this counts
    merge units, the stable denominator for mixture weighting).  Pure
    Catalyst — one regexp_extract_all per row, codegen-native."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def bpe_token_count_sql(text_expr: str = "text") -> str:
    """The DuckDB replay of bpe_token_count — same pattern, RE2 side."""
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({text_expr}, '{pat}'))"


def rolling_fingerprint_from_tokens(
    toks: Column, k: int = 5, hash_fn: str = "xxhash64"
) -> Column:
    """Document fingerprint: minimum hash over the rolling k-token windows
    (a 1-permutation MinHash over word k-grams — robust to insertions far
    from the matching region, unlike a whole-doc hash).  Docs shorter than
    k tokens fall back to the whole token string.

    ``toks`` must be a bound attribute (gram_array's contract: inline
    expressions re-evaluate per window inside the transform lambda).

    hash_fn: 'xxhash64' (JVM-native, production) or 'md5' (portable across
    engines — the oracle-parity variant; min is lexicographic on hex)."""
    h = F.xxhash64 if hash_fn == "xxhash64" else (lambda c: F.md5(c.cast("binary")))
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: h(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array(h(F.concat_ws(" ", toks))))
    return F.array_min(grams)


def rolling_fingerprint(text: Column, k: int = 5, hash_fn: str = "xxhash64") -> Column:
    """rolling_fingerprint_from_tokens straight from a text column —
    tokenizes INSIDE the window lambda (re-split per window position);
    fine for tests/small inputs, production paths stage the token array
    first (see q_rolling_fingerprint)."""
    return rolling_fingerprint_from_tokens(ws_tokens(text), k, hash_fn)


def with_quality_features(
    df, stopwords: tuple[str, ...], text_col: str = "text"
):
    """Staged quality scoring: tokenize once into a materialized column,
    then derive every stat from plain refs (see with_lang_id for why).
    Adds n_chars, n_tokens, uniq_ratio, stopword_ratio, mean_token_len,
    alnum_ratio."""
    toks_c = "__qf_toks"
    staged = df.withColumn(toks_c, ws_tokens(F.col(text_col)))
    toks = F.col(toks_c)
    n_tok = F.size(toks)
    staged = staged.select(
        "*",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("__qf_uniq"),
        F.size(F.filter(toks, lambda t: t.isin(*stopwords))).alias("__qf_stop"),
        F.length(F.regexp_replace(text_col, r"[^\p{L}\p{N}]", "")).alias(
            "__qf_alnum"
        ),
        # true mean token length = sum of token chars / n — NOT
        # (n_chars - (n-1))/n, which counts every whitespace char beyond
        # one separator (and leading/trailing runs) as token mass and
        # misgrades indentation-heavy pages
        F.length(F.array_join(toks, "")).alias("__qf_tlen"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    out = staged.select(
        "*",
        (F.col("__qf_uniq") / denom).alias("uniq_ratio"),
        (F.col("__qf_stop") / denom).alias("stopword_ratio"),
        (F.col("__qf_tlen") / denom).alias("mean_token_len"),
        (F.col("__qf_alnum") / F.greatest(F.col("n_chars"), F.lit(1))).alias(
            "alnum_ratio"
        ),
    )
    return out.drop(toks_c, "__qf_uniq", "__qf_stop", "__qf_alnum", "__qf_tlen")


def gram_array(toks: Column, n: int) -> Column:
    """Overlapping n-token grams as strings; fewer than n tokens -> [].

    ``toks`` must be a BOUND ATTRIBUTE (a materialized column), not an
    inline tokenizer expression: higher-order-function lambdas re-evaluate
    captured expressions per element (see shingle_hashes' trap note), so an
    inline split would re-tokenize once per gram position — O(n^2)/doc
    (measured 4x wall on the bigram queries before staging).

    n == 2 uses zip_with over the array and its shift — no per-element
    slice call (measured ~2.5x faster than transform+slice for bigrams;
    for n >= ~9 the chained zip_with's n-1 intermediate arrays cost more
    than the slices, so larger n keeps the transform form)."""
    if n == 2:
        m = F.greatest(F.size(toks) - 1, F.lit(0))
        z = F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        return F.when(F.size(toks) >= 2, z).otherwise(
            F.array().cast("array<string>")
        )
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document repetition metrics — the Gopher-style quality filters
    ("fraction of n-gram occurrences in duplicated n-grams" and "share of
    the most frequent n-gram"; Rae et al. 2021, public) that a training-data
    pipeline runs before dedup to drop degenerate/boilerplate pages.

    Returns (id_col, n_grams, dup_gram_frac, top_gram_share); docs with
    fewer than n tokens get (0, 0.0, 0.0).

    Plan shape (the 100 TB story): one explode + two aggregations, both
    keyed by doc (then (doc, gram)) — partial aggregation combines map-side
    and the keys are per-document, so corpus-wide hot grams can NOT skew a
    reducer (contrast corpus-level line dedup in linededup.py, which keys by
    unit and handles skew there).  Cost is linear in total token count; no
    per-doc quadratic HOF (an `array_max(transform(distinct, g ->
    size(filter(grams, = g))))` formulation would be O(grams^2) per row and
    die on long pages)."""
    # stage the token array before the gram HOF: an inline ws_tokens would
    # be re-evaluated per gram position inside the lambda (gram_array's
    # bound-attribute contract)
    grams = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.explode(gram_array(F.col("__toks"), n)).alias("g"))
    per_gram = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    stats = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("_mx"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("_dup"),
    )
    scored = stats.select(
        id_col,
        "n_grams",
        F.round(F.col("_dup") / F.col("n_grams"), 6).alias("dup_gram_frac"),
        F.round(F.col("_mx") / F.col("n_grams"), 6).alias("top_gram_share"),
    )
    # docs with < n tokens emit no gram rows — restore them with zeros so
    # the operator is total over the corpus.  scored is corpus-sized (one
    # row per doc) and agg-derived: pin shuffle_hash so a low static
    # estimate can never broadcast it (same posture as
    # candidates.exact_candidates' keeper join); the join reuses the
    # aggregation's doc-keyed exchange.
    return (
        df.select(id_col)
        .join(scored.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("dup_gram_frac", F.lit(0.0)).alias("dup_gram_frac"),
            F.coalesce("top_gram_share", F.lit(0.0)).alias("top_gram_share"),
        )
    )


def quality_features(text: Column, stopwords: tuple[str, ...]) -> dict[str, Column]:
    """Doc-quality signals: length, token stats, stopword/unique ratios,
    mean token length, non-alnum character ratio."""
    toks = ws_tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alnum_chars = F.length(F.regexp_replace(text, r"[^\p{L}\p{N}]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "uniq_ratio": F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)),
        "stopword_ratio": F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
        / F.greatest(n_tok, F.lit(1)),
        # sum of token chars / n (array_join's arg evaluates once; the
        # subtraction form would count extra whitespace as token mass)
        "mean_token_len": F.length(F.array_join(toks, ""))
        / F.greatest(n_tok, F.lit(1)),
        "alnum_ratio": alnum_chars / F.greatest(n_chars, F.lit(1)),
    }


def gopher_filter(
    df,
    stopwords: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    min_alnum_ratio: float = 0.6,
    min_stopword_hits: int = 2,
    max_dup_gram_frac: float = 0.5,
    dup_n: int = 2,
):
    """Composite document-quality gate — the Gopher-style rule battery
    (Rae et al. 2021, public) a training pipeline runs before dedup:
    token-count bounds, mean-token-length bounds, alphanumeric-character
    ratio, minimum stop-word evidence, and a duplicated-n-gram ceiling.

    Returns (id_col, n_tokens, ok_length, ok_mean_len, ok_alnum,
    ok_stopwords, ok_repetition, keep) for EVERY doc; keep = all rules
    pass.  Per-rule booleans are kept so a pipeline can report WHY a page
    was dropped (filters are audited, not silent).

    Plan shape (the 100 TB story): the five scalar rules are one map-only
    pass (tokenize once, whole-stage codegen); the repetition rule joins
    repetition_stats' doc-keyed aggregate back on the doc id — per-doc
    keys, skew-free, one shuffle.  The gate composes with scrub/dedup as a
    plain filter on `keep`."""
    toks_c = "__gf_toks"
    staged = df.withColumn(toks_c, ws_tokens(F.col(text_col)))
    toks = F.col(toks_c)
    scalars = staged.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("__nc"),
        F.size(F.filter(toks, lambda t: t.isin(*stopwords))).alias("__stop"),
        F.length(F.regexp_replace(text_col, r"[^\p{L}\p{N}]", "")).alias(
            "__alnum"
        ),
        F.length(F.array_join(toks, "")).alias("__tlen"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    # true mean token length (see with_quality_features)
    mean_len = F.col("__tlen") / denom
    alnum_ratio = F.col("__alnum") / F.greatest(F.col("__nc"), F.lit(1))
    rules = scalars.select(
        id_col,
        "n_tokens",
        ((F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)).alias(
            "ok_length"
        ),
        (
            (mean_len >= min_mean_token_len) & (mean_len <= max_mean_token_len)
        ).alias("ok_mean_len"),
        (alnum_ratio >= min_alnum_ratio).alias("ok_alnum"),
        (F.col("__stop") >= min_stopword_hits).alias("ok_stopwords"),
    )
    rep = repetition_stats(df, n=dup_n, id_col=id_col, text_col=text_col).select(
        id_col, (F.col("dup_gram_frac") <= max_dup_gram_frac).alias("ok_repetition")
    )
    # rep is a corpus-sized agg output (one row per doc): pin shuffle_hash
    # (same posture as repetition_stats' own rejoin)
    out = rules.join(rep.hint("shuffle_hash"), id_col, "left")
    keep = (
        F.col("ok_length")
        & F.col("ok_mean_len")
        & F.col("ok_alnum")
        & F.col("ok_stopwords")
        & F.col("ok_repetition")
    )
    return out.select(
        id_col,
        "n_tokens",
        "ok_length",
        "ok_mean_len",
        "ok_alnum",
        "ok_stopwords",
        F.coalesce("ok_repetition", F.lit(True)).alias("ok_repetition"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
