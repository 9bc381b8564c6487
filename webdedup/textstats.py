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


def lang_id(text: Column) -> Column:
    """Argmax marker-word language with deterministic tie-break by
    LANG_ORDER; all-zero scores -> 'und' (undetermined, BCP-47 style)."""
    toks = ws_tokens(text)
    scores = {lang: marker_score(toks, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (scores[lang] == best), lang).otherwise(expr)
    return expr


def lang_id_sql(text_expr: str = "text") -> str:
    """The DuckDB-equivalent expression of lang_id (same scores, same
    tie-break) for oracle parity."""
    score = {
        lang: (
            f"len(list_filter(regexp_split_to_array(trim({text_expr}), '\\s+'), "
            f"x -> x IN ({', '.join(repr(w) for w in LANG_MARKERS[lang])})))"
        )
        for lang in LANG_ORDER
    }
    best = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    whens = " ".join(
        f"WHEN {best} > 0 AND {score[lang]} = {best} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"CASE {whens} ELSE 'und' END"


def rolling_fingerprint(text: Column, k: int = 5, hash_fn: str = "xxhash64") -> Column:
    """Document fingerprint: minimum hash over the rolling k-token windows
    (a 1-permutation MinHash over word k-grams — robust to insertions far
    from the matching region, unlike a whole-doc hash).  Docs shorter than
    k tokens fall back to the whole token string.

    hash_fn: 'xxhash64' (JVM-native, production) or 'md5' (portable across
    engines — the oracle-parity variant; min is lexicographic on hex)."""
    h = F.xxhash64 if hash_fn == "xxhash64" else (lambda c: F.md5(c.cast("binary")))
    toks = ws_tokens(text)
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: h(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array(h(F.concat_ws(" ", toks))))
    return F.array_min(grams)


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
        "mean_token_len": (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1)),
        "alnum_ratio": alnum_chars / F.greatest(n_chars, F.lit(1)),
    }
