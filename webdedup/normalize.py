"""Text normalization — all JVM-side Catalyst expressions (no UDFs).

Semantic map to the reference (nothing ported):
  - NAVALUES canonicalization  <- suricate/preutils/preprocessing.py:208-212
  - lowerascii (NFKD fold + lower) <- preprocessing.py:78-99; here we use
    lower + punctuation strip; accent folding via translate of the latin-1
    range (Spark has no NFKD builtin; the table covers the corpus charset)
  - split on separators, drop empty tokens <- preprocessing.py:116-142
  - concatenate_names <- preprocessing.py:145-170

CRITICAL per-row invariant (BASELINE.json): the input ``text`` column is
NEVER rewritten — every normalization emits a *new* column, so extracted
text stays byte-identical per url end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webdedup.config import NAVALUES

# separators the reference splits on (preprocessing.py:116-142), as one regex
_SEP_REGEX = r"[\s,/#&_.\-()|:;~!?\[\]{}]+"

_ACCENTS_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ACCENTS_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def null_canon(col: Column) -> Column:
    """Map the 16 NA-like string sentinels to NULL (trimmed match)."""
    trimmed = F.trim(col)
    return F.when(trimmed.isin(NAVALUES) | (trimmed == ""), F.lit(None)).otherwise(col)


def lower_ascii(col: Column) -> Column:
    """Lowercase + latin accent fold; NA sentinels -> NULL."""
    c = null_canon(col)
    return F.lower(F.translate(c, _ACCENTS_SRC, _ACCENTS_DST))


def make_lower_ascii_nfkd_udf(lower: bool = True):
    """Exact NFKD fold of the reference's lowerascii
    (suricate/preutils/preprocessing.py:78-99): unicodedata NFKD ->
    ASCII-ignore -> lower, NA sentinels -> None.  Vectorized pandas UDF
    (pd.Series.str.normalize) — covers ligatures and non-latin-1
    diacritics the JVM translate table (lower_ascii) cannot; use this
    variant when the corpus charset goes beyond latin-1."""
    import pandas as pd  # noqa: F401  (pandas ships with pyspark workers)
    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    from webdedup.config import NAVALUES as _NA

    na = set(_NA)

    @_F.pandas_udf(_T.StringType())
    def lower_ascii_nfkd(s):
        out = s.astype("string")
        st = out.str.strip()
        cond = (st.isin(na) | (st == "")).fillna(False)
        out = out.mask(cond)
        out = (
            out.str.normalize("NFKD")
            .str.encode("ascii", errors="ignore")
            .str.decode("ascii")
        )
        return (out.str.lower() if lower else out).astype(object)

    return lower_ascii_nfkd


def tokens(col: Column) -> Column:
    """Normalized token array: lower_ascii -> split on separators -> drop empties."""
    toks = F.split(F.trim(lower_ascii(col)), _SEP_REGEX)
    return F.filter(toks, lambda t: (t != "") & t.isNotNull())


def token_set(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def concat_fields(*cols: Column) -> Column:
    """Null-filtered space-join of several columns (concatenate_names)."""
    arr = F.filter(F.array(*[null_canon(c) for c in cols]), lambda x: x.isNotNull())
    return F.array_join(arr, " ")


def id_to_str(col: Column, zfill: int | None = None) -> Column:
    """Id normalization (idtostr, preprocessing.py:6-75): cast to string,
    strip a trailing '.0' (float-typed ids), remove separator chars
    ['-','.',' ','/','#'], strip leading zeros, null the NA sentinels,
    optional zero-pad."""
    s = null_canon(col.cast("string"))
    s = F.regexp_replace(s, r"\.0$", "")
    s = F.translate(s, "-. /#", "")
    s = F.regexp_replace(s, r"^0+(?=.)", "")
    s = null_canon(s)
    if zfill:
        s = F.lpad(s, zfill, "0")
    return s


def remove_stopwords(toks: Column, stopwords: list[str]) -> Column:
    """Drop stop words from a token array (rmvstopwords,
    preprocessing.py:173-205)."""
    if not stopwords:
        return toks
    return F.filter(toks, lambda t: ~t.isin(*stopwords))


def strip_suffix(col: Column, suffixes: list[str]) -> Column:
    """Strip any of the given suffix strings (rmv_end_str/rmv_end_list,
    preprocessing.py:102-113,215-224)."""
    out = col
    for sfx in suffixes:
        import re as _re

        out = F.regexp_replace(out, _re.escape(sfx) + r"$", "")
    return F.trim(out)


def canonical_url(col: Column) -> Column:
    """Canonicalize a URL for url-level dedup (the WET/CDX-style pre-dedup
    a Common-Crawl pipeline runs before any content hashing): strip the
    fragment, the scheme, a leading 'www.', lowercase the authority (host
    is case-insensitive per RFC 3986; the path is NOT), and drop trailing
    slashes.  Pure Catalyst regexp/translate chain — codegen, no UDF.

    Deliberately conservative: query strings are KEPT (reordering/dropping
    params changes page identity on many sites); ports are kept.  Two pages
    sharing a canonical url are candidate duplicates regardless of content
    (candidates.url_candidates)."""
    u = F.regexp_replace(col, r"#.*$", "")
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    u = F.regexp_replace(u, r"(?i)^www\.", "")
    # authority ends at the first '/' OR '?': substring_index alone would
    # treat a path-less url's query string as part of the host and
    # lowercase it (query params are case-significant page identity).
    host = F.regexp_extract(u, r"^[^/?]*", 0)
    u = F.concat(F.lower(host), u.substr(F.length(host) + 1, F.length(u)))
    return F.regexp_replace(u, r"/+$", "")


def extract_text(html: Column) -> Column:
    """Extract visible text from an html binary column — the ingest face of
    the pipeline's per-row invariant (north rule: byte-identical extracted
    text per url; metrics.text_invariant_violations pins it end-to-end).

    Pure Catalyst, codegen-friendly: try_cast decodes UTF-8 with U+FFFD for
    invalid bytes (ANSI `decode` would fail the task on one bad WARC byte
    — at web scale malformed bytes are data, not errors), script/style
    blocks and tags become single spaces (block boundaries must separate
    words), minimal entities decode, whitespace runs collapse, trim.  A
    single-spaced source text round-trips byte-identically
    (tests/test_textstats.py::test_extract_text_roundtrip)."""
    s = html.try_cast("string")
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    # '&amp;' decodes LAST: decoding it first would double-decode
    # double-escaped entities ('&amp;lt;' must yield the literal '&lt;',
    # not '<').
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))
