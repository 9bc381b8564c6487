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
