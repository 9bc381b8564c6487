"""PII scrubbing — redact emails / IPv4 addresses / phone numbers from text.

Standard training-data hygiene (public method: C4 and similar web-corpus
pipelines strip contact-info patterns before training).  The reference has
no text-redaction op; this is one of the beyond-reference training-pipeline
operators the engine adds.

Patterns are deliberately restricted to syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
repetition, `\\b` word boundaries — no backreferences or lookaround, which
RE2 lacks.  Categories are applied IN ORDER on progressively scrubbed text
(emails first), so a digit run inside an email's domain is never
double-counted as an IP or phone; counts are per-category non-overlapping
match counts at that stage.

Plan shape (the 100 TB story): pure Catalyst — three `regexp_replace` +
three `regexp_count` per row inside whole-stage codegen, zero shuffles,
zero Python.  Scrubbing 100 TB is a map-only job that preserves the input
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order on progressively
# scrubbed text.  Patterns are Java+RE2-portable (see module docstring).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
)


def scrub_pii(text: Column) -> dict[str, Column]:
    """Redact PII categories from `text`.

    Returns {"scrubbed": Column, "n_email": .., "n_ipv4": .., "n_phone": ..}
    — counts are taken on the text as scrubbed by the PRECEDING categories
    (see module docstring on ordering)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    out["scrubbed"] = cur
    return out


def pii_oracle_sql(text_expr: str) -> tuple[dict[str, str], str]:
    """DuckDB fragments mirroring scrub_pii: ({name: count_expr}, scrubbed
    expr) over `text_expr`.  Kept next to the patterns so the two engines
    cannot drift."""
    counts: dict[str, str] = {}
    cur = text_expr
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return counts, cur
