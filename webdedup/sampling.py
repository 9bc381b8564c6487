"""Deterministic sampling + source mixing for training-corpus assembly.

Beyond-reference training-pipeline operators (SURVEY §2.12): assembling a
training corpus from heterogeneous sources (web crawl, wiki, code, ...)
means resampling each source toward target token proportions — the
data-mixture step of the published GPT-3 / Gopher / Llama recipes.

The sampling decision must be a pure function of the ROW, never rand():
at 100 TB, task retries, speculative execution and AQE re-plans re-evaluate
rows, so rand()-based sampling double-includes or drops rows
non-reproducibly (and makes every resume non-deterministic).  Every sampler
here derives its uniform from a hash of a caller-chosen key — xxhash64
(JVM-native) for production, an md5-derived variant that DuckDB replays
bit-for-bit for oracle parity — so the same row always makes the same
decision, on any executor, any number of times.

Plan shape: mix_sources is one groupBy(source) token agg (tiny output — one
row per source), a single-partition window min over that per-source table
to find the binding source (sources number in the tens by definition), and
a broadcast of the per-source rates back onto the corpus scan.  The corpus
itself is touched map-only: no shuffle, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_uniform(key: Column, portable: bool = False) -> Column:
    """Deterministic pseudo-uniform integer in [0, _DENOM) from a key.

    portable=False: pmod(xxhash64(key), denom) — JVM codegen, production.
    portable=True: first 8 hex chars of md5(key-as-string), mod denom —
    replayable in DuckDB as ('0x' || substr(md5(k),1,8))::UBIGINT % denom
    (same UTF-8 bytes both engines; see the mix_corpus oracle)."""
    if portable:
        h = F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
        return h.cast("bigint") % _DENOM
    return F.pmod(F.xxhash64(key), F.lit(_DENOM))


def sample_by_hash(
    df: DataFrame, key_col: str, rate: float, portable: bool = False
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < floor(rate * denom) — a stable,
    repartition/retry-proof Bernoulli(rate) sample keyed on ``key_col``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(rate * _DENOM)
    return df.where(hash_uniform(F.col(key_col), portable) < F.lit(thresh))


def mix_sources(
    docs: DataFrame,
    weight: Column,
    token_count: Column,
    source_col: str = "source",
    key_col: str = "doc_id",
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Resample each source so expected output token mass is proportional to
    ``weight``, keeping 100% of the binding (scarcest-relative) source and
    downsampling the rest — the maximal mixture under keep<=all.

    weight / token_count are Columns evaluated per row (weight must be
    constant within a source).  With tok_s = sum of token_count over source
    s and c = min_s(tok_s / w_s), the per-source keep rate is
    r_s = c * w_s / tok_s (<= 1, == 1 at the argmin), so output tokens are
    ~ c * w_s: proportional to the weights.  Rows are kept by the
    deterministic hash sampler on ``key_col``.

    Returns (sampled docs, per-source rates DataFrame) — the rates table is
    the run's audit record (source, tok_total, weight, rate), the same
    returned-metrics convention as the skew caps."""
    tot = (
        docs.select(
            F.col(source_col),
            weight.alias("__w"),
            token_count.alias("__nt"),
        )
        .groupBy(source_col)
        .agg(
            F.sum("__nt").alias("tok_total"),
            F.min("__w").alias("weight"),  # constant per source; min is order-proof
        )
    )
    # the binding constant c is ONE row: a plain aggregate broadcast back
    # over the per-source table (the linededup.py corpus-constant shape) —
    # a Window.partitionBy(lit(1)) computes the same thing but Catalyst
    # folds the constant partition spec away and WindowExec warns 'No
    # Partition Defined' on every run, drowning bench logs
    c = tot.agg(F.min(F.col("tok_total") / F.col("weight")).alias("__c"))
    rates = (
        tot.crossJoin(F.broadcast(c))
        .withColumn("rate", F.col("__c") * F.col("weight") / F.col("tok_total"))
        .select(source_col, "tok_total", "weight", "rate")
    )

    keyed = docs.join(F.broadcast(rates.select(source_col, "rate")), source_col)
    sampled = keyed.where(
        hash_uniform(F.col(key_col), portable)
        < F.floor(F.col("rate") * _DENOM).cast("bigint")
    ).drop("rate")
    return sampled, rates
