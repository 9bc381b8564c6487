"""Bloom-filter membership summaries + incremental snapshot dedup.

Reference parity: suricate's incremental shape is index-once / probe-many —
the TARGET frame is indexed into Elasticsearch and each SOURCE record
queries it (suricate/dbconnectors/esconnector.py, EsConnector.fit /
transform).  Here the "index" over the existing corpus is a Bloom summary
of its dedup keys: built in one corpus scan, then probed map-side by every
new-snapshot row.  Bloom filters have NO false negatives, so a key that
probes false is definitively absent and never touches the corpus again;
keys that probe true (true members + false positives at rate
(1 - e^{-kn/m})^k) are confirmed with an exact join whose input is only the
survivors.  Semantics are therefore exactly those of the plain membership
join — the filter only prunes — which is why the DuckDB oracle for the
driver query is a plain IN-subquery.

Why this is the 100 TB shape: deduplicating a new snapshot (10^7-10^9 docs)
against the full corpus with a join shuffles a row for EVERY corpus key —
the cost is dominated by the corpus even when the new batch is tiny, and it
is paid again for every snapshot.  The Bloom summary pays the corpus scan
once; afterwards only bits travel.

Two layouts, same bit semantics (build_bloom / build_sharded_bloom):

  - broadcast bitmap (shards=1): one m-bit filter, per-partition partial
    bitmaps OR-reduced (a spark-side applyInPandas OR level bounds the
    driver collect at `reduce_width` rows), broadcast to executors, probed
    inside a pandas UDF.  Fits corpora up to ~10^9 keys (m = n*k/ln2 bits
    at the optimal k; 10^9 keys @ 1% fp ≈ 1.2 GB — the practical broadcast
    ceiling).
  - sharded bitmap (shards=S): keys are range-split by pmod(key64, S); one
    independent filter per shard, held as a (shard, bits) DataFrame that
    never lands on the driver.  Probing cogroups the new batch with the
    bitmap table on shard (groupby().cogroup().applyInPandas), so each task
    gets (its shard's rows, its shard's single bitmap row) — the only
    shuffle is the NEW batch's 8-byte keys; the corpus never reshuffles and
    no executor ever holds more than m/S bits.  At 10^12 keys @ 1% fp,
    S = 4096 shards of ~300 MB each.

Hashing: splitmix64 (signatures._mix64) + Kirsch-Mitzenmacher double
hashing — k positions pos_i = (h1 + i*h2) mod m from two mixes, h2 forced
odd so the stride covers the power-of-two ring (Kirsch & Mitzenmacher 2006:
two hashes lose nothing asymptotically).  m is a power of two: position =
mask, no division.  All numpy over Arrow batches; zero per-row python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from webdedup.signatures import _mix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_ONE = np.uint64(1)


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for int64/uint64 keys.  Double hashing:
    pos_i = (h1 + i*h2) & (m-1), h2 odd (full period on the 2^b ring)."""
    v = keys.view(np.uint64) if keys.dtype == np.int64 else keys.astype(np.uint64)
    h1 = _mix64(v)
    h2 = _mix64(v ^ _GOLDEN) | _ONE
    mask = np.uint64(m_bits - 1)
    out = np.empty((k, v.shape[0]), dtype=np.uint64)
    for i in range(k):
        out[i] = (h1 + np.uint64(i) * h2) & mask
    return out


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    """OR the (k, n) positions into the word array (duplicate-safe)."""
    np.bitwise_or.at(bits, (pos >> np.uint64(6)).ravel(),
                     _ONE << (pos & np.uint64(63)).ravel())


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Membership vector for (k, n) positions: all k bits set."""
    ok = np.ones(pos.shape[1], dtype=bool)
    for i in range(pos.shape[0]):
        p = pos[i]
        ok &= ((bits[p >> np.uint64(6)] >> (p & np.uint64(63))) & _ONE) == _ONE
    return ok


def _key_array(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(non-null int64 values, not-null mask) from an Arrow int64 series.

    Arrow->pandas turns an int64 batch CONTAINING A NULL into float64, which
    silently rounds full-range 64-bit keys (53-bit mantissa) — corrupted
    positions would probe false and MISS true members.  Callers must
    therefore keep nulls out of mixed batches (probe_bloom coalesces to 0
    and masks afterwards; build filters isNotNull); if a lossy batch still
    arrives here, fail loudly rather than lose recall."""
    mask = s.notna().to_numpy()
    if s.dtype.kind == "f" and mask.any():
        raise ValueError(
            "int64 key column arrived as float64 (nulls in the Arrow batch) "
            "— 64-bit keys would be silently rounded; filter or fill nulls "
            "column-side before the probe"
        )
    vals = s[mask].astype(np.int64).to_numpy()
    return vals, mask


@dataclass(frozen=True)
class BloomFilter:
    """An immutable m-bit filter (uint64 word array) with its parameters."""

    bits: np.ndarray
    m_bits: int
    k: int

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return _test_bits(self.bits, _positions(keys, self.m_bits, self.k))

    def fill_ratio(self) -> float:
        """Fraction of set bits; the false-positive rate is fill^k."""
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())


def _check_params(m_bits: int, k: int) -> None:
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 22, k: int = 6,
    reduce_width: int = 32,
) -> BloomFilter:
    """One m-bit filter over the non-null int64 keys of ``df[key_col]``.

    Plan: mapInPandas builds one partial bitmap per input partition (the
    corpus scan — the only pass over the data); an applyInPandas OR level
    folds them into <= reduce_width rows so the driver collect is bounded
    regardless of input partition count; the driver ORs the survivors.
    Bitmap OR is commutative, so the result is bit-identical under any
    partitioning (tested)."""
    _check_params(m_bits, k)
    n_words = m_bits >> 6

    def _partials(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            vals, _ = _key_array(pdf[key_col])
            if vals.shape[0]:
                seen = True
                _set_bits(bits, _positions(vals, m_bits, k))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    def _or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_words, dtype=np.uint64)
        for raw in pdf["bits"]:
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    partials = (
        df.select(key_col).where(F.col(key_col).isNotNull())
        .mapInPandas(_partials, "bits binary")
        .withColumn("g", F.monotonically_increasing_id() % reduce_width)
    )
    grouped = partials.groupBy("g").applyInPandas(_or_group, "bits binary")

    final = np.zeros(n_words, dtype=np.uint64)
    for row in grouped.collect():  # bounded: <= reduce_width rows
        final |= np.frombuffer(row["bits"], dtype=np.uint64)
    final.flags.writeable = False
    return BloomFilter(final, m_bits, k)


def probe_bloom(
    df: DataFrame, key_col: str, bloom: BloomFilter, out_col: str = "maybe_member"
) -> DataFrame:
    """Map-side membership probe: ``out_col`` true iff all k bits are set
    (null keys probe false).  The bitmap ships once per executor via a
    SparkContext broadcast, not per task.

    Null keys are coalesced to 0 BEFORE the UDF and masked back to false
    after: a single null in an Arrow batch downgrades the whole int64 batch
    to float64, silently rounding 64-bit keys into false negatives (see
    _key_array)."""
    bc = df.sparkSession.sparkContext.broadcast(bloom.bits.tobytes())
    m_bits, k = bloom.m_bits, bloom.k

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        vals, mask = _key_array(s)
        out = np.zeros(s.shape[0], dtype=bool)
        if vals.shape[0]:
            out[mask] = _test_bits(bits, _positions(vals, m_bits, k))
        return pd.Series(out)

    key = F.col(key_col)
    return df.withColumn(
        out_col,
        F.when(key.isNull(), F.lit(False)).otherwise(
            _probe(F.coalesce(key, F.lit(0)))
        ),
    )


# --------------------------------------------------------------------------
# Sharded layout: the 10^12-key path (no single bitmap fits anywhere)
# --------------------------------------------------------------------------

def build_sharded_bloom(
    df: DataFrame, key_col: str, shards: int, m_bits_per_shard: int = 1 << 22,
    k: int = 6,
) -> DataFrame:
    """(shard int, bits binary) DataFrame: one independent filter per
    pmod(key, shards) slice.  Built with a single corpus scan + one shuffle
    of 8-byte keys into shards; the bitmaps stay distributed (checkpoint
    them like any stage table to reuse across snapshots).  Total bits =
    shards * m_bits_per_shard; size each shard for the corpus keyspace:
    m_per_shard ~ (n/shards) * k / ln2 for ~50% fill."""
    _check_params(m_bits_per_shard, k)
    n_words = m_bits_per_shard >> 6

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_words, dtype=np.uint64)
        vals, _ = _key_array(pdf[key_col])
        if vals.shape[0]:
            _set_bits(bits, _positions(vals, m_bits_per_shard, k))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "bits": [bits.tobytes()]})

    return (
        df.select(key_col).where(F.col(key_col).isNotNull())
        .withColumn("shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int"))
        .groupBy("shard").applyInPandas(_build, "shard int, bits binary")
    )


def probe_sharded_bloom(
    df: DataFrame, key_col: str, bloom_df: DataFrame, m_bits_per_shard: int,
    k: int, shards: int, out_col: str = "maybe_member",
) -> DataFrame:
    """Probe a sharded filter by cogrouping the batch with the bitmap table
    on shard: each task receives (the shard's probe rows, the shard's one
    bitmap row) — the only shuffled payload is the probe batch's keys plus
    one bitmap per shard, never the corpus.  Rows in a shard with no bitmap
    row (corpus slice was empty) probe false."""
    _check_params(m_bits_per_shard, k)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` boolean"]
    )

    def _probe(rows: pd.DataFrame, bitmaps: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(rows.shape[0], dtype=bool)
        if bitmaps.shape[0]:
            bits = np.frombuffer(bitmaps["bits"].iloc[0], dtype=np.uint64)
            vals, mask = _key_array(rows[key_col])
            if vals.shape[0]:
                out[mask] = _test_bits(bits, _positions(vals, m_bits_per_shard, k))
        res = rows.drop(columns=["__shard"])
        res[out_col] = out
        return res

    keyed = df.withColumn(
        "__shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int")
    )
    return (
        keyed.groupby("__shard")
        .cogroup(bloom_df.groupby("shard"))
        .applyInPandas(_probe, out_schema)
    )


# --------------------------------------------------------------------------
# Incremental snapshot dedup (bloom prune -> exact confirm)
# --------------------------------------------------------------------------

def incremental_dedup(
    new_df: DataFrame, corpus_df: DataFrame, key_col: str,
    out_col: str = "is_dup", m_bits: int = 1 << 22, k: int = 6,
    shards: int = 1, broadcast_survivors: bool = True,
) -> DataFrame:
    """Flag each new-snapshot row whose ``key_col`` already exists in the
    corpus — EXACT membership-join semantics, bloom used only to prune.

    Keys may be any equatable type; the filter hashes xxhash64(key) and the
    confirm join runs on the key itself, so a 64-bit hash collision can only
    cost a wasted confirm probe, never a wrong answer.  Plan: (1) summarize
    corpus keys into a bloom (one corpus scan); (2) probe the new batch
    map-side — bloom-negative rows are definitively not dups and are done;
    (3) confirm the survivors (true dups + fp-rate of the batch) with a
    semi-join against the corpus where the SURVIVOR side is broadcast, so
    the corpus is scanned but never shuffled in either phase.  For a
    mostly-duplicate batch whose survivor set is too big to broadcast, pass
    broadcast_survivors=False to pin a shuffle_hash confirm join instead.
    shards > 1 switches to the sharded layout (see build_sharded_bloom) —
    required once corpus keys exceed the ~10^9 broadcast-bitmap ceiling.
    """
    key = F.col(key_col)
    key64 = F.xxhash64(key).alias("__bk")
    corpus_keys = corpus_df.where(key.isNotNull())

    if shards <= 1:
        bloom = build_bloom(corpus_keys.select(key64), "__bk", m_bits, k)
        probed = probe_bloom(
            new_df.withColumn("__bk", F.when(key.isNotNull(), F.xxhash64(key))),
            "__bk", bloom, "__maybe",
        )
    else:
        bloom_df = build_sharded_bloom(
            corpus_keys.select(key64), "__bk", shards, m_bits, k)
        probed = probe_sharded_bloom(
            new_df.withColumn("__bk", F.when(key.isNotNull(), F.xxhash64(key))),
            "__bk", bloom_df, m_bits, k, shards, "__maybe",
        )

    survivors = probed.where(F.col("__maybe")).select(key_col).distinct()
    confirm = corpus_keys.select(key)
    if broadcast_survivors:
        present = confirm.join(F.broadcast(survivors), key_col, "left_semi").distinct()
        flagged = F.broadcast(present.withColumn(out_col, F.lit(True)))
    else:
        present = confirm.hint("shuffle_hash").join(survivors, key_col, "left_semi").distinct()
        flagged = present.withColumn(out_col, F.lit(True)).hint("shuffle_hash")
    return (
        probed.join(flagged, on=key_col, how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
        .drop("__bk", "__maybe")
    )
