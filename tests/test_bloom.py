"""Bloom membership summaries + incremental dedup (webdedup.bloom).

Pins: (a) the numpy position kernel against a pure-python splitmix64 model,
(b) zero false negatives and partitioning-invariant bits, (c) measured
false-positive rate against theory, (d) incremental_dedup == the plain
membership join even with a deliberately tiny filter (forced false
positives — the confirm join must eat them), broadcast and sharded layouts
both, (e) null-key behavior."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from webdedup.bloom import (
    BloomFilter,
    _positions,
    build_bloom,
    build_sharded_bloom,
    incremental_dedup,
    probe_bloom,
    probe_sharded_bloom,
)

_M64 = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15


def _mix64_py(v: int) -> int:
    """Pure-python splitmix64 finalizer (the model the numpy kernel must
    match bit-for-bit)."""
    v &= _M64
    v ^= v >> 30
    v = (v * 0xBF58476D1CE4E5B9) & _M64
    v ^= v >> 27
    v = (v * 0x94D049BB133111EB) & _M64
    v ^= v >> 31
    return v


def _positions_py(key: int, m_bits: int, k: int) -> list[int]:
    h1 = _mix64_py(key & _M64)
    h2 = _mix64_py((key & _M64) ^ _GOLDEN) | 1
    return [(h1 + i * h2) & (m_bits - 1) for i in range(k)]


@given(st.lists(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_positions_kernel_matches_python_model(keys):
    m_bits, k = 1 << 12, 5
    got = _positions(np.asarray(keys, dtype=np.int64), m_bits, k)
    for j, key in enumerate(keys):
        assert list(got[:, j]) == _positions_py(key, m_bits, k)


def test_no_false_negatives_and_partition_invariance(spark):
    keys = list(range(-500, 1500, 3))
    df = spark.createDataFrame([(key,) for key in keys], "key long")
    blooms = [
        build_bloom(df.repartition(p), "key", m_bits=1 << 14, k=6)
        for p in (1, 7)
    ]
    assert np.array_equal(blooms[0].bits, blooms[1].bits)  # OR is commutative
    member = blooms[0].contains(np.asarray(keys, dtype=np.int64))
    assert member.all()  # a bloom filter NEVER misses a member
    probed = probe_bloom(df, "key", blooms[0], "hit").toPandas()
    assert probed["hit"].all()


def test_false_positive_rate_near_theory(spark):
    n, m_bits, k = 2000, 1 << 14, 6
    members = spark.createDataFrame([(i,) for i in range(n)], "key long")
    bloom = build_bloom(members, "key", m_bits=m_bits, k=k)
    # theory: fp = fill^k where fill ~ 1 - e^{-kn/m}
    theory = (1.0 - math.exp(-k * n / m_bits)) ** k
    outsiders = np.arange(10_000_000, 10_000_000 + 20_000, dtype=np.int64)
    measured = bloom.contains(outsiders).mean()
    assert measured < 4 * theory
    assert abs(bloom.fill_ratio() - (1.0 - math.exp(-k * n / m_bits))) < 0.02


@pytest.mark.parametrize("shards,broadcast", [(1, True), (1, False), (4, True)])
def test_incremental_dedup_equals_plain_join(spark, shards, broadcast):
    # 40% key overlap; m tiny enough that false positives are certain —
    # the exact confirm join must remove every one of them.
    corpus = spark.createDataFrame(
        [(f"k{i}", i) for i in range(400)], "key string, cid long")
    new = spark.createDataFrame(
        [(f"k{i}", i) for i in range(240, 640)] + [(None, 9999)],
        "key string, nid long")
    got = (
        incremental_dedup(new, corpus, "key", m_bits=1 << 8, k=2,
                          shards=shards, broadcast_survivors=broadcast)
        .select("nid", "is_dup").toPandas().sort_values("nid")
    )
    want = {i: (240 <= i < 400) for i in range(240, 640)}
    want[9999] = False  # null key is never a dup
    assert dict(zip(got["nid"], got["is_dup"])) == want


def test_sharded_bits_equal_broadcast_bits(spark):
    """Per-shard filters over the shard's keys == one filter built from the
    same keys: same kernel, so probing either layout agrees everywhere."""
    m_bits, k, shards = 1 << 12, 4, 3
    df = spark.createDataFrame([(i * 17 + 5,) for i in range(300)], "key long")
    sharded = {
        r["shard"]: np.frombuffer(r["bits"], dtype=np.uint64)
        for r in build_sharded_bloom(df, "key", shards, m_bits, k).collect()
    }
    pdf = df.toPandas()
    for shard, bits in sharded.items():
        slice_keys = [
            int(v) for v in pdf["key"] if int(v) % shards == shard
        ]
        solo = build_bloom(
            spark.createDataFrame([(v,) for v in slice_keys], "key long"),
            "key", m_bits=m_bits, k=k)
        assert np.array_equal(bits, solo.bits), f"shard {shard}"

    probe = spark.createDataFrame(
        [(i,) for i in range(0, 8000, 11)], "key long")
    got = (
        probe_sharded_bloom(probe, "key", build_sharded_bloom(
            df, "key", shards, m_bits, k), m_bits, k, shards, "hit")
        .toPandas().set_index("key")["hit"]
    )
    members = {i * 17 + 5 for i in range(300)}
    for key in range(0, 8000, 11):
        if key in members:
            assert got[key], f"member {key} missed (false negative)"


def test_bad_params_raise():
    df = None
    with pytest.raises(ValueError):
        build_bloom(df, "key", m_bits=1000)  # not a power of two
    with pytest.raises(ValueError):
        build_bloom(df, "key", m_bits=1 << 10, k=0)


def test_null_in_batch_does_not_corrupt_probe(spark):
    """Arrow->pandas downgrades an int64 batch containing a null to float64,
    rounding full-range 64-bit keys (53-bit mantissa) — which would make
    true members probe FALSE (silent recall loss).  Force a null into the
    same single-partition batch as genuine members and require every member
    to still probe true."""
    keys = [(1 << 62) + 12345 + i for i in range(50)]  # not float64-exact
    members = spark.createDataFrame([(k,) for k in keys], "key long")
    bloom = build_bloom(members, "key", m_bits=1 << 14, k=6)
    probe_rows = [(k,) for k in keys] + [(None,)]
    probed = (
        probe_bloom(
            spark.createDataFrame(probe_rows, "key long").coalesce(1),
            "key", bloom, "hit")
        .toPandas()
    )
    assert probed[probed["key"].notna()]["hit"].all()  # no false negatives
    assert not probed[probed["key"].isna()]["hit"].any()  # null probes false
