"""Signature unit tests against pure-numpy per-row oracles (SURVEY §5.2)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from webdedup.config import DedupConfig
from webdedup.signatures import (
    _mix64,
    _perm_params,
    band_hashes,
    compute_signatures,
    minhash_block,
    shingle_hashes,
    simhash_block,
)


def _slow_minhash(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Per-row oracle: min over splitmix64(x ^ seed) per permutation."""
    x = shingles.view(np.uint64)
    return np.array(
        [int(_mix64(x ^ s).min().view(np.int64)) for s in seeds], dtype=np.int64
    )


def test_minhash_block_matches_slow_oracle():
    rng = np.random.default_rng(0)
    seeds = _perm_params(32, 123)
    rows = [
        rng.integers(-(2**63), 2**63 - 1, size=n).astype(np.int64)
        for n in [1, 5, 100, 7]
    ]
    out = minhash_block(rows, seeds, 32)
    for i, r in enumerate(rows):
        np.testing.assert_array_equal(out[i], _slow_minhash(r, seeds))


def test_minhash_block_empty_rows_do_not_leak():
    seeds = _perm_params(16, 5)
    rng = np.random.default_rng(1)
    a = rng.integers(-(2**63), 2**63 - 1, size=10).astype(np.int64)
    out = minhash_block([a, np.array([], dtype=np.int64), a], seeds, 16)
    np.testing.assert_array_equal(out[0], out[2])
    assert (out[1] == 0).all()


def test_minhash_agreement_estimates_jaccard():
    rng = np.random.default_rng(2)
    seeds = _perm_params(256, 999)
    common = rng.integers(-(2**63), 2**63 - 1, size=600).astype(np.int64)
    xa = rng.integers(-(2**63), 2**63 - 1, size=200).astype(np.int64)
    xb = rng.integers(-(2**63), 2**63 - 1, size=200).astype(np.int64)
    A, B = np.concatenate([common, xa]), np.concatenate([xb, common])
    true_j = 600 / 1000
    out = minhash_block([A, B], seeds, 256)
    est = (out[0] == out[1]).mean()
    assert abs(est - true_j) < 0.1  # 256 perms -> sigma ~ 0.03


def test_minhash_order_invariant():
    rng = np.random.default_rng(3)
    seeds = _perm_params(32, 7)
    a = rng.integers(-(2**63), 2**63 - 1, size=50).astype(np.int64)
    out = minhash_block([a, rng.permutation(a)], seeds, 32)
    np.testing.assert_array_equal(out[0], out[1])


def test_simhash_identical_and_perturbed():
    rng = np.random.default_rng(4)
    a = rng.integers(-(2**63), 2**63 - 1, size=200).astype(np.int64)
    b = a.copy()
    b[:10] = rng.integers(-(2**63), 2**63 - 1, size=10)  # 5% perturbation
    out = simhash_block([a, a, b], bits=64)
    assert out[0] == out[1]
    ham = bin(int(np.uint64(out[0]) ^ np.uint64(out[2]))).count("1")
    assert ham <= 16  # small perturbation -> small hamming distance (stat bound)


def test_shingle_hashes_spark(spark, cfg):
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u2", "u3"], "text": ["a b c d", "a b c d", "x"]})
    )
    rows = (
        df.select("url", shingle_hashes(F.col("text"), 2).alias("sh"))
        .orderBy("url")
        .collect()
    )
    assert rows[0]["sh"] == rows[1]["sh"]  # deterministic
    assert len(rows[0]["sh"]) == 3  # 'a b','b c','c d'
    assert len(rows[2]["sh"]) == 1  # short doc -> whole-doc shingle


def test_signatures_stable_across_partitioning(spark, cfg, corpus):
    pages = corpus["pages"]
    one = compute_signatures(pages.repartition(1), cfg, keep_minhash=True)
    many = compute_signatures(pages.repartition(8), cfg, keep_minhash=True)
    a = {r["url"]: (tuple(r["minhash"]), r["simhash"]) for r in one.collect()}
    b = {r["url"]: (tuple(r["minhash"]), r["simhash"]) for r in many.collect()}
    assert a == b


def test_band_hashes_shape(spark, cfg, corpus):
    sigs = compute_signatures(corpus["pages"].limit(20), cfg)
    row = sigs.select(F.size("bands").alias("nb"), F.size("blocks").alias("nq")).first()
    assert row["nb"] == cfg.bands
    assert row["nq"] == cfg.simhash_blocks
