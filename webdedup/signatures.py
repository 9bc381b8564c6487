"""Shingling + MinHash/SimHash signature computation.

Replaces the reference's Elasticsearch inverted index + TF-IDF vectorizer as
the similarity substrate (suricate/dbconnectors/esconnector.py:132-153,
suricate/dftransformers/vectorizer.py:11-107).  Design:

  - token k-shingles are built **JVM-side** (sequence + transform + slice +
    xxhash64) so the hot path stays inside whole-stage codegen and the only
    Python boundary is one Arrow-batched pandas UDF per signature type;
  - MinHash uses the standard (a*x + b) mod p universal family over 32-bit
    folded shingle hashes, p = 2^61 - 1, vectorized in numpy over a whole
    Arrow batch at once (no per-row Python — BASELINE.json input_hint);
  - SimHash packs the sign of per-bit weighted sums of shingle hashes into
    one int64;
  - LSH band hashes come back out of Python-land: xxhash64 over signature
    slices, again JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webdedup.config import DedupConfig
from webdedup.normalize import tokens

# --------------------------------------------------------------------------
# shingles (JVM-side)
# --------------------------------------------------------------------------

def shingle_hashes_from_tokens(toks: Column, k: int) -> Column:
    """Distinct xxhash64 values of the k-token shingles of a token ARRAY
    COLUMN (must be a bound attribute, not an inline expression — see
    shingle_hashes below).

    Built natively: sequence(0, n-k) -> slice -> array_join -> xxhash64.
    Docs shorter than k tokens contribute their whole token string as a
    single shingle (so short docs still participate).
    Returns array<long> (distinct, unsorted).
    """
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    ).otherwise(F.array(F.xxhash64(F.array_join(toks, " "))))
    return F.array_distinct(shingles)


def shingle_hashes(text_col: Column, k: int) -> Column:
    """Shingle hashes straight from a text column.

    PERFORMANCE TRAP: higher-order functions are CodegenFallback, and every
    expression captured inside a transform() lambda is re-evaluated PER
    ELEMENT.  Passing tokens(text) inline here makes the regex tokenizer run
    once per shingle position — O(n^2) per document (measured 30x slowdown).
    Only use this form for tiny inputs/tests; production paths must
    materialize the token array as a column first (see compute_signatures).
    """
    return shingle_hashes_from_tokens(tokens(text_col), k)


# --------------------------------------------------------------------------
# MinHash (one pandas UDF, numpy-vectorized over the Arrow batch)
# --------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int) -> np.ndarray:
    """Per-permutation 64-bit xor seeds for the splitmix64 mixer."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Steele et al.) — full-avalanche 64-bit mixer,
    uint64 wraparound arithmetic.  An affine (a*x+b) mod p family is NOT
    usable here: with 32-bit inputs the product barely wraps a 61-bit prime,
    leaving the hash quasi-monotone in x, so one small shingle hash wins the
    min for most permutations and the Jaccard estimate collapses."""
    v = v.astype(np.uint64, copy=True)
    v ^= v >> np.uint64(30)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return v


# Cap on flattened shingles processed per numpy block: bounds the
# (num_perm x n_shingles) intermediate at ~256 MB regardless of Arrow batch size.
_CHUNK_SHINGLES = 1 << 18


def _row_chunks(lengths: np.ndarray, budget: int):
    """Yield (start_row, end_row) slices whose total shingle count <= budget."""
    start = 0
    acc = 0
    for i, ln in enumerate(lengths):
        if acc + ln > budget and i > start:
            yield start, i
            start, acc = i, 0
        acc += int(ln)
    if start < len(lengths):
        yield start, len(lengths)


def minhash_block(shingle_lists, seeds: np.ndarray, num_perm: int) -> np.ndarray:
    """Pure-numpy MinHash of a list of int64 shingle arrays -> (rows, num_perm).

    Permutation i = splitmix64(shingle_hash XOR seed_i); signature value is
    the segment min (viewed back as signed int64 — min order is preserved
    per-permutation since the xor+mix is a bijection applied to all docs).
    """
    lengths = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64)
    out = np.zeros((len(lengths), num_perm), dtype=np.int64)
    if lengths.sum() == 0:
        return out
    flat = np.concatenate([np.asarray(s, dtype=np.int64) for s in shingle_lists])
    x = flat.view(np.uint64)
    hv = _mix64(x[None, :] ^ seeds[:, None])  # (num_perm, total)
    offsets = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    # reduceat pitfall: an empty segment returns h[offset] (wrong) — mask
    # zero-length rows out of the offsets array, leave their minhash as zeros.
    nonzero = lengths > 0
    nz_off = offsets[nonzero]
    if nz_off.size:
        mins = np.minimum.reduceat(hv, nz_off, axis=1)  # (num_perm, nz_rows)
        out[nonzero] = mins.T.view(np.int64)
    return out


def make_minhash_udf(cfg: DedupConfig):
    seeds = _perm_params(cfg.num_perm, cfg.minhash_seed)
    num_perm = cfg.num_perm

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(shingles: pd.Series) -> pd.Series:
        vals = shingles.to_numpy()
        lengths = np.fromiter((len(s) for s in vals), dtype=np.int64)
        parts = [
            minhash_block(vals[s:e], seeds, num_perm)
            for s, e in _row_chunks(lengths, _CHUNK_SHINGLES)
        ]
        out = np.concatenate(parts) if parts else np.zeros((0, num_perm), dtype=np.int64)
        return pd.Series(list(out))

    return minhash


# --------------------------------------------------------------------------
# SimHash (one pandas UDF)
# --------------------------------------------------------------------------

def simhash_block(shingle_lists, bits: int) -> np.ndarray:
    lengths = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64)
    out = np.zeros(len(lengths), dtype=np.int64)
    if lengths.sum() == 0:
        return out
    flat = np.concatenate([np.asarray(s, dtype=np.int64) for s in shingle_lists]).view(
        np.uint64
    )
    # (total, bits) bit matrix mapped to +-1
    bitmat = (
        ((flat[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        * 2
        - 1
    )
    offsets = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    nonzero = lengths > 0
    nz_off = offsets[nonzero]
    if nz_off.size:
        sums = np.add.reduceat(bitmat, nz_off, axis=0)  # (nz_rows, bits)
        packed = ((sums > 0).astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        out[nonzero] = packed.astype(np.int64)
    return out


def make_simhash_udf(cfg: DedupConfig):
    bits = cfg.simhash_bits

    @F.pandas_udf(T.LongType())
    def simhash(shingles: pd.Series) -> pd.Series:
        vals = shingles.to_numpy()
        lengths = np.fromiter((len(s) for s in vals), dtype=np.int64)
        parts = [
            simhash_block(vals[s:e], bits)
            for s, e in _row_chunks(lengths, _CHUNK_SHINGLES)
        ]
        out = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
        return pd.Series(out)

    return simhash


# --------------------------------------------------------------------------
# signature table
# --------------------------------------------------------------------------

def band_hashes(sig_col: Column, cfg: DedupConfig) -> Column:
    """array<long> of LSH band hashes: xxhash64(band_idx, sig[band slice])."""
    r = cfg.rows_per_band
    return F.transform(
        F.sequence(F.lit(0), F.lit(cfg.bands - 1)),
        lambda i: F.xxhash64(i, F.slice(sig_col, i * r + 1, r)),
    )


def simhash_blocks(simhash_col: Column, cfg: DedupConfig) -> Column:
    """array<long> of prefix blocks: the 64-bit simhash cut into q bit-blocks.

    Two docs within hamming distance d < q share at least one block value
    (pigeonhole) — the classic Charikar/Manku prefix blocking scheme.
    """
    q = cfg.simhash_blocks
    width = cfg.simhash_bits // q
    mask = F.lit((1 << width) - 1)
    # unrolled (q is a Python constant): shiftrightunsigned needs a literal int
    return F.array(
        *[
            F.shiftrightunsigned(simhash_col, i * width).bitwiseAND(mask)
            for i in range(q)
        ]
    )


def compute_signatures(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """pages(url, text, ...) -> (url, n_tokens, shingles, minhash, simhash, bands, blocks).

    One JVM pass builds shingle hashes; the two pandas UDFs share the same
    shingle array column so the text is tokenized exactly once.  Tokens are
    materialized as a column BEFORE shingling so the transform() lambda
    captures a bound attribute — an inline tokens() expression would be
    re-evaluated per shingle position (O(n^2), CodegenFallback; measured
    ~30x slower at 8k docs).
    """
    minhash_udf = make_minhash_udf(cfg)
    simhash_udf = make_simhash_udf(cfg)
    toks_df = pages.select("url", tokens(F.col("text")).alias("toks"))
    df = toks_df.select(
        "url",
        F.size("toks").alias("n_tokens"),
        shingle_hashes_from_tokens(F.col("toks"), cfg.shingle_k).alias("shingles"),
    )
    df = df.withColumn("minhash", minhash_udf("shingles")).withColumn(
        "simhash", simhash_udf("shingles")
    )
    return df.select(
        "url",
        "n_tokens",
        "shingles",
        "minhash",
        "simhash",
        band_hashes(F.col("minhash"), cfg).alias("bands"),
        simhash_blocks(F.col("simhash"), cfg).alias("blocks"),
    )
