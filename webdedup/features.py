"""Pair similarity features — the "score matrix" stage.

Maps the reference's comparator surface (suricate/preutils/similarityscores.py,
suricate/dftransformers/*, suricate/sbstransformers/*) onto candidate pairs:

  feature            reference                              here
  ------------------ -------------------------------------- -------------------------
  exact_score        similarityscores.py:7-20               native null-safe equality
  simple_score       fuzzywuzzy ratio (2M/T), :23-37        pandas UDF, difflib
                                                            SequenceMatcher == the
                                                            fuzzywuzzy pure-python
                                                            fallback -> exact parity
  token_score        token_SORT_ratio (naming trap :2,42)   pandas UDF: sort+join+ratio
  contains_score     substring either way, :56-75           native F.contains
  tfidf cosine       vectorizer.py:151-167                  replaced by minhash_sim +
                                                            exact shingle Jaccard
  navalue_score=0    metrics/metrics.py:34                  F.coalesce(score, 0.0)

Everything except the two ratio comparators is JVM-side.  The ratio UDFs run
only on candidate pairs (already blocked) over length-capped text — the
reference's own lesson (its `apply(axis=1)` comparators were its bottleneck).
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webdedup.config import DedupConfig
from webdedup.normalize import token_set

# ratio comparators see at most this many chars (candidates only, post-block)
LEV_TEXT_CAP = 512


# --------------------------------------------------------------------------
# native column features
# --------------------------------------------------------------------------

def exact_score(a: Column, b: Column) -> Column:
    """float(a == b); null in either -> 0.0 (navalue_score)."""
    return F.when(a.isNull() | b.isNull(), 0.0).otherwise((a == b).cast("double"))


def contains_score(a: Column, b: Column) -> Column:
    """1.0 if either string contains the other (similarityscores.py:56-75)."""
    return F.when(a.isNull() | b.isNull(), 0.0).otherwise(
        (a.contains(b) | b.contains(a)).cast("double")
    )


def haversine_km(lat_a: Column, lng_a: Column, lat_b: Column, lng_b: Column) -> Column:
    """Great-circle distance in km, all native trig — maps the reference's
    geo comparator (vincenty_score, similarityscores.py:77-93; geodesic vs
    haversine differs < 0.5%, documented).  Null anywhere -> NULL."""
    rad = lambda c: F.radians(c)  # noqa: E731
    dlat = rad(lat_b) - rad(lat_a)
    dlng = rad(lng_b) - rad(lng_a)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rad(lat_a)) * F.cos(rad(lat_b)) * F.pow(F.sin(dlng / 2), 2)
    )
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(h))


def jaccard_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard of two array columns (token sets or hashed shingles)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_sketch(a: Column, b: Column, k: int) -> Column:
    """Jaccard from two bottom-k sketches (signed-ascending order, as the
    signature table stores them): take the k smallest of the sketch union,
    count how many are in both sketches.  Exact when |A ∪ B| <= k (the
    sketches are then the full sets); otherwise the standard unbiased
    bottom-k estimator.  Membership logic: h ∈ bottom-k(A ∪ B) and h ∈ A
    implies h ∈ bottom-k(A), so intersecting with the SKETCHES is exact."""
    u = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    num = F.size(F.array_intersect(u, F.array_intersect(a, b)))
    den = F.size(u)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def minhash_similarity(a: Column, b: Column, num_perm: int) -> Column:
    """Fraction of agreeing MinHash positions == unbiased Jaccard estimate.

    Array form (zip_with/aggregate, interpreted) — fine for one-off scoring
    of full signatures; the candidate-join hot path uses the byte-packed
    hamming form below (packed_minhash_hamming)."""
    agree = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree / F.lit(float(num_perm))


_BYTE_LSB = 0x0101010101010101


def packed_minhash_agreement(a: Column, b: Column, n_words: int) -> Column:
    """Count of equal bytes between two byte-packed MinHash sketches
    (signatures.mini_sketch): per word, OR-fold each byte of a^b onto its
    bit 0, popcount the non-zero-byte mask, subtract from 8.

    The fold never crosses byte boundaries (shifts of 4/2/1 read only
    higher bits of the SAME byte), and uses no arithmetic that can overflow
    — safe under ANSI mode, unlike the classic (x - 0x0101..) & ~x SWAR
    zero-byte trick whose subtraction can throw on Spark 4 defaults.

    COST CAVEAT: at 15 words the expression tree (its internal reuse
    expanded by codegen) exceeds the generated-method size limit and the
    enclosing operator falls back to interpreted evaluation (~6 us/row
    measured).  Fine for per-pair feature scoring on the blocked candidate
    table (~10^5 rows); do NOT use it inside the bucket self-join, where
    row counts are 10^7-10^9 — that hot path gates on
    packed_minhash_hamming instead."""
    total = None
    for w in range(n_words):
        x = a.getItem(w).bitwiseXOR(b.getItem(w))
        t = x.bitwiseOR(F.shiftrightunsigned(x, 4))
        t = t.bitwiseOR(F.shiftrightunsigned(t, 2))
        t = t.bitwiseOR(F.shiftrightunsigned(t, 1))
        nonzero = F.bit_count(t.bitwiseAND(F.lit(_BYTE_LSB)))
        agree_w = F.lit(8) - nonzero
        total = agree_w if total is None else total + agree_w
    return total


def packed_minhash_hamming(a: Column, b: Column, n_words: int) -> Column:
    """Total BIT hamming distance between two byte-packed MinHash sketches:
    sum of bit_count(a_w xor b_w).  Two native ops per word — small enough
    that the candidate-join filter stays inside whole-stage codegen.

    Why bits, not bytes, for the join gate: counting EQUAL BYTES needs a
    zero-byte SWAR fold whose expression tree (with its internal reuse
    expanded) exceeds the codegen method-size limit at 15 words, dropping
    the whole join stage to interpreted evaluation — measured 6.1 us/row
    vs 61 ns for a trivial predicate, x3594 CPU-seconds on one 75M-row
    bucket join.  Bit distance carries the same signal, only ~1.2x noisier:
    an agreeing byte contributes 0 bits, a disagreeing byte Binom(8, 1/2),
    so E[ham] = 4 * n_perms * (1 - J_eff) and a threshold on ham IS a
    threshold on estimated Jaccard (see config.mini_max_hamming for the
    operating point)."""
    total = None
    for w in range(n_words):
        h = F.bit_count(a.getItem(w).bitwiseXOR(b.getItem(w)))
        total = h if total is None else total + h
    return total


def packed_minhash_similarity(a: Column, b: Column, num_perm: int) -> Column:
    """Jaccard estimate from byte-packed sketches: agreement fraction over
    num_perm positions (num_perm/8 packed words).  Upward-biased by the
    8-bit false-equality rate (1-J)/256 — negligible at decision
    thresholds."""
    return packed_minhash_agreement(a, b, num_perm // 8) / F.lit(float(num_perm))


def simhash_similarity(a: Column, b: Column, bits: int = 64) -> Column:
    """1 - hamming/bits via native bit_count(xor)."""
    ham = F.bit_count(a.bitwiseXOR(b))
    return F.lit(1.0) - ham / F.lit(float(bits))


# --------------------------------------------------------------------------
# ratio comparators (pandas UDFs; bit-parallel LCS, fuzzywuzzy semantics)
# --------------------------------------------------------------------------
#
# fuzzywuzzy's ratio is 2*M/T where M is the matched-character count.  Its
# primary backend (python-Levenshtein, the recommended install) computes M as
# LCS length (T - indel_distance)/2; difflib is only its slow fallback and
# differs from LCS by at most a few counts on adversarial strings.  We pin
# the python-Levenshtein semantics: ratio = 2*LCS(a,b)/(|a|+|b|), computed
# with the Allison-Dix bit-parallel LCS recurrence (u = V & M[c];
# V = (V + u) | (V - u); LCS = zero bits of V) on python bigints — one
# O(|a|) pass of word-parallel ops per pair instead of difflib's quadratic
# pure-python matching-block search (measured 5-8x faster at 400-char
# strings, more with the per-target Match-mask cache below).

def _match_masks(s: str) -> dict[str, int]:
    m: dict[str, int] = {}
    bit = 1
    for c in s:
        m[c] = m.get(c, 0) | bit
        bit <<= 1
    return m


def _lcs_ratio_one(a: str, b: str, cache: dict) -> float:
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    masks = cache.get(b)
    if masks is None:
        if len(cache) > 8192:
            cache.clear()
        masks = _match_masks(b)
        cache[b] = masks
    mask = (1 << lb) - 1
    v = mask
    get = masks.get
    for c in a:
        m = get(c, 0)
        u = v & m
        v = ((v + u) | (v - u)) & mask
    lcs = lb - v.bit_count()
    return 2.0 * lcs / (la + lb)


def _ratio_block(a_vals, b_vals) -> np.ndarray:
    out = np.zeros(len(a_vals), dtype=np.float64)
    cache: dict = {}
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        if x is None or y is None or (isinstance(x, float) and np.isnan(x)):
            continue
        out[i] = _lcs_ratio_one(str(x)[:LEV_TEXT_CAP], str(y)[:LEV_TEXT_CAP], cache)
    return out


def _sort_tokens_block(vals) -> list[str]:
    return [
        "" if v is None else " ".join(sorted(str(v)[:LEV_TEXT_CAP].lower().split()))
        for v in vals
    ]


@F.pandas_udf(T.DoubleType())
def simple_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_ratio_block(a.to_numpy(), b.to_numpy()))


@F.pandas_udf(T.DoubleType())
def token_sort_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        _ratio_block(
            np.array(_sort_tokens_block(a.to_numpy()), dtype=object),
            np.array(_sort_tokens_block(b.to_numpy()), dtype=object),
        )
    )


_RATIOS_SCHEMA = T.StructType(
    [
        T.StructField("lev_ratio", T.DoubleType()),
        T.StructField("tok_sort_ratio", T.DoubleType()),
    ]
)


@F.pandas_udf(_RATIOS_SCHEMA)
def _both_ratios(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """One Arrow round-trip for both ratio features (the text columns are the
    heavy payload; shipping them once halves the Python-boundary cost)."""
    av, bv = a.to_numpy(), b.to_numpy()
    return pd.DataFrame(
        {
            "lev_ratio": _ratio_block(av, bv),
            "tok_sort_ratio": _ratio_block(
                np.array(_sort_tokens_block(av), dtype=object),
                np.array(_sort_tokens_block(bv), dtype=object),
            ),
        }
    )


# --------------------------------------------------------------------------
# side-by-side view + feature table
# --------------------------------------------------------------------------

_TL_DOCS = threading.local()


def _doc_registry() -> list[DataFrame]:
    if not hasattr(_TL_DOCS, "tables"):
        _TL_DOCS.tables = []
    return _TL_DOCS.tables


def release_doc_caches() -> None:
    """Free the doc-side caches compute_features persisted (same ownership
    contract as candidates.release_key_caches: the caller releases once the
    feature table is MATERIALIZED — run_dedup does this after the clusters
    stage's action; direct compute_features callers own it themselves).
    Thread-local: two pipelines on different threads of one session cannot
    release each other's doc tables mid-job."""
    reg = _doc_registry()
    while reg:
        reg.pop().unpersist()


def build_sbs(pairs: DataFrame, docs: DataFrame, cols: list[str]) -> DataFrame:
    """Pair-restricted side-by-side view: two hash joins of the pair list to
    the doc table (suricate/dftransformers/cartesian.py:168-188 semantics),
    columns suffixed _source/_target."""
    src = docs.select(
        F.col("url").alias("url_a"), *[F.col(c).alias(f"{c}_source") for c in cols]
    )
    tgt = docs.select(
        F.col("url").alias("url_b"), *[F.col(c).alias(f"{c}_target") for c in cols]
    )
    # shuffle_hash pins on the doc side: (1) its size is UDF-derived and
    # under-estimated, so the static planner would broadcast it — a driver
    # collect of the whole corpus state AQE cannot demote; (2) vs sort-merge,
    # hashing skips sorting the WIDE doc rows (text + sketch arrays — the
    # memory-bound part; the pair side is narrow and cheap either way).
    # Per-partition build = corpus_bytes / shuffle_partitions, which stays
    # flat at scale when partition count tracks data size.
    return pairs.join(src.hint("shuffle_hash"), "url_a").join(
        tgt.hint("shuffle_hash"), "url_b"
    )


def explain_scores(features: DataFrame) -> DataFrame:
    """Per-method score breakdown — the ES 'explain' equivalent
    (suricate/dbconnectors/esconnector.py:237-294, which drills the per-field
    weight out of the ES explanation JSON).  One column per retrieval
    method, on that method's own similarity scale, NULL when the method did
    not retrieve the pair:

      exact     -> 1.0 (hash-identical text)
      minhash   -> the MinHash-estimated jaccard (minhash_sim)
      simhash   -> the simhash bit-agreement similarity (simhash_sim)
      substring -> the containment score (contains)
    """
    has = lambda m: F.array_contains(F.col("methods"), m)  # noqa: E731
    return features.select(
        "url_a",
        "url_b",
        "methods",
        F.when(has("exact"), F.lit(1.0)).alias("exact_score"),
        F.when(has("minhash"), F.col("minhash_sim")).alias("minhash_score"),
        F.when(has("simhash"), F.col("simhash_sim")).alias("simhash_score"),
        F.when(has("substring"), F.col("contains")).alias("substring_score"),
    )


def triage_predicates(sj, cfg: DedupConfig, methods=None):
    """Shared (sure, nomatch) predicates over a NULL-FREE shingle-jaccard
    column — the single source of truth for the reference's pruning slicing
    (pruningpipe.py:95-103), used by both the mixed-ratio UDF gate here and
    triage_rule (triage.py).  ``methods`` is the provenance array column
    when available (exact pairs are always sure; substring-verified pairs
    are never no-match)."""
    if methods is not None:
        has = lambda m: F.array_contains(methods, m)  # noqa: E731
        sure = has("exact") | (sj >= cfg.sure_threshold)
        nomatch = (sj < cfg.nomatch_threshold) & ~has("substring")
    else:
        sure = sj >= cfg.sure_threshold
        nomatch = sj < cfg.nomatch_threshold
    return sure, nomatch


FEATURE_COLS = [
    "minhash_sim",
    "shingle_jaccard",
    "simhash_sim",
    "token_jaccard",
    "lev_ratio",
    "tok_sort_ratio",
    "contains",
    "lang_exact",
]


def compute_features(
    pairs: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig,
    ratios_for: str = "all",
    n_pairs: int | None = None,
) -> DataFrame:
    """Candidate pairs -> feature table (url_a, url_b, methods?, f_1..f_k).

    ``docs`` must carry (url, text, lang, shingles, mini, simhash) — i.e.
    pages joined with compute_signatures output (shingles = the bottom-k
    sketch, mini = the reduced minhash prefix; both constant-size so the
    two SBS joins haul O(1) state per pair side, not O(doc_len)).  All
    nulls imputed to navalue_score=0.0 per the reference convention.

    ratios_for: "all" computes the expensive ratio comparators (python UDF)
    for every pair; "mixed" computes them only for pairs the cheap native
    features place between the sure/no-match thresholds — the reference's
    own pruning semantics (PruningPipe scores only mixed pairs with the
    row-apply comparators, suricate/pipeline/pruningpipe.py:102-107).
    Excluded pairs carry navalue_score 0.0 in the ratio columns.

    n_pairs: pair count if the caller already knows it (stage manifest /
    persisted count) — sizes the scoring repartition without an extra job.
    None -> counted here (cheap when pairs is persisted/snapshot-backed).
    """
    doc_cols = ["text", "lang", "shingles", "mini", "simhash"]
    # CPU-parallelism guard: candidate-pair rows are tiny (two urls + method
    # tags), so AQE's byte-based coalescing collapses them to 1-3 partitions
    # and the docs join is usually a broadcast (no reshuffle) — which would
    # run the CPU-bound ratio UDFs nearly serially.  Hash-repartitioning the
    # pair list by url_a costs one shuffle of a few MB and pins the scoring
    # stage at full core count (measured 3x on the 8k-doc corpus).  The
    # width SCALES WITH THE PAIR COUNT: a fixed 2x-parallelism width put a
    # 1.4k-pair table in 64 near-empty partitions, paying a scheduler round
    # + python-worker wakeup per partition for microseconds of work each
    # (part of the sf0.1 flagship regression, VERDICT r2 #2).
    sc = pairs.sparkSession.sparkContext
    if n_pairs is None:
        n_pairs = pairs.count()
    width = max(1, min(2 * sc.defaultParallelism, -(-n_pairs // 1024)))
    # partition by url_a ONLY: the first SBS join keys on url_a, so
    # EnsureRequirements consumes this exchange directly instead of
    # re-shuffling the pair table a second time (the old (url_a, url_b)
    # partitioning satisfied neither join and was immediately re-exchanged
    # — verified on the executed plan)
    pairs = pairs.repartition(width, "url_a")
    # the doc side feeds BOTH SBS joins, and AQE's runtime stage reuse does
    # not fire across the two identical subtrees (verified: the
    # pages-join-signatures build executed twice, once per side) — persist
    # so the corpus-wide join runs once; the CALLER releases via
    # release_doc_caches() once the feature table is materialized
    from pyspark import StorageLevel

    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    _doc_registry().append(docs)
    sbs = build_sbs(pairs, docs, doc_cols)
    # token sets derived in the same JVM stage (no extra shuffle)
    sbs = sbs.withColumn("toks_source", token_set(F.col("text_source"))).withColumn(
        "toks_target", token_set(F.col("text_target"))
    )
    lev_a = F.substring(F.col("text_source"), 1, LEV_TEXT_CAP)
    lev_b = F.substring(F.col("text_target"), 1, LEV_TEXT_CAP)
    carry = [c for c in pairs.columns if c not in ("url_a", "url_b")]
    if ratios_for == "mixed":
        # Gate the UDF INPUTS on the cheap triage condition rather than
        # splitting the plan: python UDFs inside when() are extracted and
        # run unconditionally, but a NULL input short-circuits the python
        # body to a skip, so non-mixed pairs cost one null per Arrow batch
        # instead of an O(len^2/64) LCS.  Mirrors pruningpipe.py:95-107
        # (sure/no pairs never see the apply comparators).
        # same coalesced jaccard + predicates as triage_rule (shared helper
        # prevents gate/decision drift: a null-shingle pair must look
        # identical to both)
        sj = F.coalesce(
            jaccard_sketch(
                F.col("shingles_source"),
                F.col("shingles_target"),
                cfg.shingle_sketch_k,
            ),
            F.lit(0.0),
        )
        methods = F.col("methods") if "methods" in pairs.columns else None
        sure, nomatch = triage_predicates(sj, cfg, methods)
        mixed = ~(sure | nomatch)
        lev_a = F.when(mixed, lev_a)
        lev_b = F.when(mixed, lev_b)
    sbs = sbs.withColumn("_ratios", _both_ratios(lev_a, lev_b))
    feat = sbs.select(
        "url_a",
        "url_b",
        *carry,
        F.coalesce(
            packed_minhash_similarity(
                F.col("mini_source"), F.col("mini_target"), cfg.mini_perms
            ),
            F.lit(0.0),
        ).alias("minhash_sim"),
        F.coalesce(
            jaccard_sketch(
                F.col("shingles_source"),
                F.col("shingles_target"),
                cfg.shingle_sketch_k,
            ),
            F.lit(0.0),
        ).alias("shingle_jaccard"),
        F.coalesce(
            simhash_similarity(F.col("simhash_source"), F.col("simhash_target"), cfg.simhash_bits),
            F.lit(0.0),
        ).alias("simhash_sim"),
        F.coalesce(
            jaccard_arrays(F.col("toks_source"), F.col("toks_target")), F.lit(0.0)
        ).alias("token_jaccard"),
        F.coalesce(F.col("_ratios.lev_ratio"), F.lit(0.0)).alias("lev_ratio"),
        F.coalesce(F.col("_ratios.tok_sort_ratio"), F.lit(0.0)).alias("tok_sort_ratio"),
        contains_score(F.col("text_source"), F.col("text_target")).alias("contains"),
        exact_score(F.col("lang_source"), F.col("lang_target")).alias("lang_exact"),
    )
    return feat
