"""Candidate-pair generation — the blocking layer.

Replaces the reference's per-source-row Elasticsearch top-k retrieval loop
(suricate/dbconnectors/esconnector.py:132-153: one HTTP roundtrip per row)
with declarative LSH blocking:

  - MinHash band buckets: explode band hashes, self-join within buckets
  - SimHash prefix blocks: explode 16-bit blocks, self-join, hamming filter
  - (substring anchors live in substring.py)

Skew handling is explicit (north_rule): bucket sizes are computed with a
map-side-partial two-phase aggregation (see bucket_stats), oversized buckets
(boilerplate pages) are capped and the dropped mass is RETURNED as a metrics
DataFrame — never silently truncated.  AQE skew-join splitting backstops the
self-joins.

Output candidate schema mirrors the reference's ES output
(ix_source, ix_target, es_score, es_rank) as:
    (url_a, url_b, methods array<string>)  with url_a < url_b.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webdedup.config import DedupConfig


# DataFrames persisted by _pairs_from_keys(persist_keys=True) / substring
# verification.  The persists are needed while the candidate stage computes
# (the key table feeds 4 consumers inside one job); after the pair list is
# MATERIALIZED (stage parquet write or persisted-and-counted) the caches are
# dead weight — release_key_caches() frees them so repeated run_dedup calls
# or streaming batches in one long-lived session don't accumulate cached
# blocks for the process lifetime.  The registry is THREAD-LOCAL: two
# pipelines running on different threads of one SparkSession must not
# release each other's key tables mid-job.  Library callers that invoke
# substring_candidates/verify_overlaps directly own the release — call
# release_key_caches() (same thread) once the results are materialized.
_TL = threading.local()


def _registry() -> list[DataFrame]:
    if not hasattr(_TL, "tables"):
        _TL.tables = []
    return _TL.tables


def release_key_caches() -> None:
    reg = _registry()
    while reg:
        reg.pop().unpersist()


def bucket_stats(keys: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Two-phase bucket sizing: (key_idx, key_hash, bucket_size).

    Skew-safe by construction: a pure count aggregates map-side first
    (HashAggregate partial -> exchange -> final), so each map partition
    ships at most ONE row per (key_idx, key_hash) and a boilerplate hot key
    costs every reducer at most num_map_partitions rows — the same bound an
    explicit salt gives.  An earlier version salted anyway (groupBy key+salt,
    then re-aggregate); that is the right pattern for aggregates whose
    partial state is wide (collect_list/distinct counts), but for a count it
    only added an exchange + AQE stage per candidate source (3 per run) with
    no skew benefit.
    """
    return keys.groupBy("key_idx", "key_hash").agg(
        F.count("*").alias("bucket_size")
    )


def _pairs_from_keys(
    keys: DataFrame,
    cfg: DedupConfig,
    method: str,
    max_bucket: int | None = None,
    persist_keys: bool = False,
    carry_cols: list[str] | None = None,
    pair_filter=None,
    id_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Self-join within (key_idx, key_hash) buckets -> distinct
    ({id_col}_a, {id_col}_b).

    Returns (pairs, skew_metrics).  Buckets with bucket_size > max_bucket
    are dropped entirely and accounted in skew_metrics — at web scale these
    are boilerplate/empty-page buckets whose quadratic pair blow-up would
    dominate the job; the substring + exact passes still cover their members.

    id_col: the per-doc identity on the key rows.  Callers should
    dictionary-encode the url to a 64-bit `did` BEFORE exploding keys (see
    minhash_candidates): the exploded key table is the job's dominant
    shuffle payload (bands x docs rows, each carrying the id + gate
    sketch), and an 8-byte long in place of a ~60-byte url string both
    shrinks that shuffle and keeps the self-join's sort/hash on fixed-width
    primitives.  Urls rejoin AFTER the distinct, only for surviving pairs
    (rejoin_urls).

    persist_keys: the key table is scanned up to 4x downstream (bucket
    sizing, the prune join, and — through the pruned table — both sides of
    the self-join).  When keys derive from a persisted signature table
    (minhash/simhash) the re-scan is a cheap cached explode; when they come
    from a pandas-UDF corpus scan (substring anchors) the whole UDF
    re-executes per consumer — pass True there so the scan runs once AND
    the pruned table below is cached (MEMORY_AND_DISK, spill-safe at
    scale).
    """
    max_bucket = max_bucket or cfg.max_bucket_size
    if persist_keys:
        from pyspark import StorageLevel

        keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
        _registry().append(keys)
    stats = bucket_stats(keys, cfg)
    ok = stats.where(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= max_bucket)
    )
    dropped = stats.where(F.col("bucket_size") > max_bucket)
    skew_metrics = dropped.agg(
        F.lit(method).alias("method"),
        F.count("*").alias("dropped_buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_dropped_bucket"),
    )

    carry_cols = carry_cols or []
    # shuffle_hash pins, two reasons.  (1) The key table is UDF-derived
    # (exploded band/anchor hashes), so the static planner estimates it from
    # the parquet scan size and will happily BROADCAST millions of key rows
    # as the build side (observed at 150k pages: the broadcast build + the
    # pair-distinct partial agg on its unpartitioned output thrashed 8 tasks
    # against the memory manager for 19+ min; AQE cannot demote a
    # statically-planned broadcast).  (2) vs sort-merge (the previous pin):
    # hash probing streams, while sorting the multi-GB exploded key table
    # is O(n log n) MEMORY-BOUND work that inflated CPU-seconds 2.6x when
    # core count rose 8->32 on one box (cache contention, event-log
    # measured).  Build sides are bounded: `ok` holds one row per surviving
    # bucket, and the self-join's per-partition build is capped by
    # max_bucket pruning; at cluster scale shuffle partition count grows
    # with the data, keeping per-task builds flat.  Both joins key on
    # (key_idx, key_hash), so the bucket-stats exchange is reused.
    pruned = keys.join(
        ok.select("key_idx", "key_hash").hint("shuffle_hash"),
        ["key_idx", "key_hash"],
    )
    # The self-join scans pruned twice and AQE's runtime stage reuse does
    # NOT fire across the join's two identical subtrees (verified on the
    # executed plan: 0 ReusedExchange), so without a cache the key-table
    # exchange, the bucket-stats pass and the key derivation all run TWICE
    # per source.  Persist pruned ONLY when the keys are UDF-derived
    # (persist_keys — substring anchors), where the recompute is a second
    # full corpus scan through Python.  For signature-derived keys
    # (minhash/simhash) the recompute is an explode of the already-cached
    # signature table + one exchange, and an interleaved same-hour A/B at
    # 150k pages/local[8] measured the unconditional MEMORY_AND_DISK cache
    # as a wash within host noise (min-of-samples 272.8s conditional vs
    # 279.7s cached vs 278.6s round-4 engine) — so we keep the variant
    # that holds no executor memory: at cluster scale those blocks would
    # evict other working sets for no measured win.  An in-array
    # alternative (collect_list + nested-transform combination explode,
    # single exchange, no cache) was measured 49% SLOWER end-to-end:
    # higher-order-function lambdas evaluate interpreted, which took the
    # per-pair hamming gate out of whole-stage codegen.
    if persist_keys:
        from pyspark import StorageLevel

        pruned = pruned.persist(StorageLevel.MEMORY_AND_DISK)
        _registry().append(pruned)
    a, b = f"{id_col}_a", f"{id_col}_b"
    left = pruned.select(
        F.col("key_idx"),
        F.col("key_hash"),
        F.col(id_col).alias(a),
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    right = pruned.select(
        F.col("key_idx"),
        F.col("key_hash"),
        F.col(id_col).alias(b),
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    joined = left.join(right.hint("shuffle_hash"), ["key_idx", "key_hash"]).where(
        F.col(a) < F.col(b)
    )
    if pair_filter is not None:
        # IN-JOIN pair gate: runs in the join stage, before the distinct
        # exchange — a pair dropped here never costs a shuffle byte
        joined = pair_filter(joined)
    pairs = (
        joined.select(a, b)
        .distinct()
        .withColumn("method", F.lit(method))
    )
    return pairs, skew_metrics


def doc_ids(docs: DataFrame) -> DataFrame:
    """(url, did) dictionary: did = xxhash64(url).

    Collision posture (shared with substring.verify_overlaps): a 64-bit
    birthday collision needs ~5e9 docs for even 50% odds of ONE collision
    corpus-wide, and its only effect is one spurious candidate pair that
    the verification features then score on the real texts — acceptable
    and documented up to 10^12 docs."""
    return docs.select("url", F.xxhash64("url").alias("did"))


def rejoin_urls(pairs_did: DataFrame, ids: DataFrame) -> DataFrame:
    """(did_a, did_b, ...) -> canonical (url_a, url_b, ...): two narrow
    hash joins against the (url, did) dictionary, run only for pairs that
    SURVIVED bucketing + in-join gates + distinct.  least/greatest restores
    the url_a < url_b canonical order (did order is hash order, not url
    order).  shuffle_hash pins: both sides are UDF/agg-derived, so the
    static planner's size estimates are unusable (see _pairs_from_keys)."""
    extra = [c for c in pairs_did.columns if c not in ("did_a", "did_b")]
    ia = ids.select(F.col("did").alias("did_a"), F.col("url").alias("_ua"))
    ib = ids.select(F.col("did").alias("did_b"), F.col("url").alias("_ub"))
    return (
        pairs_did.join(ia.hint("shuffle_hash"), "did_a")
        .join(ib.hint("shuffle_hash"), "did_b")
        .select(
            F.least("_ua", "_ub").alias("url_a"),
            F.greatest("_ua", "_ub").alias("url_b"),
            *extra,
        )
    )


def minhash_candidates(
    signatures: DataFrame, cfg: DedupConfig, did_pairs: bool = False
) -> tuple[DataFrame, DataFrame]:
    """LSH band-bucket candidates from the `bands` column, prefiltered by
    the MinHash similarity estimate.

    Boilerplate-heavy corpora make the LSH s-curve's low-J tail expensive:
    docs sharing only chrome (true J ~ 0.1) still band-collide a few
    percent of the time, and at web scale those false candidates dominate
    the pair list (measured 90% of 1.3M pairs below the no-match
    threshold).  The signature table already holds the 126-perm MinHash, so
    estimating J costs one narrow join + one zip_with per pair — far
    cheaper than hauling text+shingles through the SBS join.  The cutoff
    sits 2.7 sigma below the no-match threshold (sigma = sqrt(J(1-J)/126)
    ~ 0.036 at J=0.2), and a pair only matters to the decision rule at
    J >= jaccard_threshold (0.5), which cannot estimate below 0.12 — so
    blocking recall at the decision boundary is unaffected.
    """
    use_mini = cfg.mini_max_hamming > 0 and "mini" in signatures.columns
    # dictionary-encode url -> 64-bit did BEFORE the explode: the band-key
    # table is bands(42) rows/doc and the job's dominant shuffle payload;
    # an 8 B long replaces a ~60 B url on every one of them (urls rejoin
    # below, only for surviving pairs) — measured the biggest lever on the
    # one-box memory-bandwidth wall at high core counts (BENCH/BASELINE.md)
    keys = signatures.select(
        F.xxhash64("url").alias("did"),
        *(["mini"] if use_mini else []),
        F.posexplode("bands").alias("key_idx", "key_hash"),
    )

    def mini_gate(joined: DataFrame) -> DataFrame:
        from webdedup.features import packed_minhash_hamming

        ham = packed_minhash_hamming(
            F.col("mini_a"), F.col("mini_b"), cfg.mini_perms // 8
        )
        return joined.where(ham <= F.lit(cfg.mini_max_hamming))

    raw_did, skew = _pairs_from_keys(
        keys,
        cfg,
        "minhash",
        carry_cols=["mini"] if use_mini else None,
        pair_filter=mini_gate if use_mini else None,
        id_col="did",
    )
    if cfg.minhash_prefilter > 0:
        # optional post-hoc full-signature prefilter, computed in did space
        # so both output modes stay consistent
        if "minhash" not in signatures.columns:
            raise ValueError(
                "minhash_prefilter > 0 needs the full signature column: "
                "build the table with compute_signatures(..., "
                "keep_minhash=True) (the default drops it — no other "
                "consumer reads it)"
            )
        from webdedup.features import minhash_similarity

        sig = signatures.select(F.xxhash64("url").alias("did"), "minhash")
        a = sig.select(F.col("did").alias("did_a"), F.col("minhash").alias("mh_a"))
        b = sig.select(F.col("did").alias("did_b"), F.col("minhash").alias("mh_b"))
        # merge hints: the signature side carries 1 KB arrays the static
        # planner under-estimates (UDF-derived) — never let it become a
        # broadcast build side (see substring.verify_overlaps for the
        # measured failure mode)
        raw_did = (
            raw_did.join(a.hint("merge"), "did_a")
            .join(b.hint("merge"), "did_b")
            .where(
                minhash_similarity(F.col("mh_a"), F.col("mh_b"), cfg.num_perm)
                >= F.lit(cfg.minhash_prefilter)
            )
            .select("did_a", "did_b", "method")
        )
    if did_pairs:
        # did-space output: the pipeline unions all sources in did space and
        # rejoins urls ONCE after the union dedup (two joins total instead
        # of two per source — join count is pure fixed overhead at small
        # scale and extra exchanges at large)
        return raw_did, skew
    return rejoin_urls(raw_did, doc_ids(signatures)), skew


def simhash_candidates(
    signatures: DataFrame, cfg: DedupConfig, did_pairs: bool = False
) -> tuple[DataFrame, DataFrame]:
    """SimHash prefix-block candidates, hamming-filtered JVM-side.

    Pigeonhole: hamming distance <= simhash_max_hamming < simhash_blocks
    guarantees the pair shares at least one block value.
    """
    # did-encoded key rows (see minhash_candidates): 8 B id + 8 B signature
    # per exploded block row, urls rejoined only for survivors
    keys = signatures.select(
        F.xxhash64("url").alias("did"),
        "simhash",
        F.posexplode("blocks").alias("key_idx", "key_hash"),
    )

    def hamming_gate(joined: DataFrame) -> DataFrame:
        # in-join: the signature is ONE long carried on each key row, so the
        # exact hamming predicate runs inside the self-join stage (native
        # bit_count, codegen) — an earlier version re-joined the signature
        # table twice after the fact, paying two more 150k-row sort-merges
        ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
        return joined.where(ham <= F.lit(cfg.simhash_max_hamming))

    pairs_did, skew = _pairs_from_keys(
        keys,
        cfg,
        "simhash",
        carry_cols=["simhash"],
        pair_filter=hamming_gate,
        id_col="did",
    )
    if did_pairs:
        return pairs_did, skew
    return rejoin_urls(pairs_did, doc_ids(signatures)), skew


def _star_pairs(
    keyed: DataFrame, key_col: str, method: str, did_pairs: bool
) -> DataFrame:
    """Min-url star pairs over a (url, key) frame — the shared shape of
    exact_candidates and url_candidates.

    Pairs each doc in a key group with the group's minimum url — linear in
    group size (a star, not a clique); connected components restores the
    full group downstream.  did_pairs=True projects the star edges to
    (did_a, did_b) for the pipeline's did-space union (the star root stays
    the min-URL doc; only the encoding changes, so components — and the
    min-url gids CC derives — are identical).
    """
    keeper = keyed.groupBy(key_col).agg(
        F.min("url").alias("url_a"), F.count("*").alias("n")
    )
    # keeper is corpus-sized (one row per distinct key) — the shuffle_hash
    # pin keeps the planner from broadcasting it off a bad agg-output
    # estimate, and reuses the groupBy's key exchange without a sort
    out = (
        keyed.join(keeper.where(F.col("n") >= 2).hint("shuffle_hash"), key_col)
        .where(F.col("url") != F.col("url_a"))
        .select("url_a", F.col("url").alias("url_b"))
        .withColumn("method", F.lit(method))
    )
    if did_pairs:
        h_a, h_b = F.xxhash64("url_a"), F.xxhash64("url_b")
        out = out.select(
            F.least(h_a, h_b).alias("did_a"),
            F.greatest(h_a, h_b).alias("did_b"),
            "method",
        )
    return out


def exact_candidates(pages: DataFrame, did_pairs: bool = False) -> DataFrame:
    """Exact-duplicate pairs via text-hash grouping (the hash-groupBy dedup).
    Star/keeper semantics: see _star_pairs."""
    hashed = pages.select(
        "url", F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash")
    )
    return _star_pairs(hashed, "text_hash", "exact", did_pairs)


def union_candidates(*sources: DataFrame) -> DataFrame:
    """Union candidate sources, collecting per-pair provenance methods.
    Works in either key space: (url_a, url_b) or did-encoded (did_a, did_b)
    — the pipeline unions in did space and rejoins urls once afterwards."""
    unioned = sources[0]
    for s in sources[1:]:
        unioned = unioned.unionByName(s)
    keys = ["did_a", "did_b"] if "did_a" in unioned.columns else ["url_a", "url_b"]
    return unioned.groupBy(*keys).agg(
        F.sort_array(F.collect_set("method")).alias("methods")
    )


def rank_candidates(scored: DataFrame, score_col: str, k: int | None = None) -> DataFrame:
    """Per-source rank, mirroring the reference's es_rank
    (suricate/dbconnectors/esconnector.py:289-294): row_number over
    (partition by url_a order by score desc, url_b)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("url_a").orderBy(F.col(score_col).desc(), F.col("url_b"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.where(F.col("rank") <= k)
    return ranked


def url_candidates(pages: DataFrame, did_pairs: bool = False) -> DataFrame:
    """URL-level duplicate pairs: pages whose canonicalized urls collide
    (normalize.canonical_url — scheme/www/fragment/trailing-slash/host-case
    variants of one address).  Same linear star shape and keeper rule as
    exact_candidates: each member pairs with the group's min url, CC
    restores the full group downstream.  In a Common-Crawl pipeline this
    runs BEFORE content dedup — it needs no text at all, so the scan reads
    one string column.  Star/keeper semantics: see _star_pairs."""
    from webdedup.normalize import canonical_url

    keyed = pages.select("url", canonical_url(F.col("url")).alias("curl"))
    return _star_pairs(keyed, "curl", "url", did_pairs)
