"""Similarity search over embedding columns (array<float>).

Three paths, as a training-data pipeline needs:
  - cosine_topk: brute-force exact top-k — the baseline/oracle, a broadcast
    nested-loop of a small query set against the corpus, all JVM-side
    (zip_with/aggregate dot products).
  - rp_lsh_topk: a scale path — random-hyperplane (SimHash-for-vectors,
    Charikar 2002) sign signatures, cut into prefix blocks exactly like the
    text SimHash (pigeonhole guarantee), candidates from block-bucket joins,
    exact cosine re-ranking on candidates only.  The sign signature is one
    numpy matmul per Arrow batch (pandas UDF).
  - ivf_topk: the other standard scale path — an inverted-file (IVF) coarse
    quantizer (Jegou/Douze/Schmid 2011, "Product Quantization for Nearest
    Neighbor Search" §IV; the FAISS IVF-Flat layout): every corpus vector is
    assigned to its nearest of n_cells centroids (the inverted lists), a
    query probes its n_probe nearest cells, and only those lists are
    cosine-re-ranked.  Relationally the "index" is just a (vector, cell)
    column and the probe is an equi-join on cell — Spark's shuffle IS the
    inverted-file lookup, so at 100 TB the lists are hash-partitioned by
    cell and a query touches n_probe/n_cells of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, cosine).  Broadcasts the
    query set; the corpus streams (one scan, no shuffle until the window)."""
    # norms precomputed ONCE PER VECTOR on each side before the join —
    # inside the join each would be re-evaluated per pair (query norm N
    # times, corpus norm k times; measured 3x the query cost at sf0.1)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def make_sign_signature_udf(dim: int, n_bits: int = 64, seed: int = 1337):
    """Random-hyperplane sign signature as one int64 per vector.

    One numpy (batch x dim) @ (dim x n_bits) matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    @F.pandas_udf(T.LongType())
    def sign_sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0  # (batch, n_bits)
        packed = (bits.astype(np.uint64) << np.arange(n_bits, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(packed.astype(np.int64))

    return sign_sig


def make_portable_sign_signature_udf(dim: int, n_bits: int = 64):
    """RP-LSH sign signature with ENGINE-INDEPENDENT hyperplanes, for the
    DuckDB correctness oracle (the production path is the seeded-gaussian
    make_sign_signature_udf).

    Two portability choices make the sign bit replayable bit-for-bit in any
    engine, with no float-summation-order hazard:
      - plane[j][d] = (uint32 of the first 4 md5 bytes of 'rp:<j>:<d>')
        % 2001 - 1000 — an integer in [-1000, 1000] any SQL engine can
        rebuild from its md5();
      - vectors are quantized q = floor(v * 1000): float32 -> float64 is
        exact, *1000 rounds identically under IEEE-754, floor is exact —
        so the dot product is INTEGER arithmetic (|sum| < 2^40 for any
        realistic embedding scale) and sign(q . plane) is deterministic,
        while a float dot's last-ulp could flip a near-zero sign between
        engines that sum in different orders.
    Quantization shifts each hyperplane by < 0.1% — irrelevant to LSH
    quality (the planes are arbitrary to begin with)."""
    import hashlib

    planes = np.empty((dim, n_bits), dtype=np.int64)
    for j in range(n_bits):
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"rp:{j}:{d}".encode()).digest()[:4], "big")
            planes[d, j] = h % 2001 - 1000

    @F.pandas_udf(T.LongType())
    def sign_sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        q = np.floor(mat * 1000.0).astype(np.int64)
        bits = (q @ planes) > 0  # exact integer dots
        packed = (bits.astype(np.uint64) << np.arange(n_bits, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(packed.astype(np.int64))

    return sign_sig


def auto_n_cells(n_docs: int, docs_per_cell: int = 5000, floor: int = 16) -> int:
    """The IVF sizing rule (semantic.py module docstring): n_cells ~
    N / docs_per_cell, floored at 16.  docs_per_cell=5000 keeps the expected
    within-cell quadratic work ~25M comparisons per cell — at 10^9 docs the
    default 16 cells would make the within-cell self-join the whole job, so
    every cell-blocked operator derives its cell count from the corpus size
    unless the caller pins one explicitly."""
    return max(floor, -(-n_docs // docs_per_cell))


def quantize_int(mat: np.ndarray) -> np.ndarray:
    """floor(v * 1000) as int64 — the same exact-arithmetic portability trick
    as make_portable_sign_signature_udf: float32 -> float64 is exact, *1000
    rounds identically under IEEE-754, floor is exact, so every engine gets
    the SAME integers and integer distances are order-deterministic."""
    return np.floor(mat.astype(np.float64) * 1000.0).astype(np.int64)


def portable_centroids(
    corpus: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Engine-independent IVF centroids: the n_cells corpus vectors with the
    smallest md5('ivf:' || id) — a deterministic pseudo-random sample any SQL
    engine can rebuild (ORDER BY md5(...) LIMIT n_cells), quantized to
    integers so cell assignment is exact integer arithmetic.  Data-sampled
    centroids are the classic zero-iteration IVF seeding; the production
    kmeans_centroids refines them when replayability is not required.
    Bounded driver collect: n_cells rows (n_cells ~ sqrt(corpus) in practice,
    kept small here)."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.concat(F.lit("ivf:"), F.col("_id").cast("string"))))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .collect()
    )
    mat = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    return quantize_int(mat)


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 1337,
    max_iter: int = 20,
    sample_rows: int = 200_000,
) -> np.ndarray:
    """Production IVF training: Lloyd-refined centroids via Spark ML KMeans
    on a bounded sample (training the coarse quantizer on a sample is the
    standard IVF recipe — the assignment pass below still covers EVERY
    corpus vector).  Returns float64 (n_cells, dim)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    n = train.count()
    if n > sample_rows:
        train = train.sample(fraction=sample_rows / n, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    return np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])


def _make_cell_udfs(cents: np.ndarray, n_probe: int, quantized: bool):
    """(assign_udf, probe_udf) over a fixed centroid matrix.

    Distance = squared L2, expanded as |v|^2 - 2 v.C^T + |c|^2 — one matmul
    per Arrow batch.  With quantized=True everything is int64 (|values| <
    64 * (2*10^6)^2 < 2^53, also exact when an oracle engine computes the
    same expansion in doubles); ties break toward the smaller cell index in
    every engine (numpy argmin/stable argsort take the first minimum)."""
    c_sq = (cents * cents).sum(axis=1)  # (n_cells,)

    def _dists(vecs: pd.Series) -> np.ndarray:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if quantized:
            mat = quantize_int(mat)
        v_sq = (mat * mat).sum(axis=1, keepdims=True)
        return v_sq - 2 * (mat @ cents.T) + c_sq[None, :]

    @F.pandas_udf(T.IntegerType())
    def assign_cell(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(np.argmin(_dists(vecs), axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        order = np.argsort(_dists(vecs), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return assign_cell, probe_cells


def ivf_build(
    corpus: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "kmeans",
    seed: int = 1337,
) -> tuple[DataFrame, np.ndarray, bool]:
    """Build the persistent IVF index: (index_df, centroid_matrix, quantized).

    index_df is (neighbor_id, cv, c_norm, cell) — the inverted lists as a
    table.  At 100 TB this is written ONCE as a parquet/Iceberg table
    ``.write.partitionBy("cell")`` (partition pruning then makes each probe
    read exactly its lists); every later query batch joins against it with
    no assignment recompute (ivf_topk(index=...)).  No repartition here —
    inline, the small query side broadcasts and the corpus never shuffles.
    The centroid matrix (n_cells x dim) is the tiny driver-side artifact to
    persist next to it (np.save / a 1-row table).

    centroids: 'kmeans' (production, Spark ML Lloyd refinement) or
    'portable' (md5-sampled integer centroids a SQL oracle replays exactly —
    see portable_centroids).

    n_cells=None (default) derives the cell count from the corpus size via
    auto_n_cells (~N/5000, floor 16) — one count() the quantizer training
    pays anyway; pass an explicit n_cells to pin it."""
    if n_cells is None:
        n_cells = auto_n_cells(corpus.count())
    if centroids == "portable":
        cents = portable_centroids(corpus, n_cells, id_col, vec_col)
        quantized = True
    else:
        cents = kmeans_centroids(corpus, n_cells, vec_col, seed)
        quantized = False
    assign_cell, _ = _make_cell_udfs(cents, 1, quantized)
    index = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("c_norm"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    return index, cents, quantized


def ivf_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "kmeans",
    seed: int = 1337,
    index: tuple[DataFrame, np.ndarray, bool] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: (query_id, neighbor_id, rank, cosine).

    Either pass a raw corpus (the index is built inline via ivf_build) or a
    prebuilt ``index=ivf_build(...)`` triple to amortize the assignment pass
    across query batches — the production shape.

    Plan shape (the 100 TB story): the corpus-side (id, vector, cell) table
    is the persistent index — computed once, hash-partitioned/bucketed by
    cell.  Queries explode to n_probe (query, cell) rows and equi-join on
    cell, so each query streams n_probe inverted lists instead of the
    corpus; the exact cosine runs only inside probed cells.  No cross join
    ever materializes, and the centroid matrix (n_cells x dim) rides in the
    UDF closure — broadcast-sized by construction."""
    if index is None:
        if corpus is None:
            raise ValueError("ivf_topk needs a corpus or a prebuilt index")
        index = ivf_build(corpus, n_cells, id_col, vec_col, centroids, seed)
    c, cents, quantized = index
    _, probe_cells = _make_cell_udfs(cents, n_probe, quantized)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    # every corpus vector lives in exactly ONE cell, so a (query, neighbor)
    # pair appears at most once — no post-join dedup exchange needed
    scored = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _blocks(sig: Column, n_bits: int, n_blocks: int) -> Column:
    width = n_bits // n_blocks
    mask = F.lit((1 << width) - 1)
    return F.array(
        *[F.shiftrightunsigned(sig, i * width).bitwiseAND(mask) for i in range(n_blocks)]
    )


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 64,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1337,
    planes: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing at least one
    sign-signature block with the query; exact cosine re-rank on candidates.

    planes: 'gaussian' (production, seeded numpy hyperplanes) or 'portable'
    (md5-derived integer hyperplanes a SQL oracle can replay exactly — see
    make_portable_sign_signature_udf).

    At 100 TB the corpus side is computed once and persisted (the signature
    table is the 'index'); queries probe it with an equi-join on
    (block_idx, block_value) — no cross join ever materializes."""
    if planes == "portable":
        sig_udf = make_portable_sign_signature_udf(dim, n_bits)
    else:
        sig_udf = make_sign_signature_udf(dim, n_bits, seed)

    def with_blocks(df: DataFrame, prefix: str) -> DataFrame:
        # norm computed once per vector here; downstream re-rank would
        # otherwise re-evaluate it per candidate pair
        sigged = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_v"),
            norm(F.col(vec_col)).alias(f"{prefix}_norm"),
        ).withColumn("sig", sig_udf(f"{prefix}_v"))
        return sigged.select(
            f"{prefix}_id",
            f"{prefix}_v",
            f"{prefix}_norm",
            F.posexplode(_blocks(F.col("sig"), n_bits, n_blocks)).alias(
                "block_idx", "block_val"
            ),
        )

    c = with_blocks(corpus, "n")
    q = with_blocks(queries, "q")
    cands = (
        q.join(c, ["block_idx", "block_val"])
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("q_v").alias("qv"),
            F.col("n_v").alias("cv"),
            F.col("q_norm"),
            F.col("n_norm"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine", dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("n_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
