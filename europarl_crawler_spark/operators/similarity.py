"""Similarity search over an embedding column (array<float>).

- ``cosine_expr``       : dot/norm as JVM-side higher-order functions
                          (zip_with + aggregate) — no UDF, codegen'd.
- ``brute_force_topk``  : exact top-k neighbors per query — the correctness
                          baseline. Query side is broadcast (queries ≪ corpus),
                          so the corpus never shuffles; top-k is a per-query
                          window, not a global sort.
- ``lsh_topk``          : random-hyperplane (SRP) LSH bucketed search — the
                          scale path: probe only colliding buckets, exact
                          re-rank inside. Recall < 1 by construction; the
                          baseline exists to measure it.
- ``ivf_topk``          : IVF-style two-stage search with k-means-lite
                          centroids (sampled seeds, one Lloyd pass) — probe
                          the nprobe nearest cells only.

Embedding-cosine near-dup pairs (dedup lane 5) reuse the same kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


_COS_KERNEL = None


def cosine_kernel(a, b) -> Column:
    """Arrow-vectorized cosine over paired array columns: one einsum per
    batch instead of an interpreted higher-order-function walk per pair —
    the hot-path kernel for all-pairs / candidate-pair scoring. Float64
    throughout (inputs are cast upstream), matching the oracle's arithmetic
    to well under the 1e-6 rounding grain. (Built lazily: pandas_udf
    registration needs an active SparkSession.)"""
    global _COS_KERNEL
    if _COS_KERNEL is None:

        @pandas_udf("double")
        def _kernel(x: pd.Series, y: pd.Series) -> pd.Series:
            A = np.stack(x.to_numpy())
            B = np.stack(y.to_numpy())
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            return pd.Series(num / den)

        _COS_KERNEL = _kernel
    return _COS_KERNEL(_c(a), _c(b))


def dot_expr(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a, b) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, per-query window.

    Deterministic: ties broken by neighbor id. Output:
    (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_bucket_expr(vec, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: sign bits against fixed
    hyperplanes, packed into a long. Planes are literals (broadcast into the
    plan), so the whole thing is one codegen'd expression."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot_expr(vec, arr) > 0).cast("long")
        acc = acc + F.shiftleft(bit, i)
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """SRP-LSH search: join on bucket id, exact re-rank within bucket.

    At scale the corpus is written bucket-partitioned (bucketBy on bucket id)
    so the probe is a partition-pruned scan, not a shuffle.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        srp_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        srp_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Exact all-pairs; scoring runs through the Arrow ``cosine_kernel``
    (batched einsum) rather than per-pair interpreted expressions. The LSH
    variant prunes the pair space at scale (same verify).
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_kernel("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: deterministic seeded centroids (every ⌈n/n_cells⌉-th vector
    by id — reproducible without RNG), one assignment pass, probe the nprobe
    nearest cells per query, exact re-rank inside."""
    n = corpus.count()
    stride = max(n // n_cells, 1)
    w_id = Window.orderBy(F.asc(id_col))
    seeds = (
        corpus.withColumn("_rn", F.row_number().over(w_id))
        .filter((F.col("_rn") % stride) == 1)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_centroid"))
    )
    assign_w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell_id"))
    assigned = (
        corpus.crossJoin(F.broadcast(seeds))
        .withColumn("_sim", cosine_expr(vec_col, "_centroid"))
        .withColumn("_rn", F.row_number().over(assign_w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cell_id")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    probes = (
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .crossJoin(F.broadcast(seeds))
        .withColumn("_sim", cosine_expr("_qv", "_centroid"))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "cell_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
