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


def centroid_seeds(
    corpus: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """Deterministic centroid sample via HASH-STRIDE: keep rows whose
    ``xxhash64(id) % stride == 0`` (≈ 2·n_cells expected survivors), then the
    n_cells lowest ids among them. No global window — the filter is a map-side
    predicate and the tail pick is a distributed TakeOrdered over the ~2·n_cells
    survivors, so seeding stays O(scan) with no single-task stage at any corpus
    size."""
    if n is None:
        n = corpus.count()
    stride = max(n // max(n_cells * 2, 1), 1)
    return (
        corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .orderBy(F.asc(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_centroid"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", n_cells: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t) —
    EXACT output, blocked pair space.

    Angular cell blocking with a triangle-inequality recall GUARANTEE
    (angular distance is a metric on the unit sphere):

    1. centroids  : hash-stride sample (``centroid_seeds``), broadcast.
    2. assign     : each vector → nearest centroid (max cosine), recording
                    its angle to the centroid; per-vector window (uniform).
    3. radii      : r_i = max member angle per cell.
    4. cell pairs : keep (i ≤ j) with angle(c_i, c_j) ≤ θ_t + r_i + r_j —
                    any qualifying vector pair MUST lie in such a cell pair,
                    so no candidate is ever lost (worst case degrades to
                    all-pairs, never to missed pairs).
    5. verify     : members of candidate cell pairs score exact cosine via
                    the Arrow ``cosine_kernel`` (batched einsum).

    The O(n²) nested-loop of the naive formulation never runs: the pair join
    is keyed by cell, and pruning tracks how clustered the corpus is. Each
    vector lives in exactly one cell, so each unordered pair is generated at
    most once — no distinct needed.
    """
    import math

    theta_t = math.acos(max(min(threshold, 1.0), -1.0))
    eps = 1e-9
    v = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("_v"))
    seeds = centroid_seeds(emb, n_cells, id_col, vec_col)

    w = Window.partitionBy("vid").orderBy(F.desc("_sim"), F.asc("cell_id"))
    assigned = (
        v.crossJoin(F.broadcast(seeds))
        .withColumn("_sim", cosine_kernel("_v", "_centroid"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn(
            "_angle", F.acos(F.least(F.greatest("_sim", F.lit(-1.0)), F.lit(1.0)))
        )
        .select("vid", "_v", "cell_id", "_angle")
    )
    radii = assigned.groupBy("cell_id").agg(F.max("_angle").alias("radius"))

    cent = seeds.join(radii, "cell_id").select(
        F.col("cell_id"), F.col("_centroid"), F.col("radius")
    )
    pairs_bound = (
        cent.alias("x")
        .crossJoin(cent.alias("y"))
        .filter(F.col("x.cell_id") <= F.col("y.cell_id"))
        .withColumn(
            "_csim", cosine_kernel(F.col("x._centroid"), F.col("y._centroid"))
        )
        .withColumn(
            "_cangle",
            F.acos(F.least(F.greatest("_csim", F.lit(-1.0)), F.lit(1.0))),
        )
        .filter(
            F.col("_cangle")
            <= F.lit(theta_t + eps) + F.col("x.radius") + F.col("y.radius")
        )
        .select(
            F.col("x.cell_id").alias("cell_a"), F.col("y.cell_id").alias("cell_b")
        )
    )

    members = assigned.select("vid", "_v", "cell_id")
    left = members.join(
        F.broadcast(pairs_bound), members["cell_id"] == pairs_bound["cell_a"]
    ).select(F.col("vid").alias("ida"), F.col("_v").alias("_va"), "cell_a", "cell_b")
    cand = left.join(
        members.select(
            F.col("vid").alias("idb"),
            F.col("_v").alias("_vb"),
            F.col("cell_id").alias("cell_b"),
        ),
        "cell_b",
    ).filter(
        (F.col("cell_a") < F.col("cell_b")) | (F.col("ida") < F.col("idb"))
    )
    return (
        cand.withColumn("cosine", F.round(cosine_kernel("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "cosine",
        )
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
    """IVF search: deterministic hash-stride centroid seeds (``centroid_seeds``
    — a map-side predicate + small TakeOrdered, NO global window over the
    corpus), one assignment pass, probe the nprobe nearest cells per query,
    exact re-rank inside."""
    seeds = centroid_seeds(corpus, n_cells, id_col, vec_col)
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
