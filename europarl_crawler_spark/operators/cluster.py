"""Integer-exact Lloyd k-means over embedding vectors — the clustering
primitive behind corpus curation recipes (SemDeDup's cluster-scoped dedup,
topic-balanced mixtures, cluster-pruned training sets) and IVF index
training.  ``operators/similarity.py`` already uses one-shot hash-stride
seeds as IVF cells; this runs real Lloyd refinement rounds on them.

Cross-engine exactness (the house contract): embeddings quantize to
int64 fixed-point ONCE —

    qv[d] = floor(double(v[d]) * 2^20)

(the *2^20 scaling is a power of two, so the double multiply is exact) —
and from there every computation is exact integer algebra: squared-L2
distance is a scalar-accumulator fold of (x-c)^2 (int64: |x-c| < 2^22,
64 dims → < 2^50), assignment is argmin with (dist, cell) tie-break, and
the centroid update is floor(sum/count) computed as floor() of an exact
double division (|sum| < 2^41 « 2^53).  The DuckDB oracle replays seeds,
every round's assignment, and every centroid coordinate bit-for-bit.

Plan shape at 100 TB: k centroids (k·dims ints) live on the DRIVER and
enter each assignment pass as literal arrays — the classic broadcast-
k-means; per round the corpus is touched twice (assign = one projection,
update = posexplode + (cell, dim)-keyed groupBy, map-side combinable,
k·dims result rows).  Lloyd rounds are inherently sequential, so the
per-round driver round-trip carries exactly k·dims integers — same
bounded-collect contract as the BPE trainer (operators/bpe.py).  At the
10^9-vector scale you additionally cache the quantized frame across
rounds; the loop below keeps the plan identical without the pin so the
oracle's input is a plain scan.

Reference analog: none (the reference has no vector surface); this is
part of the LLM-data platform layer, and the trained centroids slot
directly into ``similarity.ivf_topk`` as a better cell map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import porthash
from .similarity import centroid_seeds, estimated_count

QUANT = 1 << 20  # fixed-point quantum for embedding coordinates


def quantize_expr(vec_col: str):
    """float[] -> exact int64 fixed-point array."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long"),
    )


def _dist(qv, cent: list[int]):
    """Exact int64 squared L2 between a column array and a literal centroid."""
    lit = F.array([F.lit(int(c)).cast("long") for c in cent])
    return F.aggregate(
        F.zip_with(qv, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def _assign(points: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """(vec_id, qv, cell_id, dist_q): argmin over the literal centroids,
    ties broken by cell id — one projection, no shuffle."""
    choices = F.array(
        *[
            F.struct(
                _dist(F.col("qv"), c).alias("d"),
                F.lit(int(cell)).cast("long").alias("cell"),
            )
            for cell, c in sorted(cents.items())
        ]
    )
    m = F.array_min(choices)
    return points.select(
        "vec_id", "qv", m["cell"].alias("cell_id"), m["d"].alias("dist_q")
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """Run ``rounds`` Lloyd iterations from portable hash-stride seeds;
    returns the final assignment (vec_id, cell_id, dist_q).  Cell ids are
    the seed vectors' ids (stable, engine-neutral)."""
    if n is None:
        n = estimated_count(emb)
    points = emb.select(
        F.col(id_col).alias("vec_id"), quantize_expr(vec_col).alias("qv")
    )
    seeds = centroid_seeds(
        points, k, n, id_col="vec_id", vec_col="qv", portable=True
    ).collect()
    cents = {int(r["cell_id"]): [int(x) for x in r["_centroid"]] for r in seeds}
    dims = len(next(iter(cents.values())))
    for _ in range(rounds):
        assigned = _assign(points, cents)
        upd = (
            assigned.select("cell_id", F.posexplode("qv").alias("p", "v"))
            .groupBy("cell_id", "p")
            .agg(
                F.floor(
                    F.sum("v").cast("double") / F.count(F.lit(1))
                ).cast("long").alias("val")
            )
            .collect()
        )
        new = {}
        for r in upd:
            new.setdefault(int(r["cell_id"]), [0] * dims)[int(r["p"])] = int(
                r["val"]
            )
        # empty cells keep their previous centroid
        cents = {cell: new.get(cell, c) for cell, c in cents.items()}
    return _assign(points, cents).select("vec_id", "cell_id", "dist_q")


def kmeans_topk(
    emb: DataFrame,
    k_clusters: int = 8,
    rounds: int = 2,
    nprobe: int = 2,
    k: int = 10,
    n_queries: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """ANN top-k over the Lloyd-trained cells — the payoff of
    ``kmeans_assign``: corpus vectors index into their final cell, each
    query probes its ``nprobe`` nearest centroids and exact-re-ranks only
    inside those cells (the IVF search pattern of similarity.ivf_topk, but
    on refined centroids and exact integer L2 throughout).  Queries are the
    ``n_queries`` lowest-id vectors; the query itself is excluded from its
    result.  Output: (query_id, rank, vec_id, dist_q).

    Plan: training as in ``kmeans_assign``; the probe set is an
    array_sort over k literal centroid distances (no shuffle); candidates
    come from a cell-keyed join against the assignment (≈ nprobe/k of the
    corpus per query); the final window partitions by query id."""
    if n is None:
        n = estimated_count(emb)
    points = emb.select(
        F.col(id_col).alias("vec_id"), quantize_expr(vec_col).alias("qv")
    )
    seeds = centroid_seeds(
        points, k_clusters, n, id_col="vec_id", vec_col="qv", portable=True
    ).collect()
    cents = {int(r["cell_id"]): [int(x) for x in r["_centroid"]] for r in seeds}
    dims = len(next(iter(cents.values())))
    for _ in range(rounds):
        assigned = _assign(points, cents)
        upd = (
            assigned.select("cell_id", F.posexplode("qv").alias("p", "v"))
            .groupBy("cell_id", "p")
            .agg(
                F.floor(
                    F.sum("v").cast("double") / F.count(F.lit(1))
                ).cast("long").alias("val")
            )
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in upd:
            new.setdefault(int(r["cell_id"]), [0] * dims)[int(r["p"])] = int(
                r["val"]
            )
        cents = {cell: new.get(cell, c) for cell, c in cents.items()}

    indexed = _assign(points, cents).select("vec_id", "qv", "cell_id")
    qs = (
        points.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"))
    )
    choices = F.array(
        *[
            F.struct(
                _dist(F.col("qqv"), c).alias("d"),
                F.lit(int(cell)).cast("long").alias("cell"),
            )
            for cell, c in sorted(cents.items())
        ]
    )
    probes = qs.select(
        "query_id",
        "qqv",
        F.explode(F.slice(F.array_sort(choices), 1, nprobe)).alias("pr"),
    ).select("query_id", "qqv", F.col("pr.cell").alias("cell_id"))
    exact = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    cand = (
        probes.join(indexed, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", exact.alias("dist_q"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_q"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "dist_q")
    )


def kmeans_topk_sql(
    k_clusters: int = 8,
    rounds: int = 2,
    nprobe: int = 2,
    k: int = 10,
    n_queries: int = 5,
    dims: int = 64,
    table: str = "embeddings",
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror: the ``kmeans_assign_sql`` CTE chain, then the same
    probe selection (dist, cell ascending), cell-keyed candidates, exact
    integer re-rank, and (dist, vec_id) top-k window."""
    base = kmeans_assign_sql(
        k_clusters, rounds, dims, table, id_expr, vec_expr
    )
    # keep everything up to (and including) the fin CTE; replace the final
    # SELECT with the probe/re-rank stages
    head, _, _ = base.rpartition("\nSELECT vec_id,")
    qdist = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "[(z[1] - z[2]) * (z[1] - z[2]) FOR z IN list_zip(qqv, c)]), "
        "(a, b) -> a + b)"
    )
    exact = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "[(z[1] - z[2]) * (z[1] - z[2]) FOR z IN list_zip(qqv, qv)]), "
        "(a, b) -> a + b)"
    )
    return f"""{head},
qs AS (SELECT vec_id AS query_id, qv AS qqv FROM e ORDER BY vec_id LIMIT {n_queries}),
pr AS (SELECT query_id, qqv, cell FROM (
         SELECT q.query_id, q.qqv, s.cell, {qdist} AS d,
                row_number() OVER (PARTITION BY q.query_id
                     ORDER BY d ASC, s.cell ASC) AS rn
         FROM qs q CROSS JOIN c{rounds} s) WHERE rn <= {nprobe}),
cand AS (SELECT pr.query_id, f.vec_id, {exact} AS dist_q
         FROM pr JOIN fin f ON f.cell = pr.cell
         WHERE f.vec_id != pr.query_id),
rk AS (SELECT query_id, vec_id, dist_q,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY dist_q ASC, vec_id ASC) AS INT) AS rank
       FROM cand)
SELECT query_id, rank, vec_id, CAST(dist_q AS BIGINT) AS dist_q
FROM rk WHERE rank <= {k}
"""


def kmeans_assign_sql(
    k: int = 8,
    rounds: int = 2,
    dims: int = 64,
    table: str = "embeddings",
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror: same quantization, same portable seed stride, same
    per-round argmin (dist, cell) and floor(sum/count) centroid updates —
    one CTE trio (a{r} assign / u{r} update / c{r} centroids) per round."""
    qv = (
        f"[CAST(floor(CAST(x AS DOUBLE) * {float(QUANT)!r}) AS BIGINT) "
        f"FOR x IN {vec_expr}]"
    )
    dist = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "[(z[1] - z[2]) * (z[1] - z[2]) FOR z IN list_zip(qv, c)]), "
        "(a, b) -> a + b)"
    )
    stride_h = porthash.affine_sql(
        f"(CAST(vec_id AS BIGINT) % {porthash.P})", 0
    )
    parts = [
        f"e AS (SELECT {id_expr} AS vec_id, {qv} AS qv FROM {table})",
        f"cnt AS (SELECT greatest(count(*) // {k * 2}, 1) AS stride FROM e)",
        f"c0 AS (SELECT vec_id AS cell, qv AS c FROM e, cnt "
        f"WHERE ({stride_h}) % stride = 0 ORDER BY vec_id LIMIT {k})",
    ]

    def assign_sel(prev: int) -> str:
        return (
            "SELECT vec_id, qv, cell, dist FROM ("
            f"SELECT e.vec_id, e.qv, s.cell, {dist} AS dist, "
            "row_number() OVER (PARTITION BY e.vec_id "
            "ORDER BY dist ASC, s.cell ASC) AS rn "
            f"FROM e CROSS JOIN c{prev} s) WHERE rn = 1"
        )

    for r in range(1, rounds + 1):
        parts.append(f"a{r} AS ({assign_sel(r - 1)})")
        parts.append(
            f"u{r} AS (SELECT cell, list(val ORDER BY p) AS cv FROM ("
            "SELECT cell, p, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) "
            "AS BIGINT) AS val FROM ("
            f"SELECT cell, unnest(generate_series(1, {dims})) AS p, "
            f"unnest(qv) AS v FROM a{r}) GROUP BY cell, p) GROUP BY cell)"
        )
        parts.append(
            f"c{r} AS (SELECT s.cell, COALESCE(u.cv, s.c) AS c "
            f"FROM c{r - 1} s LEFT JOIN u{r} u ON u.cell = s.cell)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f",\nfin AS ({assign_sel(rounds)})\n"
        + "SELECT vec_id, CAST(cell AS BIGINT) AS cell_id, "
        "CAST(dist AS BIGINT) AS dist_q FROM fin"
    )
