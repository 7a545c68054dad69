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
