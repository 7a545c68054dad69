"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus examples whose hashed-n-gram profile
looks like a high-quality TARGET corpus. The production method behind
"select web data that looks like Wikipedia" pretraining mixes.

Faithful shape, engine-exact arithmetic:

- features: hashed bigram counts — bucket = portable Rabin-Karp hash of
  "w1|w2" mod ``n_buckets`` (the paper's hashed n-gram featurization);
- two bag-of-buckets unigram models with add-one smoothing,
  p_b = (c_target[b]+1)/(N_target+B) and q_b likewise over the raw pool;
- per-OCCURRENCE importance increment, quantized to an integer before any
  aggregation (the lm.py discipline): wq(b) = floor((ln p_b − ln q_b)·2^20).
  Both logs act on fixed two-division expression trees over exact integer
  counts, so the doubles — and hence the floors — are bit-identical in
  DuckDB; the per-document log-weight is then an INT64 sum,
  shuffle-order-independent;
- resampling: Gumbel-top-k, with the Gumbel drawn DETERMINISTICALLY from
  the document id's portable unit hash (g = −ln(−ln(u)), u ∈ (0,1)) —
  the paper's sampling-without-replacement trick with a seed that any
  engine can replay; ``gumbel=False`` degrades to plain top-k by weight;
- selection: global top-k by quantized score (TakeOrdered — no global
  window; k is the caller's budget).

Scale: two explode→groupBy count jobs (models are B-sized, broadcast);
scoring = one explode + a broadcast join on the bucket id + a doc-keyed
integer agg; selection is a distributed top-k. No corpus-wide window, no
Python stage, no collect beyond the k-row result.

Reference analog: none — this belongs to the beyond-the-reference
training-data suite (README), alongside perplexity bucketing (lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import porthash
from .lm import _TOKS_SQL
from .sampling import _id_unit, _id_unit_sql
from .textstats import tokens_expr

TARGET_MEMBER = 48  # affine member: deterministic target/raw pool split
GUMBEL_MEMBER = 49  # affine member: per-id Gumbel seed
TARGET_FRACTION = 0.25
N_BUCKETS = 512
WQ = 1 << 20  # fixed-point quantum for log-weights

# u ∈ [0,1) → (0,1): affine squeeze with explicit constants so the SQL
# mirror is byte-identical; keeps ln(−ln(u)) finite at u = 0
_EPS = 1e-9


def _bigram_buckets(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bucket) — one row per bigram OCCURRENCE (counts matter)."""
    t = tokens_expr(text_col)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(t, F.lit(1), n1),
        F.slice(t, F.lit(2), n1),
        lambda a, b: F.concat_ws("|", a, b),
    )
    return docs.select(F.col(id_col), F.explode_outer(pairs).alias("g")).select(
        id_col, F.pmod(porthash.poly_hash(F.col("g")), F.lit(N_BUCKETS)).alias("b")
    )


def _bucket_counts(grams: DataFrame) -> DataFrame:
    return grams.filter(F.col("b").isNotNull()).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def dsir_select(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_fraction: float = TARGET_FRACTION,
    gumbel: bool = True,
) -> DataFrame:
    """Select ``k`` raw-pool documents by importance resampling against the
    deterministic in-corpus target split (stand-in for an external target
    corpus — swap the split predicate for a real target table in
    production; every downstream plan is unchanged). Output: (id, n_grams,
    logw_q, score_q, sel_rank), highest score first."""
    is_target = _id_unit(id_col, TARGET_MEMBER) < F.lit(float(target_fraction))
    target = docs.filter(is_target)
    raw = docs.filter(~is_target)

    tc = _bucket_counts(_bigram_buckets(target, text_col, id_col))
    rc = _bucket_counts(_bigram_buckets(raw, text_col, id_col))
    tt = tc.agg(F.sum("c").cast("long").alias("nt"))
    rt = rc.agg(F.sum("c").cast("long").alias("nr"))

    # model over the CONSTANT bucket universe: a full-outer tc⟗rc cannot
    # broadcast (Spark streams both sides of a full outer → sort-merge);
    # range(n_buckets) as the stream side with both count tables broadcast
    # keeps the model build shuffle-free and is value-identical (every
    # observed gram bucket is in rc by construction)
    universe = docs.sparkSession.range(N_BUCKETS).select(F.col("id").alias("b"))
    model = (
        universe.join(F.broadcast(tc.select("b", F.col("c").alias("ct"))), "b", "left")
        .join(F.broadcast(rc.select("b", F.col("c").alias("cr"))), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    # fixed expression tree over exact ints (bit-identical in DuckDB)
    pt = (F.coalesce("ct", F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("nt") + F.lit(N_BUCKETS)
    ).cast("double")
    pr = (F.coalesce("cr", F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("nr") + F.lit(N_BUCKETS)
    ).cast("double")
    model = model.select(
        "b", F.floor((F.log(pt) - F.log(pr)) * F.lit(float(WQ))).alias("wq")
    )

    grams = _bigram_buckets(raw, text_col, id_col)
    scored = (
        grams.join(F.broadcast(model), "b", "left")
        .groupBy(id_col)
        .agg(
            F.count("b").cast("long").alias("n_grams"),
            F.coalesce(F.sum("wq"), F.lit(0)).cast("long").alias("logw_q"),
        )
    )
    if gumbel:
        u = _id_unit(id_col, GUMBEL_MEMBER) * F.lit(1.0 - 2 * _EPS) + F.lit(_EPS)
        noise = F.floor(-F.log(-F.log(u)) * F.lit(float(WQ))).cast("long")
    else:
        noise = F.lit(0).cast("long")
    scored = scored.withColumn("score_q", F.col("logw_q") + noise)
    top = scored.orderBy(F.desc("score_q"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score_q"), F.asc(id_col))  # k rows only
    return top.withColumn("sel_rank", F.row_number().over(w))


def dsir_select_sql(
    k: int,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    target_fraction: float = TARGET_FRACTION,
    gumbel: bool = True,
) -> str:
    """DuckDB mirror of :func:`dsir_select` — identical tokenizer, hash,
    smoothing expression trees, quantization, Gumbel seed, and tie-break."""
    toks = _TOKS_SQL.format(col=text_col)
    unit_t = _id_unit_sql(id_col, TARGET_MEMBER)
    unit_g = _id_unit_sql(id_col, GUMBEL_MEMBER)
    bucket = (
        "CAST(((" + porthash.poly_hash_sql("w1 || '|' || w2")
        + f") % {N_BUCKETS} + {N_BUCKETS}) % {N_BUCKETS} AS BIGINT)"
    )
    noise = (
        f"CAST(floor(-ln(-ln(({unit_g}) * {1.0 - 2 * _EPS!r} + {_EPS!r}))"
        f" * {float(WQ)!r}) AS BIGINT)"
        if gumbel
        else "CAST(0 AS BIGINT)"
    )
    return f"""
WITH d AS (SELECT {id_col}, {toks} AS toks, ({unit_t}) < {target_fraction!r} AS tgt
           FROM {table}),
grams AS (
  SELECT {id_col}, tgt, {bucket} AS b
  FROM (
    SELECT {id_col}, tgt,
           toks[i] AS w1, toks[i + 1] AS w2
    FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  )
),
tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM grams WHERE tgt GROUP BY b),
rc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM grams WHERE NOT tgt GROUP BY b),
tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tc),
rt AS (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS nr FROM rc),
model AS (
  SELECT coalesce(tc.b, rc.b) AS b,
         CAST(floor((ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)
                        / CAST(nt + {N_BUCKETS} AS DOUBLE))
                   - ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE)
                        / CAST(nr + {N_BUCKETS} AS DOUBLE))) * {float(WQ)!r})
              AS BIGINT) AS wq
  FROM tc FULL OUTER JOIN rc ON tc.b = rc.b CROSS JOIN tt CROSS JOIN rt
),
scored AS (
  SELECT g.{id_col},
         CAST(count(g.b) AS BIGINT) AS n_grams,
         CAST(coalesce(sum(m.wq), 0) AS BIGINT) AS logw_q
  FROM grams g LEFT JOIN model m ON g.b = m.b
  WHERE NOT g.tgt GROUP BY g.{id_col}
),
base AS (
  SELECT d.{id_col},
         coalesce(s.n_grams, 0) AS n_grams,
         coalesce(s.logw_q, 0) AS logw_q,
         coalesce(s.logw_q, 0) + {noise} AS score_q
  FROM d LEFT JOIN scored s USING ({id_col})
  WHERE NOT d.tgt
)
SELECT {id_col}, n_grams, logw_q, score_q,
       CAST(row_number() OVER (ORDER BY score_q DESC, {id_col} ASC) AS INTEGER)
           AS sel_rank
FROM base
ORDER BY score_q DESC, {id_col} ASC LIMIT {int(k)}
"""
