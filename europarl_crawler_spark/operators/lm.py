"""In-corpus n-gram language-model perplexity scoring and bucketing — the
CCNet corpus-curation step (Wenzek et al. 2020: score every page with a
KenLM 5-gram model, cut the corpus into head/middle/tail perplexity
buckets; RedPajama/Dolma reuse the same gate).

Model here is an interpolated bigram LM trained on a deterministic hash
split of the corpus itself (no external data): Jelinek-Mercer mixture of
the bigram MLE and a Laplace unigram,

    p(w2 | w1) = 1/2 * c(w1,w2)/(c(w1)+1)  +  1/2 * (c(w2)+1)/(N+V)
    p(w)                                   =       (c(w)+1)/(N+V)   (doc start)

with N = train token count, V = train vocab size. Every count is an exact
integer; each probability is a fixed two-division expression tree over
those integers, so the IEEE result is bit-identical in Spark and DuckDB
(the cosine-lane precedent). The ONLY transcendental is one per-token
``ln`` on that identical double, immediately quantized to an integer cost

    cost_q(token) = floor(-ln(p) * 2^20)

so the document-level aggregate is an INT64 sum — order-of-summation
independent, shuffle-safe, and oracle-comparable (a double sum would not
survive a partition-order change, let alone a cross-engine compare).

Plan shape — the canonical one for LM scoring at 100 TB:
  * training: two explode -> groupBy counts (map-side combinable); the
    model is vocab-/bigram-table sized, never corpus sized, and prunable
    with a min-count like production KenLM;
  * scoring: one explode + token-keyed joins against the model tables
    (the unigram table broadcasts; the bigram join shuffles on the pair
    key or broadcasts once pruned) + a doc-keyed integer agg. No global
    state, no windows, no Python stages.
In production the cost table is a trained KenLM dumped to (gram, cost_q)
rows — the scoring plan downstream is identical.

Bucket thresholds are pinned constants (nats/token x100, exact integer
compares). CCNet derives them as corpus terciles from a sampled quantile
job; pinning keeps the lane deterministic — swap in sampled cuts the same
way CCNet does when operating a real crawl.

Reference analog: the reference keeps only structural quality gates
(europarl/documents/extractors.py filters empty extractions); perplexity
bucketing is the learned-curation complement every LLM-data pipeline adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import porthash
from .sampling import _id_unit, _id_unit_sql
from .textstats import tokens_expr

LM_TRAIN_MEMBER = 47  # porthash affine member for the train/score split
LM_TRAIN_FRACTION = 0.5
COST_Q = 1 << 20  # fixed-point quantum: cost_q = floor(-ln(p) * 2^20)

# bucket cuts in (nats/token * 100), exact integer compares — see module doc.
# Pinned at the synthetic corpus's terciles (stable 3.39/3.42 across sf0.001
# and sf0.01); a real crawl re-derives them from a sampled quantile job.
HEAD_NATS_X100 = 339
MIDDLE_NATS_X100 = 342

_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-zA-Z0-9'']+'), "
    "x -> x <> '')"
)


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(F.col(id_col), tokens_expr(text_col).alias("toks"))


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = LM_TRAIN_FRACTION,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(unigram counts ``w, cw``; bigram counts ``w1, w2, c12``; one-row
    totals ``N, V``) over the deterministic train split. All exact longs."""
    train = _doc_tokens(
        docs.filter(_id_unit(id_col, LM_TRAIN_MEMBER) < F.lit(train_fraction)),
        text_col,
        id_col,
    )
    uni = (
        train.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cw"))
    )
    t = F.col("toks")
    n1 = F.greatest(F.size(t) - 1, F.lit(0))  # empty array => slice len 0, not -1
    pairs = F.zip_with(
        F.slice(t, F.lit(1), n1),
        F.slice(t, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        train.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    totals = uni.agg(
        F.sum("cw").cast("long").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("v_train"),
    )
    return uni, big, totals


def perplexity_bucket(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = LM_TRAIN_FRACTION,
) -> DataFrame:
    """Score every document against the in-corpus bigram LM and assign the
    CCNet head/middle/tail bucket. One row per input document (token-less
    documents stay in-band: cost 0, bucket 'head'). Columns:
    ``id, n_tokens, cost_q, nats_per_token, bucket``."""
    uni, big, totals = train_bigram_lm(docs, text_col, id_col, train_fraction)

    base = _doc_tokens(docs, text_col, id_col)
    t = F.col("toks")
    # (prev, cur) pairs over the WHOLE doc: doc-start rows carry w1 = NULL
    prevs = F.when(F.size(t) > 0, F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(t, F.lit(1), F.greatest(F.size(t) - 1, F.lit(0))),
    )).otherwise(F.array().cast("array<string>"))
    pairs = F.zip_with(
        prevs, t, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    rows = base.select(
        F.col(id_col), F.explode_outer(pairs).alias("p")
    ).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )

    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    joined = (
        rows.join(F.broadcast(u2), "w2", "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(big), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(totals))
    )

    # fixed expression tree over exact ints — bit-identical in DuckDB
    nv = (F.col("n_train") + F.col("v_train")).cast("double")
    c1e = (F.coalesce("c1", F.lit(0)) + F.lit(1)).cast("double")
    c2e = (F.coalesce("c2", F.lit(0)) + F.lit(1)).cast("double")
    c12 = F.coalesce("c12", F.lit(0)).cast("double")
    p = F.when(F.col("w2").isNull(), F.lit(None).cast("double")).otherwise(
        F.when(F.col("w1").isNull(), c2e / nv).otherwise(
            (F.lit(0.5) * c12) / c1e + (F.lit(0.5) * c2e) / nv
        )
    )
    cost = F.floor(-F.log(p) * F.lit(float(COST_Q)))

    agg = joined.groupBy(id_col).agg(
        F.count("w2").cast("long").alias("n_tokens"),
        F.coalesce(F.sum(cost), F.lit(0)).cast("long").alias("cost_q"),
    )

    nats = F.round(
        F.col("cost_q") / (F.col("n_tokens") * F.lit(float(COST_Q))), 6
    )
    # exact integer tercile compares: cost_q*100 vs n_tokens*2^20*cut
    c100 = F.col("cost_q") * F.lit(100)
    grain = F.col("n_tokens") * F.lit(COST_Q)
    bucket = (
        F.when(F.col("n_tokens") == 0, F.lit("head"))
        .when(c100 < grain * F.lit(HEAD_NATS_X100), F.lit("head"))
        .when(c100 < grain * F.lit(MIDDLE_NATS_X100), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "cost_q",
        F.when(F.col("n_tokens") > 0, nats).alias("nats_per_token"),
        bucket.alias("bucket"),
    )


def perplexity_bucket_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = LM_TRAIN_FRACTION,
) -> str:
    """DuckDB mirror of :func:`perplexity_bucket` — identical tokenizer,
    split, counts, probability expression tree, quantization, and cuts."""
    toks = _TOKS_SQL.format(col=text_col)
    unit = _id_unit_sql(id_col, LM_TRAIN_MEMBER)
    return f"""
WITH tr AS (
  SELECT {toks} AS toks FROM {table} WHERE {unit} < {train_fraction!r}
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cw
  FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY w
),
tot AS (
  SELECT CAST(sum(cw) AS BIGINT) AS n_train,
         CAST(count(*) AS BIGINT) AS v_train FROM uni
),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM (
    SELECT unnest(toks[1:len(toks)-1]) AS w1,
           unnest(toks[2:len(toks)]) AS w2
    FROM tr WHERE len(toks) >= 2
  ) GROUP BY w1, w2
),
d AS (SELECT {id_col}, {toks} AS toks FROM {table}),
rows_ AS (
  SELECT d.{id_col},
         CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS w1,
         toks[i] AS w2
  FROM d, unnest(generate_series(1, len(toks))) AS g(i)
),
scored AS (
  SELECT r.{id_col},
         CASE WHEN r.w1 IS NULL
              THEN CAST(coalesce(u2.cw, 0) + 1 AS DOUBLE)
                   / CAST(tot.n_train + tot.v_train AS DOUBLE)
              ELSE (0.5 * CAST(coalesce(b.c12, 0) AS DOUBLE))
                   / CAST(coalesce(u1.cw, 0) + 1 AS DOUBLE)
                 + (0.5 * CAST(coalesce(u2.cw, 0) + 1 AS DOUBLE))
                   / CAST(tot.n_train + tot.v_train AS DOUBLE)
         END AS p
  FROM rows_ r
  LEFT JOIN uni u2 ON u2.w = r.w2
  LEFT JOIN uni u1 ON u1.w = r.w1
  LEFT JOIN big b ON b.w1 = r.w1 AND b.w2 = r.w2
  CROSS JOIN tot
),
agg AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CAST(floor(-ln(p) * {float(COST_Q)!r}) AS BIGINT))
              AS BIGINT) AS cost_q
  FROM scored GROUP BY {id_col}
)
SELECT d0.{id_col},
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.cost_q, 0) AS cost_q,
       CASE WHEN coalesce(a.n_tokens, 0) > 0
            THEN round(a.cost_q / (a.n_tokens * {float(COST_Q)!r}), 6)
       END AS nats_per_token,
       CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN 'head'
            WHEN a.cost_q * 100 < a.n_tokens * {COST_Q} * {HEAD_NATS_X100}
                 THEN 'head'
            WHEN a.cost_q * 100 < a.n_tokens * {COST_Q} * {MIDDLE_NATS_X100}
                 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM {table} d0 LEFT JOIN agg a USING ({id_col})
"""
