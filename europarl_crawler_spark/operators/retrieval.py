"""BM25 ranked retrieval over the curated corpus — the standard relevance
query surface an LLM-data platform exposes (eval-set mining, targeted
corpus slicing, "find documents like this query" curation loops).

Okapi BM25 (Robertson & Walker, SIGIR'94; k1 = 1.2, b = 0.75):

    score(q, d) = Σ_{t ∈ q} idf(t) * tf * (k1 + 1)
                             / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

Cross-engine exactness, same contract as the perplexity lane
(operators/lm.py): every input is an exact integer (tf, df, dl, N,
Σdl), each per-(term, doc) score is ONE fixed expression tree over those
integers — identical IEEE doubles in Spark and DuckDB — and it is
quantized to int64 (floor(score * 2^20)) BEFORE the per-document sum, so
the aggregate is order-of-summation independent and the oracle checks
every ranked score value, not just rows.  avgdl enters as the exact
rational Σdl / N: the normalizer is written b * ((dl * N) / Σdl) so both
engines divide the same two exact integers.

Plan shape at 100 TB: the corpus is touched once (explode -> (doc, term)
tf counts, map-side combinable); df and the corpus length scalar are
term-/1-row-sized aggregates; the query-term table BROADCASTS (queries
are human-sized), so scoring is a broadcast semi-join onto the posting
rows — no corpus shuffle beyond the tf groupBy.  The final per-query
top-k window partitions by query id; its input is only the matching
posting rows (bounded by Σ df over the query's terms), the classic
WAND-less exact evaluation.

Reference analog: the reference's retrieval surface is Elasticsearch
(europarl/documents/index.py) — BM25 is exactly what ES runs under the
hood; here the engine computes it natively over the curated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 1.2
B = 0.75
SCORE_Q = 1 << 20  # fixed-point quantum, same convention as operators/lm.py

from .textstats import tokens_expr

# Pinned query set (id, text) — terms drawn from the synthetic corpus's
# vocabulary; swap for a real query table in production (the plan is
# identical: any small (query_id, term) table broadcasts).
QUERIES: list[tuple[int, str]] = [
    (1, "hash join order"),
    (2, "window sort merge"),
    (3, "fast scan filter"),
    (4, "spark stream batch"),
]


def _query_terms(spark) -> DataFrame:
    rows = sorted(
        {(qid, t) for qid, q in QUERIES for t in q.split()}
    )
    return spark.createDataFrame(rows, "query_id INT, tok STRING")


def bm25_topk(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per pinned query: (query_id, rank, doc_id, score_q)
    with score_q the int64-quantized BM25 score (ties broken by doc_id so
    the cut is deterministic)."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    )
    qt = _query_terms(spark)
    terms = qt.select("tok").distinct()
    # restrict the posting rows to query terms BEFORE any term-keyed agg:
    # df for a term counts all docs containing it, which the term-filtered
    # tf still holds in full — so the full-vocabulary df aggregation (a
    # corpus-wide shuffle producing mostly-unused rows at 100 TB) never
    # exists in the plan
    tf = (
        toks.join(F.broadcast(terms), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("long").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(qt), "tok")
        .join(F.broadcast(df_t), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # fixed expression tree — mirrored token-for-token in bm25_topk_sql()
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    norm = F.lit(1.0 - B) + F.lit(B) * (
        (F.col("dl").cast("double") * F.col("n_docs")) / F.col("sum_dl")
    )
    score = (
        idf
        * (F.col("tf").cast("double") * F.lit(K1 + 1.0))
        / (F.col("tf").cast("double") + F.lit(K1) * norm)
    )
    term_q = F.floor(score * F.lit(float(SCORE_Q))).cast("long")
    doc_scores = (
        scored.select("query_id", "doc_id", term_q.alias("sq"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("sq").alias("score_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("doc_id")
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_q")
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf — the
    keyword-extraction / doc-summarization primitive (and the features a
    quality classifier or topic mixture starts from).  idf = ln(N/df)
    quantized to int64 once per TERM (vocabulary-sized), then the
    per-(doc, term) score is the exact integer tf · idf_q — no float ever
    aggregates.  Output: (doc_id, rank, tok, score_q).

    Plan: tf = one explode→groupBy (corpus-sized, map-side combinable);
    df/idf = one vocab-sized rollup of tf; score join is token-keyed on
    two tables that share the tf shuffle's partitioning; the final window
    partitions by doc_id (bounded by a document's distinct-term count)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(
        F.count(F.lit(1)).alias("n_docs")
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            F.floor(
                F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
                * F.lit(float(SCORE_Q))
            ).cast("long").alias("idf_q"),
        )
    )
    scored = tf.join(idf, "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf_q")).alias("score_q")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "score_q")
    )


def tfidf_keywords_sql(
    k: int = 3,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror — same tokenizer, same quantized idf, same cut."""
    tok = (
        f"SELECT {id_expr} AS doc_id, unnest(regexp_split_to_array("
        f"lower({text_expr}), '[^a-zA-Z0-9'']+')) AS tok FROM {table}"
    )
    return f"""
WITH toks AS (SELECT doc_id, tok FROM ({tok}) WHERE tok != ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM {table}),
idf AS (SELECT tok,
               CAST(floor(ln(CAST(n_docs AS DOUBLE) / CAST(count(*) AS DOUBLE))
                    * {float(SCORE_Q)!r}) AS BIGINT) AS idf_q
        FROM tf CROSS JOIN nd GROUP BY tok, n_docs),
sc AS (SELECT doc_id, tok, CAST(tf * idf_q AS BIGINT) AS score_q
       FROM tf JOIN idf USING (tok)),
rk AS (SELECT doc_id, tok, score_q,
              CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score_q DESC, tok ASC) AS INT) AS rank
       FROM sc)
SELECT doc_id, rank, tok, score_q FROM rk WHERE rank <= {k}
"""


def bm25_topk_sql(
    k: int = 10,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror: same tokenizer, same integer inputs, same expression
    tree, same quantization, same (score DESC, doc_id) cut."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, t in sorted({(q, t) for q, s in QUERIES for t in s.split()})
    )
    tok = (
        f"SELECT {id_expr} AS doc_id, unnest(regexp_split_to_array("
        f"lower({text_expr}), '[^a-zA-Z0-9'']+')) AS tok FROM {table}"
    )
    return f"""
WITH toks AS (SELECT doc_id, tok FROM ({tok}) WHERE tok != ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
qt(query_id, tok) AS (VALUES {qvals}),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(floor(
           ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * {K1 + 1.0!r})
           / (CAST(tf AS DOUBLE) + {K1!r} * ({1.0 - B!r} + {B!r} *
              ((CAST(dl AS DOUBLE) * n_docs) / sum_dl)))
           * {float(SCORE_Q)!r}) AS BIGINT) AS sq
  FROM tf JOIN qt USING (tok) JOIN df USING (tok)
       JOIN dl USING (doc_id) CROSS JOIN stats
),
ds AS (SELECT query_id, doc_id, CAST(sum(sq) AS BIGINT) AS score_q
       FROM scored GROUP BY 1, 2),
rk AS (SELECT query_id, doc_id, score_q,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score_q DESC, doc_id ASC) AS INT) AS rank
       FROM ds)
SELECT query_id, rank, doc_id, score_q FROM rk WHERE rank <= {k}
"""
