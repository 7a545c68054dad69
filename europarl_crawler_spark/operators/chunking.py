"""Sliding-window document chunking — the "split every document into
max-length training windows with overlap" step that sits between curation
and tokenization in an LLM data pipeline (long documents become several
training examples; the overlap preserves cross-boundary context).

All layout arithmetic is exact integers over the token count:

    stride    = window - overlap
    n_chunks  = 1 + max(0, ceil((n_tokens - window) / stride))
    chunk i   = tokens [i*stride, min(i*stride + window, n_tokens))

so the last chunk always reaches the document tail, every token is
covered, consecutive chunks share exactly ``overlap`` tokens (except a
possibly-larger overlap on the final chunk, the standard convention), and
empty documents produce no chunks.  The DuckDB oracle recomputes the
whole layout.

Plan shape at 100 TB: one projection computing n_tokens, one
``explode(sequence(0, n_chunks-1))`` — no shuffle at all; chunk rows
inherit the document's partitioning.  (Emitting token offsets rather than
sliced text keeps the lane storage-free; a downstream export joins the
offsets back to the tokenized text.)

Reference analog: none (the reference indexes whole documents into ES);
this is LLM-training-surface, like sequence_pack (textstats.py) which
packs the RESULTING chunks into fixed windows across documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def chunk_windows(
    docs: DataFrame,
    window: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, tok_start, tok_end, n_chunk_tokens) per window."""
    if not 0 <= overlap < window:
        raise ValueError(f"chunking: need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    n = F.size(tokens_expr(text_col)).cast("long")
    extra = F.floor(
        (n - window + stride - 1) / F.lit(float(stride))
    ).cast("long")  # ceil((n - window) / stride), clamped below
    n_chunks = F.lit(1) + F.greatest(F.lit(0).cast("long"), extra)
    d = docs.select(
        F.col(id_col).alias("doc_id"), n.alias("n"), n_chunks.alias("k")
    ).filter(F.col("n") > 0)
    c = d.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("k") - 1)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * stride
    end = F.least(start + window, F.col("n"))
    return c.select(
        "doc_id",
        "chunk_id",
        start.alias("tok_start"),
        end.alias("tok_end"),
        (end - start).alias("n_chunk_tokens"),
    )


def chunk_windows_sql(
    window: int = 128,
    overlap: int = 32,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror — same tokenizer, same integer layout."""
    stride = window - overlap
    tok = (
        f"SELECT {id_expr} AS doc_id, CAST(len(list_filter("
        f"regexp_split_to_array(lower({text_expr}), '[^a-zA-Z0-9'']+'), "
        f"x -> x != '')) AS BIGINT) AS n FROM {table}"
    )
    # NB: DuckDB's // truncates toward zero while Spark's floor()-of-double
    # floors; they differ only for NEGATIVE numerators (n < window), where
    # truncation gives 0 and floor gives <= -1 — both clamped to 0 by
    # greatest(), so k agrees in every case. Keep the clamp.
    return f"""
WITH d AS ({tok}),
k AS (SELECT doc_id, n,
             1 + greatest(0, (n - {window} + {stride} - 1) // {stride}) AS k
      FROM d WHERE n > 0),
c AS (SELECT doc_id, n, unnest(range(0, k)) AS chunk_id FROM k)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS tok_start,
       CAST(least(chunk_id * {stride} + {window}, n) AS BIGINT) AS tok_end,
       CAST(least(chunk_id * {stride} + {window}, n) - chunk_id * {stride}
            AS BIGINT) AS n_chunk_tokens
FROM c
"""
