"""The serving-sink pipeline — reference entry point #3 (`eurocli indexing`).

The reference bulk-indexes postprocessed documents into a versioned
Elasticsearch index with delete-then-index dedup and indexed/unindex state
bits (reference: europarl/workers/indexer.py:46-87, elasticinterface.py:70-158,
eurocli.py:198-266; logical output schema europarl/europarl_index.json).

Spark-first: the serving store is just another epoch table (`index_docs`)
whose MERGE key is ``image_id`` — delete-then-index collapses into idempotent
upsert (SURVEY T8/S7), the indexed/unindex bits into "not yet merged"
anti-joins (P5/P6), versioned indices into snapshot epochs (S10), and the
reset paths (D8–D10) into keyed tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rules import rules_df
from ..sources import schema as S
from ..sources.epochstore import EpochStore

# logical twin of europarl_index.json (content:text → caption per input_hint)
INDEX_DOCS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("rulename", T.StringType(), False),
        T.StructField("language", T.StringType(), True),
        T.StructField("filetype", T.StringType(), True),
        T.StructField("filesize", T.LongType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("session_date", T.DateType(), False),
        T.StructField("downloaded_at", T.TimestampType(), False),
    ]
)


def build_index_rows(documents: DataFrame, rules: DataFrame) -> DataFrame:
    """Documents → serving rows (the J8 metadata-join output shape).

    filesize = length of the stored payload (reference F7 filesize(path) —
    rules/extraction.py:9-24 — with the blob inline, it's just length()).
    """
    dim = F.broadcast(rules.select("rulename", "language", "filetype"))
    return documents.join(dim, "rulename", "left").select(
        "image_id",
        "url",
        "rulename",
        "language",
        "filetype",
        F.length("bytes").cast("long").alias("filesize"),
        "caption",
        "phash",
        "session_date",
        "downloaded_at",
    )


def unindexed(documents: DataFrame, index_docs: DataFrame, limit: int | None = None) -> DataFrame:
    """P5+O6: documents not yet in the serving table, deterministic order
    (the reference's unordered LIMIT is nondeterministic; we order by
    image_id — SURVEY O6 note)."""
    pending = documents.join(index_docs.select("image_id"), "image_id", "left_anti")
    pending = pending.orderBy("image_id")
    return pending.limit(limit) if limit else pending


def index_epoch(
    store: EpochStore, spark: SparkSession, limit: int | None = None
) -> dict:
    """One indexing pass: batch of unindexed docs → MERGE into index_docs.

    Idempotent (T8): re-running after a partial failure re-merges the same
    keys with the same values.
    """
    docs = store.read("documents", spark, schema=S.DOCUMENTS)
    try:
        idx = store.read("index_docs", spark, schema=INDEX_DOCS)
    except ValueError:
        idx = spark.createDataFrame([], INDEX_DOCS)
    batch = unindexed(docs, idx, limit)
    rows = build_index_rows(batch, rules_df(spark))
    e = (store.latest("index_docs") or 0) + 1
    m = store.merge("index_docs", rows, e, keys=["image_id"])
    return {"epoch": e, "indexed": m["rows"]}


def unindex_by_rule(store: EpochStore, spark: SparkSession, rulename: str) -> dict:
    """D9-by-rule analog: drop a rule's rows from the serving table
    (reference reset_postprocessing_by_rule, db/documents.py:310-315)."""
    idx = store.read("index_docs", spark, schema=INDEX_DOCS)
    victims = idx.filter(F.col("rulename") == rulename)
    e = (store.latest("index_docs") or 0) + 1
    m = store.delete("index_docs", victims, e, keys=["image_id"])
    return {"epoch": e, "unindexed": m["rows"]}


def reindex(store: EpochStore, spark: SparkSession) -> dict:
    """S10 analog: materialize a fresh base snapshot (the versioned-index
    rollover europarl-00000 → -00001; readers of the previous epoch keep a
    consistent view via time travel)."""
    e = (store.latest("index_docs") or 0) + 1
    m = store.compact("index_docs", spark, e)
    return {"epoch": e, "rows": m["rows"]}
