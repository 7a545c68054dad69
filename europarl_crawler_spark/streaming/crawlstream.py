"""Streaming crawl epochs: the frontier drain → fetch → merge loop driven by
Structured Streaming (the readStream twin of CrawlEngine.run's batch epochs).

Reference analog: the continuous crawler loop (reference jobs/crawler.py:47-99
— each pass drains a frontier batch, fetches under per-host budgets, appends
the request log, and commits before the next pass). Here each parquet file
arriving on the source directory IS one drain batch; ``foreachBatch`` runs the
epoch body per micro-batch and commits through the same EpochStore MERGE the
batch engine uses (``batch_merge_sink`` exactly-once contract: the store
epoch derives from the streaming batch id, so a replayed micro-batch is a
durable no-op — T8).

The per-batch body is the miniature of the batch epoch:

1. **drain**: per-(batch, host) priority order ``row_number() ORDER BY
   url_id`` truncated at the politeness budget — priority_drain's window,
   scoped to the micro-batch. Partitioning by the DATA-derived batch column
   (``pmod(url_id, n_batches)``), not the streaming batch id, makes the
   output invariant to how the source groups files into triggers.
2. **fetch**: deterministic status classification (the status join of
   plans/fetch.py:simulate_requests, as portable modular arithmetic so the
   DuckDB oracle replays it exactly), with the dead-letter classes of
   DEAD_LETTER + 5xx (reference documentdownloader.py:132-150).
3. **merge**: keyed MERGE into the store — the streaming request log.

At 10^10-URL scale the source directory is the drain handoff point (a real
deployment points it at the frontier-drain job's output or a queue-backed
file sink); state per micro-batch is one drain batch, the store commit is
one manifest append, and nothing accumulates in executor memory between
batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.fetch import DEAD_LETTER
from .stream import batch_merge_sink


def drain_fetch_batch(
    batch_df: DataFrame, n_batches: int, budget: int
) -> DataFrame:
    """One epoch body over one drained frontier batch (pure, batch-testable).

    Columns in: (url_id long, host long). Out: + (batch, drain_seq,
    status_code, dead_letter) for the rows inside the per-host budget.
    Everything is integer arithmetic both engines share: batch =
    pmod(url_id, n_batches); status = CASE pmod(url_id, 10) with lanes for
    404 / 503 / 429 / 200.
    """
    batch = F.pmod(F.col("url_id"), F.lit(n_batches))
    seq = (
        F.row_number()
        .over(Window.partitionBy(batch, F.col("host")).orderBy("url_id"))
        .cast("long")
    )
    code = F.pmod(F.col("url_id"), F.lit(10))
    status = (
        F.when(code == 0, F.lit(404))
        .when(code == 1, F.lit(503))
        .when(code == 2, F.lit(429))
        .otherwise(F.lit(200))
    )
    return (
        batch_df.withColumn("batch", batch)
        .withColumn("drain_seq", seq)
        .filter(F.col("drain_seq") <= budget)
        .withColumn("status_code", status)
        .withColumn(
            "dead_letter",
            F.col("status_code").isin(list(DEAD_LETTER))
            | (F.col("status_code") >= 500),
        )
    )


def stream_crawl_epochs(
    spark: SparkSession,
    batches_dir: str,
    store,
    checkpoint: str,
    table: str = "requests_stream",
    n_batches: int = 4,
    budget: int = 5,
    schema: str = "url_id long, host long",
) -> DataFrame:
    """Run the streaming crawl loop to exhaustion (availableNow) and return
    the merged request log read back from the store.

    One source file per micro-batch (maxFilesPerTrigger=1) — the streaming
    twin of ``CrawlEngine.run``'s epoch iteration; the merge keys on
    url_id, so the final table is the batch answer regardless of trigger
    grouping or replay.
    """
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(batches_dir)
    )
    merge = batch_merge_sink(store, table, keys=["url_id"])

    def _epoch(batch_df: DataFrame, batch_id: int) -> None:
        merge(drain_fetch_batch(batch_df, n_batches, budget), batch_id)

    q = (
        sdf.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read(table, spark).select(
        "url_id", "host", "batch", "drain_seq", "status_code", "dead_letter"
    )
