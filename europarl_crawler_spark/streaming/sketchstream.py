"""ONLINE HyperLogLog — the streaming twin of operators/sketch.py's batch
registers, and the simplest possible stateful streaming operator because
HLL *is* its own state: the register table merges by element-wise max, so
a plain streaming groupBy(bucket).max(rho) aggregate (update mode, no
custom state function) converges to exactly the batch sketch under ANY
micro-batch split.  That mergeability is the whole reason HLL is the
distinct-counter of choice for a crawl frontier: per-epoch/per-shard
sketches union for free.

The lane shares the batch lane's DuckDB oracle verbatim (same registers,
same SQL) — the streaming machinery is value-checked, not just smoke-run.

Reference analog: the reference counts distincts with Postgres COUNT
queries per maintenance tick (europarl/db/url.py); the streaming sketch is
what replaces that at 10^10 URLs/continuous ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import M, hll_projection


def streaming_hll_registers(sdf: DataFrame, key_col: str = "url") -> DataFrame:
    """Streaming register aggregate: (bucket, r_max), update mode."""
    return (
        hll_projection(sdf, key_col)
        .groupBy("bucket")
        .agg(F.max("rho").alias("r_max"))
    )


def drain_hll_registers(
    spark: SparkSession,
    src_dir: str,
    checkpoint: str,
    name: str,
    key_col: str = "url",
    schema: str = "url string",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream keys → streaming register aggregate → memory sink,
    availableNow; returns the FINAL dense register table (update mode
    emits a row per changed bucket per batch — registers only ever grow,
    so the final value per bucket is the max over emissions)."""
    from .stream import run_available_now

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    regs = streaming_hll_registers(sdf, key_col)
    run_available_now(regs, name, checkpoint, output_mode="update")
    drained = (
        spark.table(name)
        .groupBy("bucket")
        .agg(F.max("r_max").alias("r_max"))
    )
    dense = spark.range(M).select(F.col("id").alias("bucket"))
    return dense.join(drained, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("r_max"), F.lit(0)).cast("long").alias("r_max"),
    )


def drain_quantile_counts(
    spark: SparkSession,
    src_dir: str,
    checkpoint: str,
    name: str,
    group_col: str = "event_type",
    value_col: str = "value",
    schema: str = "event_type string, value double",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """ONLINE exact quantiles, the count-table analog of the HLL drain:
    the (group, bucket) count table IS the quantile computation's whole
    state and merges by adding counts, so a plain streaming groupBy count
    (update mode — each emission is the latest cumulative count for the
    key, so the final value per key is the max over emissions) converges
    to the batch table under any micro-batch split; the cumulative walk
    then runs on the drained counts.  Returns the same
    (group, n, p50, p90, p99) frame as the batch lane — oracle shared."""
    from ..operators.quantiles import bucket_counts, quantiles_from_counts
    from .stream import run_available_now

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    counts = bucket_counts(sdf, group_col, value_col)
    run_available_now(counts, name, checkpoint, output_mode="update")
    drained = (
        spark.table(name)
        .groupBy("g", "vq")
        .agg(F.max("c").alias("c"))
        # the walk self-joins its input (cum ⋈ n); two branches over the
        # same memory-sink relation hit a Spark INTERNAL_ERROR on join
        # resolution — cut the lineage at the (bucket-grid-sized) count
        # table, which is exactly the state a production job would have
        # persisted anyway
        .localCheckpoint(eager=True)
    )
    return quantiles_from_counts(drained, group_col)


# ---------------------------------------------------------------------------
# ONLINE KMV — streaming twin of operators/sketch.py:kmv_sketch
# ---------------------------------------------------------------------------


def drain_kmv_sketch(
    spark: SparkSession,
    src_dir: str,
    checkpoint: str,
    name: str,
    k: int = 128,
    n_salts: int = 8,
    schema: str = "set_id string, key string",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream (set_id, key) → stateful bottom-k per (set, salt) →
    memory sink → final k-min per set. EXACT under any micro-batch split:
    once a (set, salt) group holds k hashes, any larger arrival can never
    enter the k-min — so the pruned state is bounded AND lossless, and the
    k smallest over the union of all emissions equal the batch sketch
    (every true k-min hash is retained and re-emitted to the end)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions import porthash
    from ..operators.sketch import kmv_hash
    from .stream import run_available_now

    out_t = T.StructType(
        [
            T.StructField("set_id", T.StringType(), False),
            T.StructField("h", T.LongType(), False),
        ]
    )
    state_t = T.StructType(
        [T.StructField("hs", T.ArrayType(T.LongType()), False)]
    )

    def fn(key, pdfs, state: GroupState):
        s = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            s.update(int(h) for h in pdf["h"])
        hs = sorted(s)[:k]
        state.update((hs,))
        yield pd.DataFrame({"set_id": [key[0]] * len(hs), "h": hs})

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    keyed = sdf.select(
        "set_id", kmv_hash("key").alias("h")
    ).withColumn("salt", F.pmod(F.col("h"), F.lit(int(n_salts))))
    st = keyed.groupBy("set_id", "salt").applyInPandasWithState(
        fn,
        outputStructType=out_t,
        stateStructType=state_t,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_available_now(st, name, checkpoint, output_mode="update")
    from pyspark.sql.window import Window

    w = Window.partitionBy("set_id").orderBy("h")
    return (
        spark.table(name)
        .select("set_id", "h")
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
