"""SparkSession factory with scale-aware defaults.

The configs here are the ones that matter at 100 TB / 1000 executors:
AQE (runtime re-plan + skew-join splitting), Arrow for the vectorized
fetch/extract stage, bounded Arrow batch sizes (binary image columns make
rows fat), and a shuffle-partition count that callers override per scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "europarl-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for pandas UDF / mapInPandas stages.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Image rows carry binary payloads — keep Arrow batches bounded so an
        # executor never materializes more than ~batch*row_size at once.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Fat binary rows also mean smaller input splits than the 128 MiB default
        # would suggest; at cluster scale this is tuned to executor memory.
        .config("spark.sql.files.maxPartitionBytes", "67108864")
        # INT96 (the Spark default) carries no parquet footer min/max, so
        # timestamp columns would be invisible to manifest stat-pruning —
        # and Iceberg forbids INT96 outright. TIMESTAMP_MICROS gives real
        # column statistics (tz-aware via pyarrow; normalized naive-UTC in
        # EpochStore._stat_value) and is the Iceberg-compatible encoding.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        b = b.config("spark.sql.shuffle.partitions", "32")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
