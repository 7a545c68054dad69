"""The Iceberg SQL bridge: statement emission is pure and pinned; the DML
statements must PARSE under Spark's own SQL parser (so the production path
is not a string that dies at the first spark.sql call); the executing class
refuses politely in this jar-less sandbox."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.sources import icebridge as ib


def test_create_is_v2_bucketed_merge_on_read():
    sql = ib.emit_create(
        "crawl", "url_state", "url_hash BIGINT, url STRING, status INT",
        keys=["url_hash"], buckets=256,
    )
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(256, url_hash))" in sql
    assert "'format-version'='2'" in sql
    assert "'write.merge.mode'='merge-on-read'" in sql
    # unkeyed (append-only log) tables carry no partition clause
    assert "PARTITIONED" not in ib.emit_create("crawl", "requests", "x INT", None)


def test_merge_updates_non_keys_and_inserts_all():
    sql = ib.emit_merge(
        "crawl", "url_state", ["url_hash"], ["url_hash", "url", "status"], "src"
    )
    assert "MERGE INTO crawl.db.url_state t" in sql
    assert "ON t.url_hash = s.url_hash" in sql
    assert "UPDATE SET t.url = s.url, t.status = s.status" in sql  # no key
    assert "INSERT (url_hash, url, status) VALUES (s.url_hash, s.url, s.status)" in sql


def test_delete_merge_and_maintenance_calls():
    d = ib.emit_delete_merge("crawl", "url_state", ["url_hash"], "gone")
    assert "WHEN MATCHED THEN DELETE" in d and "UPDATE" not in d
    c = ib.emit_compact("crawl", "url_state", target_file_mb=512)
    assert "crawl.system.rewrite_data_files" in c
    assert "'536870912'" in c
    e = ib.emit_expire("crawl", "url_state", "2026-01-01 00:00:00")
    assert "crawl.system.expire_snapshots" in e and "TIMESTAMP '2026-01-01" in e
    ch = ib.emit_changelog("crawl", "url_state", 7, "url_changes")
    assert "create_changelog_view" in ch and "'start-snapshot-id','7'" in ch
    z = ib.emit_rewrite_zorder("crawl", "documents", "host_hash", "fetch_day")
    assert "strategy => 'sort'" in z
    assert "sort_order => 'zorder(host_hash, fetch_day)'" in z
    p = ib.emit_pruned_scan("crawl", "documents", "host_hash", 0, 8191)
    assert p == (
        "SELECT * FROM crawl.db.documents WHERE host_hash >= 0 AND host_hash <= 8191"
    )


def test_time_travel_select():
    sql = ib.emit_time_travel("crawl", "documents", 42)
    assert sql == "SELECT * FROM crawl.db.documents VERSION AS OF 42"


def test_dml_parses_under_spark_sql_parser(spark):
    """MERGE/INSERT/SELECT must be valid Spark SQL (CALL needs the Iceberg
    extension grammar, so it is excluded — it never reaches a bare parser)."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    for sql in [
        ib.emit_merge("c", "t", ["k"], ["k", "v"], "s"),
        ib.emit_delete_merge("c", "t", ["k"], "s"),
        ib.emit_append("c", "t", "s"),
        ib.emit_overwrite("c", "t", "s"),
        ib.emit_time_travel("c", "t", 1),
        ib.emit_create("c", "t", "k BIGINT, v STRING", ["k"]),
        ib.emit_pruned_scan("c", "t", "k", 0, 10),
    ]:
        parser.parsePlan(sql)  # raises ParseException on bad grammar


def test_executing_store_requires_catalog(spark):
    with pytest.raises(ib.IcebergUnavailable) as ei:
        ib.IcebergEpochStore(spark, catalog="crawl")
    assert "iceberg-spark-runtime" in str(ei.value)
