"""Session windows (streaming/stream.py:sessionize): merge-on-touch
semantics pinned, DuckDB gap-and-island mirror parity, and the batch plan
producing identical sessions through readStream (the streaming-twin claim)."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.streaming.stream import sessionize, sessionize_sql


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(5):
        # burst of 4 events 5 min apart, a 31-min hole, burst of 2
        for k in range(4):
            rows.append((eid, t0 + timedelta(minutes=5 * k + u), u, "view", 1.25))
            eid += 1
        for k in range(2):
            rows.append(
                (eid, t0 + timedelta(minutes=60 + 5 * k + u), u, "click", 2.5)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessions_split_on_gap(events):
    got = sessionize(events).filter(F.col("user_id") == 0).orderBy("session_start")
    rows = got.collect()
    assert [r.n_events for r in rows] == [4, 2]
    # end = last event + gap
    assert rows[0].session_end == datetime(2024, 1, 1, 0, 45)
    assert rows[0].sum_value == 5.0 and rows[1].sum_value == 5.0


def test_touching_windows_merge(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 30), 1.0),  # exactly at prev end: merges
        (1, datetime(2024, 1, 1, 1, 0, 0, 1), 1.0),  # 1 µs past: new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sessionize(df).orderBy("session_start").collect()
    assert [r.n_events for r in got] == [2, 1]
    # and the DuckDB mirror pins the same boundary
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00', 1.0), "
        "(1, TIMESTAMP '2024-01-01 00:30:00', 1.0), "
        "(1, TIMESTAMP '2024-01-01 01:00:00.000001', 1.0)"
        ") t(user_id, ts, value)"
    )
    want = con.execute(
        sessionize_sql() + " ORDER BY session_start"
    ).fetchall()
    assert [r[3] for r in want] == [2, 1]


def test_duckdb_mirror_on_real_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize(ev).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(sessionize_sql()).fetchall()
    }
    assert got == want


def test_streaming_twin_matches_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    # watermarks require TIMESTAMP (with zone); the parquet column is NTZ
    sdf = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 minute")
    )
    out = sessionize(sdf)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_twin").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize(ev.withColumn("ts", F.col("ts").cast("timestamp"))).collect()
    }
    assert got == want
