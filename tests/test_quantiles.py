"""Exact bucket-count quantiles (operators/quantiles.py): type-1 quantile
definition against numpy/pure-python on the same grid, edge ranks, and
cross-engine parity with the DuckDB mirror."""

from __future__ import annotations

import math

import duckdb
import pytest

from europarl_crawler_spark.operators import quantiles


ROWS = [
    (i, ["a", "b"][i % 2], v)
    for i, v in enumerate(
        [0.01, 0.02, 0.02, 0.5, 1.0, 1.0, 2.5, 9.99, 10.0, 100.0] * 7
        + [0.005, 55.55, 3.14]
    )
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, event_type string, value double"
    )


def _ref():
    by_g: dict[str, list[int]] = {}
    for _i, g, v in ROWS:
        by_g.setdefault(g, []).append(math.floor(v * 100.0))
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        row = {"n": n}
        for name, num, den in quantiles.QS:
            rank = -(-(n * num) // den)  # ceil(q*n)
            row[name] = vs[rank - 1]
        out[g] = row
    return out


def test_matches_type1_reference(ev):
    got = {
        r.event_type: {"n": r.n, "p50": r.p50, "p90": r.p90, "p99": r.p99}
        for r in quantiles.quantiles_by_group(ev).collect()
    }
    assert got == _ref()


def test_single_row_group(spark):
    df = spark.createDataFrame(
        [(0, "solo", 7.77)], "event_id long, event_type string, value double"
    )
    r = quantiles.quantiles_by_group(df).collect()[0]
    assert (r.n, r.p50, r.p90, r.p99) == (1, 777, 777, 777)


def test_duckdb_mirror_parity(ev):
    got = sorted(tuple(r) for r in quantiles.quantiles_by_group(ev).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES %s) "
        "t(event_id, event_type, value)"
        % ", ".join(f"({i}, '{g}', {v!r})" for i, g, v in ROWS)
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(quantiles.quantiles_by_group_sql()).fetchall()
    )
    assert got == ora


def test_agrees_with_duckdb_quantile_disc(ev):
    # independent oracle: DuckDB's own discrete quantile on the same grid
    got = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in quantiles.quantiles_by_group(ev).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES %s) "
        "t(event_id, event_type, value)"
        % ", ".join(f"({i}, '{g}', {v!r})" for i, g, v in ROWS)
    )
    ref = {
        g: (p50, p90, p99)
        for g, p50, p90, p99 in con.execute(
            "SELECT event_type,"
            " quantile_disc(CAST(floor(value*100.0) AS BIGINT), 0.5),"
            " quantile_disc(CAST(floor(value*100.0) AS BIGINT), 0.9),"
            " quantile_disc(CAST(floor(value*100.0) AS BIGINT), 0.99)"
            " FROM events GROUP BY 1"
        ).fetchall()
    }
    assert got == ref


def test_streaming_counts_equal_batch_under_any_split(spark, ev, tmp_path):
    from europarl_crawler_spark.streaming.sketchstream import drain_quantile_counts

    batch = sorted(tuple(r) for r in quantiles.quantiles_by_group(ev).collect())
    for nfiles, per_trigger in ((1, 1), (4, 1), (4, 2)):
        d = tmp_path / f"ev{nfiles}_{per_trigger}"
        ev.select("event_type", "value").repartition(nfiles).write.parquet(str(d))
        got = sorted(
            tuple(r)
            for r in drain_quantile_counts(
                spark, str(d),
                checkpoint=str(tmp_path / f"qck{nfiles}_{per_trigger}"),
                name=f"qstr_{nfiles}_{per_trigger}",
                max_files_per_trigger=per_trigger,
            ).collect()
        )
        assert got == batch, (nfiles, per_trigger)
