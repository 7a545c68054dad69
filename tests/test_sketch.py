"""Portable HLL (operators/sketch.py): register math against a pure-Python
reference, the element-wise-max merge property (what makes the sketch
shard-/epoch-mergeable), estimate accuracy across cardinalities, and
cross-engine register parity."""

from __future__ import annotations

import duckdb
import pytest

from europarl_crawler_spark.functions import porthash
from europarl_crawler_spark.operators import sketch


def _ref_registers(keys):
    P = porthash.P
    regs = {}
    for k in keys:
        h = porthash.poly_hash_py(k)
        b = ((porthash.AFFINE_A[1] * h + porthash.AFFINE_B[1]) % P) % sketch.M
        w = ((porthash.AFFINE_A[2] * h + porthash.AFFINE_B[2]) % P) % (
            1 << sketch.W_BITS
        )
        rho = 1
        t = 1 << (sketch.W_BITS - 1)
        while t and not (w & t):
            rho += 1
            t >>= 1
        if w == 0:
            rho = sketch.W_BITS + 1
        regs[b] = max(regs.get(b, 0), rho)
    return {b: regs.get(b, 0) for b in range(sketch.M)}


def _spark_regs(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    return {r.bucket: r.r_max for r in sketch.hll_registers(df, "url").collect()}


def test_registers_match_reference(spark):
    keys = [f"https://example.org/doc/{i}" for i in range(3000)]
    assert _spark_regs(spark, keys) == _ref_registers(keys)


def test_merge_is_elementwise_max(spark):
    a = [f"k{i}" for i in range(1500)]
    b = [f"k{i}" for i in range(1000, 2500)]
    ra, rb = _spark_regs(spark, a), _spark_regs(spark, b)
    runion = _spark_regs(spark, sorted(set(a) | set(b)))
    assert runion == {k: max(ra[k], rb[k]) for k in ra}


@pytest.mark.parametrize("n", [50, 500, 5000])
def test_estimate_accuracy(spark, n):
    keys = [f"url-{i}" for i in range(n)]
    est = sketch.hll_estimate(sorted(_spark_regs(spark, keys).items()))
    # m=256 -> theoretical RSE ~1.04/16 = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.20


def test_duplicates_do_not_move_registers(spark):
    keys = [f"u{i}" for i in range(400)]
    assert _spark_regs(spark, keys) == _spark_regs(spark, keys * 5)


def test_duckdb_mirror_parity(spark):
    keys = [f"https://host{i % 7}.example/p/{i}" for i in range(1200)]
    got = sorted(_spark_regs(spark, keys).items())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT * FROM (VALUES %s) t(url)"
        % ", ".join(f"('{k}')" for k in keys)
    )
    ora = [tuple(r) for r in con.execute(sketch.hll_registers_sql()).fetchall()]
    assert got == sorted(ora)


# ---- count-min ----

def _cm_ref(keys, queries):
    P = porthash.P
    counters: dict[tuple[int, int], int] = {}

    def buckets(k):
        h = porthash.poly_hash_py(k)
        return [
            ((porthash.AFFINE_A[m] * h + porthash.AFFINE_B[m]) % P) % sketch.CM_W
            for m in sketch.CM_MEMBERS
        ]

    for k in keys:
        for d, b in enumerate(buckets(k)):
            counters[(d, b)] = counters.get((d, b), 0) + 1
    return {
        q: min(counters.get((d, b), 0) for d, b in enumerate(buckets(q)))
        for q in queries
    }


def _cm_spark(spark, keys, queries):
    df = spark.createDataFrame([(k,) for k in keys], "tok string")
    return {
        r.tok: r.n_est
        for r in sketch.countmin_estimates(df, queries).collect()
    }


def test_countmin_matches_reference(spark):
    keys = [f"tok{i % 37}" for i in range(4000)]
    queries = ["tok0", "tok5", "tok36", "never-seen"]
    assert _cm_spark(spark, keys, queries) == _cm_ref(keys, queries)


def test_countmin_one_sided_and_absent_zero(spark):
    keys = ["a"] * 100 + ["b"] * 7 + ["c"]
    got = _cm_spark(spark, keys, ["a", "b", "c", "zzz"])
    assert got["a"] >= 100 and got["b"] >= 7 and got["c"] >= 1
    assert got["zzz"] == 0  # all four probe buckets empty at this density


def test_countmin_duckdb_mirror_parity(spark):
    keys = [f"w{i % 19}-{i % 3}" for i in range(2500)]
    queries = ["w0-0", "w18-2", "missing"]
    got = sorted(_cm_spark(spark, keys, queries).items())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE toks AS SELECT * FROM (VALUES %s) t(tok)"
        % ", ".join(f"('{k}')" for k in keys)
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(
            sketch.countmin_estimates_sql(queries, table="toks")
        ).fetchall()
    )
    assert got == ora


# ---- streaming twin ----

def test_streaming_registers_equal_batch_under_any_split(spark, tmp_path):
    from pyspark.sql import functions as F

    from europarl_crawler_spark.streaming.sketchstream import drain_hll_registers

    keys = [(f"user-{i % 613}",) for i in range(4000)]
    df = spark.createDataFrame(keys, "url string")
    batch = {r.bucket: r.r_max for r in sketch.hll_registers(df, "url").collect()}
    for nfiles, per_trigger in ((1, 1), (5, 1), (5, 3)):
        d = tmp_path / f"keys{nfiles}_{per_trigger}"
        df.repartition(nfiles).write.parquet(str(d))
        got = {
            r.bucket: r.r_max
            for r in drain_hll_registers(
                spark, str(d),
                checkpoint=str(tmp_path / f"ckpt{nfiles}_{per_trigger}"),
                name=f"hlls_{nfiles}_{per_trigger}",
                max_files_per_trigger=per_trigger,
            ).collect()
        }
        assert got == batch, (nfiles, per_trigger)


def test_grouped_registers_equal_per_group_global(spark):
    rows = [(f"g{i % 3}", f"key-{i}") for i in range(1500)]
    df = spark.createDataFrame(rows, "grp string, url string")
    grouped = {}
    for r in sketch.hll_registers_by_group(df, "grp", "url").collect():
        grouped.setdefault(r.grp, {})[r.bucket] = r.r_max
    for g in ("g0", "g1", "g2"):
        solo = df.filter(df.grp == g).select("url")
        dense = {r.bucket: r.r_max for r in sketch.hll_registers(solo, "url").collect()}
        sparse = {b: v for b, v in dense.items() if v > 0}
        assert grouped[g] == sparse, g
