"""Streaming exact content-dedup (streaming/textstream.py): the final group
summaries must equal the batch GROUP BY regardless of micro-batch split, be
idempotent under replayed rows, and bound state under group_cap while
keeping n_dups exact."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.streaming.textstream import (
    drain_dup_groups,
    streaming_exact_dup_groups,
)


@pytest.fixture(scope="module")
def hashed(spark):
    # 60 docs over 20 content hashes: hash h has members {h, h+100, h+200}
    # for h % 2 == 0, singletons otherwise
    rows = []
    for h in range(20):
        rows.append((h, h * 11))
        if h % 2 == 0:
            rows.append((h + 100, h * 11))
            rows.append((h + 200, h * 11))
    return spark.createDataFrame(rows, "doc_id long, content_hash long")


def _drain(spark, hashed, tmp, n_files, tag):
    d = str(tmp / f"hashed{tag}")
    hashed.repartition(n_files).write.parquet(d)
    out = drain_dup_groups(
        spark, d, checkpoint=str(tmp / f"ckpt{tag}"), name=f"txts_{tag}"
    )
    return {
        (r.content_hash, r.keep_id, r.n_dups) for r in out.collect()
    }


def test_matches_batch_groupby_any_split(spark, hashed, tmp_path):
    want = {
        (r.content_hash, r.keep_id, r.n_dups)
        for r in hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") >= 2)
        .collect()
    }
    assert want  # the fixture has dup groups
    one = _drain(spark, hashed, tmp_path, 1, "one")
    four = _drain(spark, hashed, tmp_path, 4, "four")
    assert one == want
    assert four == want


def test_replayed_rows_are_idempotent(spark, hashed, tmp_path):
    doubled = hashed.unionByName(hashed)
    want = {
        (r.content_hash, r.keep_id, r.n_dups)
        for r in hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") >= 2)
        .collect()
    }
    got = _drain(spark, doubled, tmp_path, 3, "replay")
    assert got == want


def _drain_capped(spark, df, tmp_path, tag, cap=3):
    d = str(tmp_path / f"capped{tag}")
    df.repartition(2).write.parquet(d)
    from europarl_crawler_spark.streaming.stream import run_available_now

    sdf = (
        spark.readStream.schema("doc_id long, content_hash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    groups = streaming_exact_dup_groups(sdf, group_cap=cap)
    run_available_now(
        groups, f"txts_cap{tag}", str(tmp_path / f"ckptcap{tag}"), output_mode="update"
    )
    return (
        spark.table(f"txts_cap{tag}")
        .groupBy("content_hash")
        .agg(
            F.max_by("keep_id", "n_dups").alias("keep_id"),
            F.max("n_dups").alias("n"),
            F.max("capped").alias("capped"),
        )
        .collect()
    )


def test_group_cap_keeps_count_and_keeper_exact(spark, tmp_path):
    # one hash group of 10 members, cap 3: retained ids bounded, but the
    # summary (keeper = min, n = 10) stays exact — and the group is flagged
    rows = [(50 - i, 7) for i in range(10)]  # ids 41..50 arriving high→low
    df = spark.createDataFrame(rows, "doc_id long, content_hash long")
    final = _drain_capped(spark, df, tmp_path, "a")
    assert len(final) == 1
    assert final[0].keep_id == 41
    assert final[0].n == 10
    assert final[0].capped is True


def test_group_cap_replay_of_evicted_member_not_recounted(spark, tmp_path):
    """The r3 ADVICE trap: a replayed (source-retried) row for a member
    beyond the cap must be recognized by the membership sketch, keeping
    n_dups exact — not incremented again."""
    rows = [(50 - i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, content_hash long")
    doubled = df.unionByName(df)  # every row replayed once
    final = _drain_capped(spark, doubled, tmp_path, "replay")
    assert len(final) == 1
    assert final[0].keep_id == 41
    assert final[0].n == 10  # replays suppressed for retained AND evicted ids
    assert final[0].capped is True


def test_uncapped_groups_not_flagged(spark, hashed, tmp_path):
    final = _drain_capped(spark, hashed, tmp_path, "nocap", cap=100)
    assert final and all(r.capped is False for r in final)
