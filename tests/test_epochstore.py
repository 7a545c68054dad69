"""EpochStore: merge-on-read upsert semantics (reference ON CONFLICT DO
UPDATE, SURVEY D1–D4), tombstones, compaction, time travel, resume."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.sources.epochstore import EpochStore


@pytest.fixture()
def store(tmp_path):
    return EpochStore(tmp_path / "store")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_merge_latest_wins_and_idempotent(spark, store):
    store.merge("t", _df(spark, [(1, "a"), (2, "b")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "B"), (3, "c")]), 2, keys=["k"])
    got = {(r.k, r.v) for r in store.read("t", spark).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # idempotent re-merge (same batch, next epoch) → same resolved table
    store.merge("t", _df(spark, [(2, "B"), (3, "c")]), 3, keys=["k"])
    got = {(r.k, r.v) for r in store.read("t", spark).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_time_travel(spark, store):
    store.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(1, "A2")]), 2, keys=["k"])
    assert store.read("t", spark, as_of=1).first().v == "a"
    assert store.read("t", spark, as_of=2).first().v == "A2"


def test_tombstone_delete(spark, store):
    store.merge("t", _df(spark, [(1, "a"), (2, "b")]), 1, keys=["k"])
    store.delete("t", _df(spark, [(1, "a")]), 2, keys=["k"])
    assert [r.k for r in store.read("t", spark).collect()] == [2]


def test_compact_preserves_contents(spark, store):
    store.merge("t", _df(spark, [(1, "a"), (2, "b")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "B")]), 2, keys=["k"])
    store.delete("t", _df(spark, [(1, "a")]), 3, keys=["k"])
    store.compact("t", spark, 4)
    got = {(r.k, r.v) for r in store.read("t", spark).collect()}
    assert got == {(2, "B")}
    assert store.manifests("t")[-1]["kind"] == "base"


def test_append_table(spark, store):
    store.append("log", _df(spark, [(1, "x")]), 1)
    store.append("log", _df(spark, [(1, "x")]), 2)  # duplicates kept
    assert store.read("log", spark).count() == 2


def test_rollback(spark, store):
    store.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(1, "A2")]), 2, keys=["k"])
    store.rollback("t", 1)
    assert store.latest("t") == 1
    assert store.read("t", spark).first().v == "a"


def test_empty_read_needs_schema(spark, store):
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("k", T.LongType())])
    assert store.read("nope", spark, schema=schema).count() == 0
    with pytest.raises(ValueError):
        store.read("nope", spark)


def test_read_changes_incremental(spark, store):
    """CDC window: net per-key changes in (since, until], upsert/delete
    tagged — the downstream pipeline's process-only-new-epochs primitive."""
    store.merge("t", _df(spark, [(1, "a"), (2, "b"), (3, "c")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "B2"), (4, "d")]), 2, keys=["k"])
    store.merge("t", _df(spark, [(2, "B3"), (5, "e")]), 3, keys=["k"])
    store.delete("t", _df(spark, [(1, "a")]), 4, keys=["k"])

    got = {(r.k, r.v, r._change)
           for r in store.read_changes("t", spark, since=1).collect()}
    assert got == {(2, "B3", "upsert"), (4, "d", "upsert"),
                   (5, "e", "upsert"), (1, None, "delete")}

    # bounded window: only epoch 2's commits
    got = {(r.k, r.v, r._change)
           for r in store.read_changes("t", spark, since=1, until=2).collect()}
    assert got == {(2, "B2", "upsert"), (4, "d", "upsert")}

    # empty window with schema → empty frame, not an error
    import pyspark.sql.types as st
    sch = st.StructType([st.StructField("k", st.LongType()),
                         st.StructField("v", st.StringType())])
    assert store.read_changes("t", spark, since=9, schema=sch).count() == 0


def test_read_changes_refuses_crossing_compaction(spark, store):
    store.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "b")]), 2, keys=["k"])
    store.compact("t", spark, 3)
    store.merge("t", _df(spark, [(3, "c")]), 4, keys=["k"])
    with pytest.raises(ValueError, match="base snapshot"):
        store.read_changes("t", spark, since=2)
    # from the compacted epoch onward is fine
    got = {(r.k, r._change)
           for r in store.read_changes("t", spark, since=3).collect()}
    assert got == {(3, "upsert")}


def test_expire_drops_superseded_epochs_and_guards_reads(spark, store):
    store.merge("t", _df(spark, [(1, "a"), (2, "b")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "B")]), 2, keys=["k"])
    store.compact("t", spark, 3)
    store.merge("t", _df(spark, [(4, "d")]), 4, keys=["k"])
    before = {(r.k, r.v) for r in store.read("t", spark).collect()}

    out = store.expire("t")
    assert out["expired"] == [1, 2] and out["watermark"] == 3
    # latest read unchanged
    assert {(r.k, r.v) for r in store.read("t", spark).collect()} == before
    # data dirs + manifests physically gone
    assert not (store.root / "t" / "epoch=1").exists()
    assert not (store.root / "t" / "_manifests" / "00000001.json").exists()
    # expired time travel raises instead of answering wrongly
    with pytest.raises(ValueError, match="expired"):
        store.read("t", spark, as_of=2)
    # post-watermark time travel and incremental read still work
    assert {(r.k, r.v) for r in store.read("t", spark, as_of=3).collect()} == {
        (1, "a"), (2, "B"),
    }
    got = {(r.k, r.v) for r in store.read_changes("t", spark, since=3).collect()}
    assert got == {(4, "d")}
    # pre-watermark incremental read raises
    with pytest.raises(ValueError, match="watermark"):
        store.read_changes("t", spark, since=1)
    # expire is idempotent: nothing older than the base remains
    assert store.expire("t")["expired"] == []


def test_compact_target_partitions_bounds_files(spark, store):
    for e in range(1, 5):
        store.merge(
            "t", _df(spark, [(i, f"v{e}") for i in range(e * 10, e * 10 + 8)]),
            e, keys=["k"],
        )
    m = store.compact("t", spark, 5, target_partitions=2)
    assert m["kind"] == "base" and m["files"] == 2
    assert store.read("t", spark).count() == 32


def test_maintenance_job_compact_and_expire(spark, store, tmp_path, monkeypatch):
    from europarl_crawler_spark.jobs import maintenance_job

    store.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "b")]), 2, keys=["k"])
    root = str(store.root)
    out = maintenance_job.main(
        ["--store", root, "compact-table", "--table", "t",
         "--target-partitions", "1"]
    )
    assert out["kind"] == "base" and out["files"] == 1
    out = maintenance_job.main(["--store", root, "expire", "--table", "t"])
    assert out["expired"] == [1, 2] and out["watermark"] == 3
    assert {(r.k, r.v) for r in store.read("t", spark).collect()} == {
        (1, "a"), (2, "b"),
    }


# ---- optimistic concurrency (parent-CAS commit, r3 judge wrong#2) ----


def test_same_epoch_double_commit_conflicts(spark, tmp_path):
    """Two writers racing to the SAME epoch: the second fails cleanly and the
    first's committed data is never clobbered (no last-writer-wins)."""
    from europarl_crawler_spark.sources.epochstore import CommitConflictError

    a = EpochStore(tmp_path / "s")
    b = EpochStore(tmp_path / "s")
    a.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])
    with pytest.raises(CommitConflictError):
        b.merge("t", _df(spark, [(1, "CLOBBER")]), 1, keys=["k"])
    got = {(r.k, r.v) for r in a.read("t", spark).collect()}
    assert got == {(1, "a")}


def test_stale_parent_commit_conflicts_and_chain_stays_linear(spark, tmp_path):
    """Interleaved writers: B snapshots the chain, A commits, B's commit must
    fail at the CAS point instead of silently forking; B's orphaned data dir
    is invisible to readers and a retry against the new snapshot succeeds."""
    from europarl_crawler_spark.sources.epochstore import CommitConflictError

    a = EpochStore(tmp_path / "s")
    b = EpochStore(tmp_path / "s")
    a.merge("t", _df(spark, [(1, "a")]), 1, keys=["k"])

    # freeze B's first latest() call at the pre-A snapshot (parent=1), so A's
    # epoch-2 commit lands between B's snapshot read and B's commit point
    real_latest = b.latest
    state = {"first": True}

    def stale_then_real(table):
        if state["first"]:
            state["first"] = False
            return 1
        return real_latest(table)

    b.latest = stale_then_real
    a.merge("t", _df(spark, [(2, "from_a")]), 2, keys=["k"])
    with pytest.raises(CommitConflictError, match="parent moved"):
        b.merge("t", _df(spark, [(3, "from_b")]), 3, keys=["k"])

    # chain is linear: epochs [1, 2], parents [None, 1]; B's data invisible
    ms = a.manifests("t")
    assert [m["epoch"] for m in ms] == [1, 2]
    assert [m["parent"] for m in ms] == [None, 1]
    got = {(r.k, r.v) for r in a.read("t", spark).collect()}
    assert got == {(1, "a"), (2, "from_a")}

    # retry against the fresh snapshot succeeds and clobbers the orphan
    b.latest = real_latest
    b.merge("t", _df(spark, [(3, "from_b")]), 3, keys=["k"])
    ms = a.manifests("t")
    assert [m["parent"] for m in ms] == [None, 1, 2]
    assert (1, "a") in {(r.k, r.v) for r in a.read("t", spark).collect()}


def test_non_advancing_epoch_conflicts(spark, store):
    from europarl_crawler_spark.sources.epochstore import CommitConflictError

    store.merge("t", _df(spark, [(1, "a")]), 5, keys=["k"])
    with pytest.raises(CommitConflictError, match="does not advance"):
        store.merge("t", _df(spark, [(2, "b")]), 4, keys=["k"])
    with pytest.raises(CommitConflictError, match="does not advance"):
        store.merge("t", _df(spark, [(2, "b")]), 5, keys=["k"])


def test_compact_file_count_immune_to_session_shuffle_conf(spark, store):
    """Regression: repartition(n, keys) alone was elided against the
    resolve window's same-key exchange, letting AQE coalesce the write to
    fewer files than target_partitions when spark.sql.shuffle.partitions
    was small (observed: 1 file at 2). compact must honor the target under
    ANY session conf."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for e in range(1, 5):
            store.merge(
                "t2", _df(spark, [(i, f"v{e}") for i in range(e * 10, e * 10 + 8)]),
                e, keys=["k"],
            )
        m = store.compact("t2", spark, 5, target_partitions=2)
        assert m["files"] == 2
        assert store.read("t2", spark).count() == 32
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_snapshot_diff_classifies_and_crosses_compaction(spark, store):
    store.merge("t", _df(spark, [(1, "a"), (2, "b"), (3, "c")]), 1, keys=["k"])
    store.merge("t", _df(spark, [(2, "B"), (4, "d")]), 2, keys=["k"])
    store.delete("t", _df(spark, [(3, "c")]), 3, keys=["k"])
    # compaction between the two snapshots — read_changes refuses this
    # window, snapshot_diff must not care (it compares resolved states)
    store.compact("t", spark, 4)
    got = {(r.k, r._diff) for r in store.snapshot_diff("t", spark, 1, 4).collect()}
    assert got == {(2, "changed"), (3, "deleted"), (4, "added")}
    # unchanged key 1 absent; empty diff when nothing moved
    assert store.snapshot_diff("t", spark, 4, 4).count() == 0


def test_snapshot_diff_requires_keys(spark, store):
    store.append("log", _df(spark, [(1, "a")]), 1)
    with pytest.raises(ValueError):
        store.snapshot_diff("log", spark, 1, 1)
