"""Training-shard export (operators/export.py): one file per (split, shard)
directory, lossless round trip, partition-pruned read-back, stability of the
shard assignment, and manifest parity with the DuckDB SQL mirror (the
oracle-gate foundation for the corpus_export_manifest lane)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.operators import export as exp
from europarl_crawler_spark.operators import sampling

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"text-{i}") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def root(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    exp.export_training_shards(docs, out, WEIGHTS, N_SHARDS)
    return out


def test_shard_assign_stable_under_repartition(docs):
    a = exp.shard_assign(docs, N_SHARDS).select("doc_id", "shard")
    b = exp.shard_assign(docs.repartition(13, "lang"), N_SHARDS).select(
        "doc_id", "shard"
    )
    assert {(r.doc_id, r.shard) for r in a.collect()} == {
        (r.doc_id, r.shard) for r in b.collect()
    }


def test_shard_counts_balanced(docs):
    got = exp.shard_assign(docs, N_SHARDS).groupBy("shard").count().collect()
    counts = {r["shard"]: r["count"] for r in got}
    assert set(counts) == set(range(N_SHARDS))
    # hash balance at 2000/4 = 500 docs/shard: within ±20%
    assert max(counts.values()) / min(counts.values()) < 1.2


def test_one_file_per_split_shard_dir(root):
    from pathlib import Path

    for d in Path(root).glob("split=*/shard=*"):
        files = [f for f in d.iterdir() if f.suffix == ".parquet"]
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_round_trip_is_lossless(spark, docs, root):
    back = spark.read.parquet(root)
    assert back.count() == 2000
    src = {(r.doc_id, r.lang, r.text) for r in docs.collect()}
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == src


def test_read_back_split_matches_assignment(spark, docs, root):
    want = {
        r.doc_id
        for r in sampling.split_assign(docs, WEIGHTS)
        .filter(F.col("split") == "val")
        .collect()
    }
    got_df = spark.read.parquet(root).filter(F.col("split") == "val")
    got = {r.doc_id for r in got_df.collect()}
    assert got == want
    # the filter reaches the scan as a PARTITION filter (directory pruning),
    # not a post-scan row filter — the property that makes a per-split read
    # touch 1/K of the corpus at 100 TB
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "split" in pf


def test_manifest_matches_duckdb_mirror(spark, docs, root):
    man = {
        (r.split, r.shard): (r.n_docs, r.id_checksum)
        for r in exp.export_manifest(spark, root).collect()
    }
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = exp.manifest_sql(WEIGHTS, N_SHARDS)
    want = {
        (split, shard): (n, chk)
        for split, shard, n, chk in con.execute(sql).fetchall()
    }
    assert man == want
    assert sum(n for n, _ in man.values()) == 2000


# ---------------------------------------------------------------------------
# WebDataset tar shards
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (i, f"img-bytes-{i}".encode(), "png", f"caption {i} café")
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "image_id long, bytes binary, fmt string, caption string"
    )


@pytest.fixture(scope="module")
def wds_root(spark, pairs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "corpus")
    receipts = exp.export_webdataset(pairs, out, N_SHARDS).collect()
    return out, {r.shard: r for r in receipts}


def test_webdataset_readback_matches_receipts(spark, pairs, wds_root):
    root, receipts = wds_root
    back = {r.shard: r for r in exp.read_webdataset_manifest(spark, root).collect()}
    assert set(back) == set(receipts) and len(back) == N_SHARDS
    for sh, r in receipts.items():
        assert back[sh].n_samples == r.n_samples
        assert back[sh].key_checksum == r.key_checksum
        assert back[sh].caption_checksum == r.caption_checksum
    assert sum(r.n_samples for r in back.values()) == 400


def test_webdataset_matches_duckdb_mirror(spark, pairs, wds_root):
    root, _ = wds_root
    back = {
        (r.shard): (r.n_samples, r.key_checksum, r.caption_checksum)
        for r in exp.read_webdataset_manifest(spark, root).collect()
    }
    con = duckdb.connect()
    con.register("pairs_tbl", pairs.toPandas()[["image_id", "caption"]])
    sql = exp.webdataset_manifest_sql(
        N_SHARDS, table="pairs_tbl", id_expr="image_id", caption_expr="caption"
    )
    want = {s: (n, kc, cc) for s, n, kc, cc in con.execute(sql).fetchall()}
    assert back == want


def test_webdataset_tar_layout_and_determinism(spark, pairs, wds_root, tmp_path):
    import tarfile
    from pathlib import Path

    root, _ = wds_root
    tars = sorted(Path(root).glob("shard-*.tar"))
    assert len(tars) == N_SHARDS
    with tarfile.open(tars[0]) as tf:
        names = tf.getnames()
        # members come in adjacent (<key>.png, <key>.txt) sample pairs,
        # sorted by key within the shard
        assert all(
            names[i].rsplit(".", 1)[0] == names[i + 1].rsplit(".", 1)[0]
            for i in range(0, len(names), 2)
        )
        keys = [n.rsplit(".", 1)[0] for n in names[::2]]
        assert keys == sorted(keys, key=int)
        m = tf.getmember(names[0])
        assert (m.mtime, m.uid, m.gid, m.uname) == (0, 0, 0, "")
    # byte-determinism: a second export of the same pairs is identical
    out2 = str(tmp_path / "corpus2")
    exp.export_webdataset(pairs, out2, N_SHARDS).collect()
    for t in tars:
        assert t.read_bytes() == (Path(out2) / t.name).read_bytes()


def test_webdataset_readback_rejects_unpaired(spark, pairs, tmp_path):
    import tarfile
    from pathlib import Path

    out = str(tmp_path / "corpus")
    exp.export_webdataset(pairs, out, 1).collect()
    tar = next(Path(out).glob("shard-*.tar"))
    # append an orphan image member -> pairing check must fail
    with tarfile.open(tar, "a") as tf:
        import io

        ti = tarfile.TarInfo("999999.png")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"xxx"))
    with pytest.raises(Exception, match="unpaired"):
        exp.read_webdataset_manifest(spark, str(Path(out))).collect()
