"""Caption-curation lanes (operators/caption.py): image↔caption alignment
scoring and template-frequency boilerplate filtering.

Reference analog: the post-fetch document scoring/drop rules
(/root/reference/europarl/rules/extraction.py:27-52), re-expressed as
declarative curation over the north-star image+caption pairs table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from europarl_crawler_spark.operators import caption

SF_DIR = "/root/testdata/sf0.001"


def _np_bigram_hist(text: str, bins: int = 64) -> np.ndarray:
    cps = [ord(c) % 256 for c in text]
    if len(cps) < 2:
        return np.zeros(bins, dtype=np.int64)
    g = [(cps[i] * 31 + cps[i + 1]) % bins for i in range(len(cps) - 1)]
    return np.bincount(g, minlength=bins).astype(np.int64)


def test_bigram_histogram_matches_numpy(spark):
    texts = ["key agg row scan", "a", "", "zz", "spark spark spark"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    rows = {
        r["i"]: r["h"]
        for r in df.select("i", caption.bigram_histogram(F.col("t")).alias("h")).collect()
    }
    for i, t in enumerate(texts):
        assert rows[i] == _np_bigram_hist(t).tolist(), t


def _pairs(spark, limit=120):
    """Matched (even doc_id) / mismatched (odd) pairs over the sf0.001 docs,
    mirroring __spark_entry__._image_caption_pairs."""
    import __spark_entry__ as entry

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(limit)
    docs.select("doc_id", "text").createOrReplaceTempView("_cap_docs")
    imgs = entry._codepoint_png_images(spark, SF_DIR)
    caps = spark.sql(
        """
        SELECT CAST(d.doc_id AS STRING) AS image_id, s.text AS caption,
               d.doc_id % 2 = 0 AS matched
        FROM _cap_docs d JOIN _cap_docs s ON s.doc_id = d.doc_id - d.doc_id % 2
        """
    )
    return imgs.join(caps, "image_id")


def test_alignment_separates_matched_from_mismatched(spark):
    pairs = _pairs(spark)
    out = caption.caption_alignment(pairs, threshold=0.98)
    joined = out.join(
        pairs.select("image_id", "matched"), "image_id"
    ).collect()
    assert len(joined) > 50
    for r in joined:
        assert r["score"] is not None and r["dot"] > 0
        assert r["aligned"] == r["matched"], (r["image_id"], r["score"])


def test_alignment_undecodable_keeps_row_with_null_score(spark):
    pairs = spark.createDataFrame(
        [("x", bytearray(b"not a png"), 16, 16, "png", "some caption here")],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    row = caption.caption_alignment(pairs).collect()[0]
    assert row["score"] is None and row["aligned"] is False


def test_alignment_plan_is_single_pass(spark):
    """The caption histogram rides through the Arrow stage: no join, no
    exchange introduced by the operator itself."""
    pairs = _pairs(spark).localCheckpoint()  # isolate the operator's plan
    plan = caption.caption_alignment(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_boilerplate_exact_df_and_flags(spark):
    rows = [
        ("a", "stock photo of a cat"),
        ("b", "stock photo of a dog"),
        ("c", "Stock Photo Of things"),  # case-normalized into the template
        ("d", "a unique caption entirely"),
        ("e", "two words"),  # shorter than key_words — key is all of it
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = {
        r["image_id"]: r
        for r in caption.boilerplate_captions(df, key_words=3, min_df=3).collect()
    }
    assert out["a"]["caption_key"] == "stock photo of"
    assert out["a"]["caption_df"] == 3 and out["a"]["is_boilerplate"]
    assert out["c"]["is_boilerplate"]
    assert out["d"]["caption_df"] == 1 and not out["d"]["is_boilerplate"]
    assert out["e"]["caption_key"] == "two words"


def test_boilerplate_min_df_boundary(spark):
    df = spark.createDataFrame(
        [("a", "x y z q"), ("b", "x y z r")], "image_id string, caption string"
    )
    out = caption.boilerplate_captions(df, key_words=3, min_df=2).collect()
    assert all(r["caption_df"] == 2 and r["is_boilerplate"] for r in out)
    out3 = caption.boilerplate_captions(df, key_words=3, min_df=3).collect()
    assert all(not r["is_boilerplate"] for r in out3)


@pytest.mark.parametrize("bins", [16, 64])
def test_bigram_histogram_bin_count(spark, bins):
    df = spark.createDataFrame([("hello world",)], "t string")
    h = df.select(caption.bigram_histogram(F.col("t"), bins).alias("h")).first()["h"]
    assert len(h) == bins and sum(h) == len("hello world") - 1


def test_full_curation_verdict_branches(spark):
    """image_curation_full must exercise every input flag at sf0.001 and its
    keep_final must equal the conjunction recomputed from the flags."""
    import __spark_entry__ as entry

    rows = entry.q_image_curation_full(spark, SF_DIR).collect()
    assert len(rows) == 500
    assert any(r["aligned"] for r in rows) and any(not r["aligned"] for r in rows)
    assert any(r["is_boilerplate"] for r in rows)
    assert any(r["keep_final"] for r in rows) and any(not r["keep_final"] for r in rows)
    for r in rows:
        assert r["keep_final"] == (
            r["quality_keep"]
            and not r["is_dup_loser"]
            and r["aligned"]
            and not r["is_boilerplate"]
        )
