"""DSIR importance resampling: target-likeness ordering, quantization,
determinism."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.operators import dsir


def _docs(spark):
    """ids chosen so the TARGET split (unit hash < 0.25, member 48) gets a
    distinctive phrase; raw docs either echo it or don't."""
    from europarl_crawler_spark.operators.sampling import _id_unit

    from pyspark.sql import functions as F

    rows = [(i, "") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", (_id_unit("doc_id", dsir.TARGET_MEMBER) < 0.25).alias("t")
        ).collect()
    }
    target_ids = [i for i, t in flags.items() if t]
    raw_ids = [i for i, t in flags.items() if not t]
    assert len(target_ids) >= 10 and len(raw_ids) >= 40
    echo = set(raw_ids[: len(raw_ids) // 3])
    rows = []
    for i in target_ids:
        rows.append((i, "quantum flux capacitor aligns quantum flux"))
    for i in raw_ids:
        if i in echo:
            rows.append((i, "quantum flux capacitor hums"))
        else:
            rows.append((i, "mundane boring filler words here"))
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        echo,
        set(raw_ids),
    )


def test_target_like_docs_selected_first(spark):
    df, echo, raw_ids = _docs(spark)
    k = len(echo)
    out = dsir.dsir_select(df, k=k, gumbel=False).collect()
    assert len(out) == k
    assert {r["doc_id"] for r in out} == echo  # exactly the echoing docs
    # every echoing doc outweighs every mundane doc (checked below via the
    # full pool); within the selection ranks are 1..k by (score, id)
    assert [r["sel_rank"] for r in sorted(out, key=lambda r: -r["score_q"])] \
        == list(range(1, k + 1))
    full = dsir.dsir_select(df, k=10**6, gumbel=False).collect()
    echo_w = [r["logw_q"] for r in full if r["doc_id"] in echo]
    rest_w = [r["logw_q"] for r in full if r["doc_id"] not in echo]
    assert min(echo_w) > max(rest_w)


def test_mundane_docs_score_negative(spark):
    """Docs with NO target-corpus overlap carry strictly negative
    log-weight (all their bigram mass sits in raw-only buckets)."""
    df, echo, raw_ids = _docs(spark)
    out = dsir.dsir_select(df, k=len(raw_ids), gumbel=False).collect()
    mundane = {r["doc_id"]: r["logw_q"] for r in out if r["doc_id"] not in echo}
    assert mundane and all(v < 0 for v in mundane.values())


def test_gumbel_deterministic_and_repartition_invariant(spark):
    df, _, _ = _docs(spark)
    a = dsir.dsir_select(df, k=20).collect()
    b = dsir.dsir_select(df.repartition(7), k=20).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_only_raw_pool_selectable(spark):
    from europarl_crawler_spark.operators.sampling import _id_unit

    df, _, raw_ids = _docs(spark)
    out = dsir.dsir_select(df, k=1000, gumbel=False).collect()
    assert {r["doc_id"] for r in out} == raw_ids


@pytest.mark.parametrize("gumbel", [False, True])
def test_scores_are_exact_longs(spark, gumbel):
    df, _, _ = _docs(spark)
    out = dsir.dsir_select(df, k=5, gumbel=gumbel)
    kinds = dict(out.dtypes)
    assert kinds["logw_q"] == "bigint" and kinds["score_q"] == "bigint"
