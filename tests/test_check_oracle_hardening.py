"""Meta-test of the oracle-gate mimic's r5 hardening (tools/check_oracle.py).

The r4 blind spot: the mimic's str()-coerced value compare passed DuckDB
HUGEINT (decimal) outputs that the external driver's TYPE-SENSITIVE value
hash rejected — 4 gated lanes were driver-red while the mimic said OK.
These tests pin the instrument itself: decimal dtypes and cross-engine
type-signature divergence must be REJECTED even when the printed values
are identical."""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import sys
from pathlib import Path


def _mod():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_type_signature_distinguishes_decimal_from_int():
    m = _mod()
    s = m.type_signature([(1, decimal.Decimal(5))], ["a", "b"])
    d = m.type_signature([(1, 5)], ["a", "b"])
    assert s["b"] != d["b"] and s["a"] == d["a"]


def test_tag_covers_the_driver_relevant_classes():
    m = _mod()
    vals = [
        (True, "b"), (3, "i"), (3.0, "f"), (decimal.Decimal(3), "DEC"),
        (datetime.datetime(2024, 1, 1), "ts"), (datetime.date(2024, 1, 1), "d"),
        (b"x", "y"), ("x", "s"), ([1], "l"), ({"k": 1}, "m"), (None, ""),
    ]
    for v, want in vals:
        assert m._tag(v) == want, (v, m._tag(v), want)


def test_dtype_problems_rejects_decimal_oracle_even_when_values_print_equal():
    """A DuckDB SUM(BIGINT) result: HUGEINT column, values printing
    identically to Spark's int64 — exactly the r4 failure. The hardened
    check must flag it via BOTH the arrow schema and the signature."""
    import duckdb
    import pandas as pd

    m = _mod()
    con = duckdb.connect()
    arrow = con.execute("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)").fetch_arrow_table()
    duck_rows = con.execute("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)").fetchall()

    class FakeSparkDF:
        dtypes = [("s", "bigint")]

    probs = m.dtype_problems(
        FakeSparkDF(), arrow, [(3,)], ["s"], duck_rows, ["s"]
    )
    assert probs, "decimal/hugeint oracle output must be rejected"
    assert any("decimal" in p for p in probs)
    # and the spark-side decimal guard fires symmetrically
    class FakeSparkDecimal:
        dtypes = [("s", "decimal(38,0)")]

    import pyarrow as pa

    clean = pa.table({"s": pa.array([3], type=pa.int64())})
    probs2 = m.dtype_problems(
        FakeSparkDecimal(), clean, [(decimal.Decimal(3),)], ["s"], [(3,)], ["s"]
    )
    assert any("spark col" in p for p in probs2)


def test_dtype_problems_passes_matching_int64():
    import pyarrow as pa

    m = _mod()

    class FakeSparkDF:
        dtypes = [("s", "bigint")]

    clean = pa.table({"s": pa.array([3], type=pa.int64())})
    assert m.dtype_problems(FakeSparkDF(), clean, [(3,)], ["s"], [(3,)], ["s"]) == []
