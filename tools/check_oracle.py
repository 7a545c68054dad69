"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count + column
names + order-insensitive values. Usage:

    python tools/check_oracle.py [--json OUT.json] [query ...]

--json writes the per-query verdict map (plus totals) as one JSON object —
the committable full-catalog correctness artifact; the external driver's
CORRECTNESS gate only records the first 50 queries() entries, this covers
every entry.
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _tag(v):
    """Coarse Python-type tag. The external driver's value hash is
    TYPE-sensitive — DuckDB SUM(BIGINT)→HUGEINT→Decimal hashes differently
    from Spark's int64 even when the values print identically — so the mimic
    must compare type signatures, not just str()-coerced values (the r4
    blind spot: 4 gated lanes passed here and failed the driver)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "b"
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, decimal.Decimal):
        return "DEC"
    if isinstance(v, datetime.datetime):
        return "ts"
    if isinstance(v, datetime.date):
        return "d"
    if isinstance(v, (bytes, bytearray)):
        return "y"
    if isinstance(v, str):
        return "s"
    if isinstance(v, (list, tuple)):
        return "l"
    if isinstance(v, dict):
        return "m"
    return type(v).__name__


def type_signature(rows, cols):
    """Per-column set of non-null type tags, keyed by column name."""
    sig = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            t = _tag(v)
            if t:
                sig[c].add(t)
    return sig


def dtype_problems(spark_df, duck_arrow, spark_rows, spark_cols,
                   duck_rows, duck_cols):
    """Hard dtype checks mirroring the driver's type-sensitive hash:
    1. no decimal/hugeint column may reach an oracle final projection;
    2. no decimal column may reach a Spark final projection;
    3. per-column Python type signatures must agree across engines."""
    import pyarrow as pa

    probs = []
    for field in duck_arrow.schema:
        if pa.types.is_decimal(field.type):
            probs.append(f"oracle col '{field.name}' is {field.type} "
                         f"(decimal/hugeint — cast to BIGINT/DOUBLE in the SQL)")
    for name, dt in spark_df.dtypes:
        if dt.startswith("decimal"):
            probs.append(f"spark col '{name}' is {dt} (cast in the plan)")
    ssig = type_signature(spark_rows, spark_cols)
    dsig = type_signature(duck_rows, duck_cols)
    for c in sorted(set(ssig) & set(dsig)):
        if ssig[c] and dsig[c] and ssig[c] != dsig[c]:
            probs.append(
                f"col '{c}' type signature spark={sorted(ssig[c])} "
                f"duck={sorted(dsig[c])}"
            )
    return probs


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from europarl_crawler_spark import get_spark

    spark = get_spark("oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            results[name] = f"SPARK ERROR: {e}"
            print(name, results[name][:500])
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_rows)} rows)"
            print(f"{name}: {results[name]}")
            continue
        try:
            duck_arrow = con.execute(oracles[name]).fetch_arrow_table()
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            print(name, results[name][:500])
            continue
        dtype_bad = dtype_problems(
            df, duck_arrow, spark_rows, spark_cols, duck_rows, duck_cols
        )
        if dtype_bad:
            results[name] = f"DTYPE MISMATCH {dtype_bad}"
        elif sorted(spark_cols) != sorted(duck_cols):
            results[name] = f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        elif len(spark_rows) != len(duck_rows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        else:
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            if a == b:
                results[name] = f"OK ({len(spark_rows)} rows)"
            else:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                results[name] = f"VALUE MISMATCH e.g. {diff}"
        print(f"{name}: {results[name][:300]}")

    bad = {k: v for k, v in results.items() if not (v.startswith("OK") or v.startswith("rows-only"))}
    print(f"\n{len(results) - len(bad)}/{len(results)} ok; {len(bad)} failing: {list(bad)}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "checked": len(results),
                    "ok": len(results) - len(bad),
                    "failing": sorted(bad),
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
