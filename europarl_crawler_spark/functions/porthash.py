"""Portable (cross-engine) hashing: polynomial string hashes and affine
integer hash families whose values are IDENTICAL in Spark column expressions
and in DuckDB SQL, so sketch lanes built on them (minhash, simhash,
winnowing) can be value-checked end-to-end by the DuckDB oracle gate.

Why it exists: the engine's default content hash is ``xxhash64`` (64-bit
space — right for 10^9-doc corpora), but no Spark-compatible xxhash64 exists
in DuckDB, which left the sketch lanes "rows-only" in the correctness gate.
Swapping the hash for a Rabin-Karp polynomial (base 31, mod 2^31-1 — exact
BIGINT arithmetic in both engines, pure ASCII-safe codepoints) makes every
downstream decision — min-hash signatures, LSH band buckets, simhash bit
sums, winnowing window minima — bit-identical across engines, so the WHOLE
ALGORITHM gets oracle-verified, not just its row count. The hash family is a
parameter of each lane: ``portable=True`` for the verified queries,
xxhash64 default for production distribution quality.

Parity contract (each helper has a Spark and a SQL form, same math):
  poly_hash(s)       = fold over codepoints: acc <- (acc*31 + cp) % P, acc0=0
  affine_i(h)        = (A[i]*h + B[i]) % P            (pairwise-independent)
  fold_bucket(v...)  = fold: acc <- (acc*1000003 + v) % P, acc0=0
with P = 2^31-1 (prime). All intermediates fit int64: a*h < P^2 < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1, prime
BASE = 31
FOLD = 1000003


def _lcg_constants(k: int = 64) -> tuple[list[int], list[int]]:
    """Deterministic affine-family constants (fixed LCG — same table is
    inlined into the oracle SQL, so both engines share one source of truth).
    """
    a_s, b_s, x = [], [], 20260817
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a_s.append(x % (P - 1) + 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b_s.append(x % P)
    return a_s, b_s


AFFINE_A, AFFINE_B = _lcg_constants(64)


def poly_hash_py(s: str) -> int:
    """Plain-Python mirror of poly_hash / poly_hash_sql (``ord`` matches
    DuckDB ``unicode`` per character) — for Arrow-stage writers that must
    emit checksums an SQL oracle can recompute (operators/export.py)."""
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % P
    return h


def poly_hash(c: Column) -> Column:
    """Rabin-Karp hash of a string column as a long in [0, P)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * BASE + x) % P,
    )


def char_codes(c: Column) -> Column:
    """Code-point array of a string column — O(len) via split(''), where a
    substr(i, 1) sweep would re-seek the UTF-8 offset per char (O(len²))."""
    return F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))


def ngram_poly_hashes(codes: Column, n: int) -> Column:
    """Array holding ``poly_hash`` of every length-n gram of a string whose
    ``char_codes`` array is the MATERIALIZED column ``codes`` — pass a
    column reference, not an inline expression (an inline expression would
    re-split the text once per element access). Each gram hash is n
    element_at lookups + the Horner mod-P fold: no per-gram substring or
    array allocation, values bit-identical to ``poly_hash`` of the slice."""

    def h(p: Column) -> Column:
        acc = F.element_at(codes, p)
        for j in range(1, n):
            acc = (acc * BASE + F.element_at(codes, p + j)) % P
        return acc

    return F.transform(F.sequence(F.lit(1), F.size(codes) - (n - 1)), h)


def affine(h: Column, i: int) -> Column:
    """i-th member of the affine hash family applied to a long column."""
    return (F.lit(AFFINE_A[i]) * h + F.lit(AFFINE_B[i])) % P


def fold_bucket(cols: list[Column]) -> Column:
    """Order-sensitive fold of long columns into one bucket key in [0, P)."""
    acc: Column = F.lit(0).cast("long")
    for c in cols:
        acc = (acc * FOLD + c) % P
    return acc


# ---- DuckDB SQL mirrors (string builders used by oracle_sql()) ----

def poly_hash_sql(expr: str) -> str:
    """DuckDB rendering of ``poly_hash`` for a string-typed SQL expression.

    list_reduce seeds the fold with the first element — identical to the
    init-0 Horner above because cp0 < P (inputs are non-empty by
    construction in every lane that hashes).
    """
    return (
        f"list_reduce([CAST(unicode(x) AS BIGINT) FOR x IN "
        f"string_split({expr}, '')], (a, b) -> (a * {BASE} + b) % {P})"
    )


def affine_sql(expr: str, i: int) -> str:
    return f"(({AFFINE_A[i]} * {expr} + {AFFINE_B[i]}) % {P})"


def fold_bucket_sql(exprs: list[str]) -> str:
    acc = "0"
    for e in exprs:
        acc = f"(({acc} * {FOLD} + {e}) % {P})"
    return acc
