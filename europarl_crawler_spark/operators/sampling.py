"""Deterministic corpus splitting and sampling for training-data curation.

A 100 TB training corpus needs reproducible membership decisions that never
depend on partitioning, execution order, or a session seed: train/val/test
splits must be STABLE under re-runs, incremental appends, and engine
versions, or evaluation leaks. The standard pattern (what `df.randomSplit`
cannot give you — its assignment is partition-order-dependent) is a
content-keyed hash split: each row's split is a pure function of its id, so
the same document lands in the same split on any cluster, any day.

Everything here is a single projection of portable-hash column expressions
(functions/porthash.py: exact int64 arithmetic reproducible in DuckDB SQL),
so the lanes are value-oracle-checked end-to-end, zero shuffle, and
trivially whole-stage-codegen'd:

- ``split_assign``     : id → one of K named splits by cumulative weight
                         ranges over u = affine(id-hash)/P ∈ [0,1).
- ``sample``           : deterministic Bernoulli(fraction) keep-filter on a
                         DIFFERENT affine member, so sampling is independent
                         of the split assignment.
- ``stratified_sample``: per-stratum fractions (e.g. rebalance languages) via
                         a broadcast join against a tiny fractions dimension.
- ``repeat_factor_sample``: mixture reweighting — each row repeated
                         floor(f) + Bernoulli(frac(f)) times for its
                         stratum's factor f, as a map-side explode.

Exact-k-per-stratum sampling is deliberately absent: it needs a per-stratum
rank (a window whose partition count = #strata — maximally skewed when
strata are languages), and at corpus scale the fraction form is what
pipelines actually run. Callers that need "about k" compute
fraction = k / stratum_count from table stats.

Reference analog: the reference has no sampling surface (its corpus is one
site); this is part of the training-data operator suite the engine adds on
top (README "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import porthash

# distinct affine members so split / sample / stratified decisions are
# pairwise-independent even over the same id
SPLIT_MEMBER = 40
SAMPLE_MEMBER = 41
STRATA_MEMBER = 42
REPEAT_MEMBER = 45


# ids that are signed decimal integers short enough to always fit an int64
# take the numeric path on BOTH engines; everything else (URL/UUID-style
# keys, ≥19-digit strings that would overflow a cast) is poly-hashed
_INTEGRAL_ID = "^-?[0-9]{1,18}$"


def id_hash(id_col: str, member: int) -> Column:
    """id column (integral OR string — URL/UUID keys included) → portable
    affine hash in [0, P). An integral id hashes from its VALUE (so long and
    string renderings of the same number agree); any other string hashes via
    ``porthash.poly_hash`` of its characters. Without the string branch a
    ``cast('long')`` on a non-numeric id yields NULL and every downstream
    when/filter silently drops or misfiles the row — the r3 ADVICE trap."""
    s = F.col(id_col).cast("string")
    raw = (
        F.when(s.rlike(_INTEGRAL_ID), s.cast("long"))
        .when(F.length(s) == 0, F.lit(0).cast("long"))
        .otherwise(porthash.poly_hash(s))
    )
    return porthash.affine(F.pmod(raw, F.lit(porthash.P)), member)


def id_hash_sql(id_expr: str, member: int) -> str:
    """DuckDB mirror of ``id_hash`` (same regex gate, same constants)."""
    s = f"CAST({id_expr} AS VARCHAR)"
    raw = (
        f"CASE WHEN regexp_matches({s}, '{_INTEGRAL_ID}') "
        f"THEN CAST({s} AS BIGINT) "
        f"WHEN length({s}) = 0 THEN 0 "
        f"ELSE {porthash.poly_hash_sql(s)} END"
    )
    return porthash.affine_sql(
        f"((({raw}) % {porthash.P}) + {porthash.P}) % {porthash.P}", member
    )


def _id_unit(id_col: str, member: int) -> Column:
    """id column (long or string) → u ∈ [0, 1): ``id_hash`` divided by P.
    A genuinely NULL id keeps a NULL u (split_assign sends it to the
    last-named split; sample/stratified_sample drop it) — callers with
    nullable keys should filter or coalesce upstream."""
    return id_hash(id_col, member) / F.lit(float(porthash.P))


def _id_unit_sql(id_expr: str, member: int) -> str:
    """DuckDB mirror of ``_id_unit`` (same constants, same arithmetic)."""
    return f"(CAST({id_hash_sql(id_expr, member)} AS DOUBLE) / {porthash.P})"


def split_assign(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Append a ``split`` column: the named split whose cumulative-weight
    interval contains u(id). Weights are normalized; interval edges are
    closed-open so every u maps to exactly one split. Assignment is a pure
    projection — membership survives repartitioning, appends, and re-runs."""
    total = float(sum(weights.values()))
    u = _id_unit(id_col, SPLIT_MEMBER)
    expr: Column | None = None
    acc = 0.0
    names = list(weights.items())
    for name, wgt in names[:-1]:
        acc += wgt / total
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", out)


def split_assign_sql(weights: dict[str, float], id_expr: str = "doc_id") -> str:
    """DuckDB CASE expression mirroring ``split_assign`` exactly."""
    total = float(sum(weights.values()))
    u = _id_unit_sql(id_expr, SPLIT_MEMBER)
    names = list(weights.items())
    parts = ["CASE"]
    acc = 0.0
    for name, wgt in names[:-1]:
        acc += wgt / total
        parts.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    parts.append(f"ELSE '{names[-1][0]}' END")
    return " ".join(parts)


def sample(
    docs: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli(fraction) subsample: keep rows with
    u(id) < fraction. Same id ⇒ same decision, always — so downstream
    joins between independently-sampled tables stay consistent."""
    return docs.filter(_id_unit(id_col, SAMPLE_MEMBER) < F.lit(float(fraction)))


def sample_keep_sql(fraction: float, id_expr: str = "doc_id") -> str:
    """DuckDB WHERE predicate mirroring ``sample``."""
    return f"{_id_unit_sql(id_expr, SAMPLE_MEMBER)} < {float(fraction)!r}"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row when
    u(id) < fraction(stratum). ``fractions`` rides in as a broadcast
    dimension (strata counts are small — languages, sources, quality bands),
    so the plan is scan → broadcast-hash-join → filter: no shuffle of the
    corpus, no skew sensitivity (the hot stratum is a map-side filter like
    every other)."""
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(k, float(v)) for k, v in fractions.items()],
        f"{strata_col} string, _frac double",
    )
    u = _id_unit(id_col, STRATA_MEMBER)
    return (
        docs.join(F.broadcast(dim), strata_col, "left")
        .filter(u < F.coalesce(F.col("_frac"), F.lit(float(default_fraction))))
        .drop("_frac")
    )


def repeat_factor_sample(
    docs: DataFrame,
    factors: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_factor: float = 0.0,
) -> DataFrame:
    """Deterministic mixture reweighting (repeat-factor sampling): each row
    appears ``floor(f) + Bernoulli(frac(f))`` times for its stratum's factor
    ``f ≥ 0``, with a 0-based ``copy`` index — f = 2.5 means every doc twice
    plus half the docs (chosen by id hash) a third time; f = 0.4 is plain
    thinning. This is how training pipelines up-weight scarce/high-quality
    domains and down-weight the rest while keeping the epoch a flat scan.

    Plan shape: broadcast factors dim → map-side ``explode(sequence())`` —
    the multiplication is narrow (no shuffle), so up-weighting a hot stratum
    fans out in place instead of concentrating on one reducer."""
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(k, float(v)) for k, v in factors.items()],
        f"{strata_col} string, _f double",
    )
    u = _id_unit(id_col, REPEAT_MEMBER)
    f = F.coalesce(F.col("_f"), F.lit(float(default_factor)))
    n = (
        F.floor(f).cast("long")
        + F.when(u < f - F.floor(f), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        docs.join(F.broadcast(dim), strata_col, "left")
        .withColumn("_n", n)
        .drop("_f")
        .filter(F.col("_n") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1))
        )
        .drop("_n")
    )


def repeat_factor_n_sql(
    factors: dict[str, float],
    strata_expr: str = "lang",
    id_expr: str = "doc_id",
    default_factor: float = 0.0,
) -> str:
    """DuckDB expression for the per-row copy count, mirroring
    ``repeat_factor_sample`` exactly (same member, same float arithmetic).
    Embed as: ``SELECT ..., unnest(generate_series(0, {n} - 1)) AS copy``."""
    u = _id_unit_sql(id_expr, REPEAT_MEMBER)
    case = ["CASE"]
    for k, v in factors.items():
        case.append(f"WHEN {strata_expr} = '{k}' THEN {float(v)!r}")
    case.append(f"ELSE {float(default_factor)!r} END")
    f = f"({' '.join(case)})"
    return (
        f"(CAST(floor({f}) AS BIGINT) + "
        f"CASE WHEN {u} < {f} - floor({f}) THEN 1 ELSE 0 END)"
    )


def stratified_keep_sql(
    fractions: dict[str, float],
    strata_expr: str = "lang",
    id_expr: str = "doc_id",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE predicate mirroring ``stratified_sample`` (the dimension
    join folded into a CASE — same values, same comparisons)."""
    u = _id_unit_sql(id_expr, STRATA_MEMBER)
    case = ["CASE"]
    for k, v in fractions.items():
        case.append(f"WHEN {strata_expr} = '{k}' THEN {float(v)!r}")
    case.append(f"ELSE {float(default_fraction)!r} END")
    return f"{u} < ({' '.join(case)})"


IMPORTANCE_MEMBER = 46


def importance_sample(
    docs: DataFrame, score_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Quality-weighted (importance) sampling — keep each row with
    probability equal to its per-row score in [0, 1] (a classifier quality
    score: the DCLM / FineWeb-edu curation move of sampling the corpus
    toward high-quality documents instead of hard-thresholding), decided
    hash-deterministically: the row survives iff u(id) < clamp(score, 0, 1)
    on its own affine member, so membership is reproducible across runs,
    partitions, and engines, and independent of the split/sample members.
    Zero shuffle, pure projection+filter; NULL or ≤0 scores drop, ≥1 always
    keeps."""
    u = _id_unit(id_col, IMPORTANCE_MEMBER)
    p = F.least(
        F.greatest(F.col(score_col).cast("double"), F.lit(0.0)), F.lit(1.0)
    )
    return docs.filter(u < p)


def importance_keep_sql(score_expr: str, id_expr: str = "doc_id") -> str:
    """DuckDB WHERE predicate mirroring ``importance_sample``."""
    p = f"least(greatest(CAST({score_expr} AS DOUBLE), 0.0), 1.0)"
    return f"({_id_unit_sql(id_expr, IMPORTANCE_MEMBER)} < {p})"
