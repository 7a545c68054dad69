"""Training-shard export: deterministic sharding + partitioned parquet write.

The last stage of a curation pipeline materializes the corpus as training
shards: files of roughly equal document count, grouped by split, that a
data loader can stream independently. At 100 TB the requirements are the
same as for splitting (operators/sampling.py): shard membership must be a
pure function of the document id — stable under re-runs, repartitioning,
and incremental appends — and the write must not funnel data through any
single point.

- ``shard_assign``: shard = portable affine hash of the id mod ``n_shards``
  (its own affine member, so shard and split decisions are pairwise
  independent). One projection, zero shuffle, bit-identical DuckDB mirror.
- ``export_training_shards``: split_assign + shard_assign, then ONE
  ``repartition(split, shard)`` — the only shuffle, moving each document
  exactly once to its output grouping — and a
  ``write.partitionBy(split, shard)``. Because rows arrive already grouped,
  each (split, shard) directory is written by a single task as a single
  file: the file count is n_splits × n_shards by construction, not
  tasks × partitions (the small-files explosion a naive partitionBy write
  produces at 1000 executors).
- ``export_manifest``: per-(split, shard) document count + an
  order-insensitive portable-hash membership checksum computed FROM THE
  WRITTEN FILES, so a round-trip defect (lost row, misfiled partition,
  mangled id) is caught by comparing against the same arithmetic applied to
  the source table — which is exactly what the DuckDB oracle does.

Shard count policy: callers size ``n_shards ≈ corpus_bytes /
target_shard_bytes`` from table statistics (the same policy note as
sampling's exact-k discussion); hash sharding balances counts to within
O(1/sqrt(docs_per_shard)) without measuring anything.

Reference analog: none — the reference's corpus is one site and its sink is
a search index (europarl/elasticsearch_index.py); this lane belongs to the
training-data suite the engine adds on top (README "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sampling

SHARD_MEMBER = 43  # affine member for shard assignment
CHECKSUM_MEMBER = 44  # affine member for the manifest membership checksum


# shard/checksum hashing shares sampling's id_hash: integral ids hash from
# their value, URL/UUID-style string ids via poly_hash — a bare cast('long')
# would NULL out non-numeric ids and misfile every such row (r3 ADVICE trap)
_id_hash = sampling.id_hash
_id_hash_sql = sampling.id_hash_sql


def shard_assign(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Append a ``shard`` column in [0, n_shards): portable hash of the id
    mod n_shards. Pure projection — same id ⇒ same shard on any cluster."""
    return docs.withColumn(
        "shard", F.pmod(_id_hash(id_col, SHARD_MEMBER), F.lit(n_shards)).cast("int")
    )


def shard_assign_sql(n_shards: int, id_expr: str = "doc_id") -> str:
    """DuckDB mirror of ``shard_assign`` (same constants, same arithmetic)."""
    h = _id_hash_sql(id_expr, SHARD_MEMBER)
    return f"CAST((({h}) % {n_shards} + {n_shards}) % {n_shards} AS INTEGER)"


def checksum_sql(id_expr: str = "doc_id") -> str:
    """DuckDB mirror of the manifest membership checksum term."""
    return _id_hash_sql(id_expr, CHECKSUM_MEMBER)


def export_training_shards(
    docs: DataFrame,
    root: str,
    weights: dict[str, float],
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write ``docs`` as ``root/split=<name>/shard=<k>/*.parquet``.

    split and shard are deterministic hash assignments; the single
    ``repartition`` below is the plan's only shuffle and guarantees one
    task — hence one file — per (split, shard) directory."""
    assigned = shard_assign(
        sampling.split_assign(docs, weights, id_col=id_col), n_shards, id_col=id_col
    )
    (
        assigned.repartition(len(weights) * n_shards, "split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(root)
    )


def export_manifest(
    spark: SparkSession, root: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-(split, shard) manifest over the WRITTEN shards: document count
    plus an order-insensitive membership checksum (sum of a portable hash of
    each id — commutative, so partition layout and file order can't affect
    it). Reading back through the partition columns means a misfiled or
    dropped row changes exactly the rows a comparison against the source
    table will flag."""
    return (
        spark.read.parquet(root)
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_id_hash(id_col, CHECKSUM_MEMBER)).alias("id_checksum"),
        )
    )


def manifest_sql(
    weights: dict[str, float],
    n_shards: int,
    table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror of export→manifest, computed from the SOURCE table: if
    the written shards' manifest matches this, the round trip lost nothing
    and filed every document where the hash arithmetic says it belongs."""
    split = sampling.split_assign_sql(weights, id_expr)
    shard = shard_assign_sql(n_shards, id_expr)
    chk = checksum_sql(id_expr)
    return (
        f"SELECT {split} AS split, {shard} AS shard, "
        f"COUNT(*) AS n_docs, SUM({chk}) AS id_checksum "
        f"FROM {table} GROUP BY 1, 2"
    )
