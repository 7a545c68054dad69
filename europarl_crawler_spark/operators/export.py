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
        f"COUNT(*) AS n_docs, CAST(SUM({chk}) AS BIGINT) AS id_checksum "
        f"FROM {table} GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# WebDataset-style tar shards — the de-facto multimodal training layout
# ---------------------------------------------------------------------------

WDS_CHECK_COLS = "shard int, n_samples long, key_checksum long, caption_checksum long"


def export_webdataset(
    pairs: DataFrame,
    root: str,
    n_shards: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    ext_col: str = "fmt",
    caption_col: str = "caption",
) -> DataFrame:
    """Write image+caption pairs as WebDataset tar shards
    (``root/shard-%05d.tar``; each sample = adjacent members ``<key>.<ext>``
    + ``<key>.txt`` — the layout streaming data loaders consume shard-
    independently). Sharding is the same portable affine hash mod
    ``n_shards`` as the parquet export, so membership is a pure function of
    the id. ONE ``repartition`` moves each pair exactly once; rows are
    sorted by key within partitions so every tar is byte-deterministic
    (zeroed mtime/uid/uname) and members stream out one at a time — a shard
    never buffers in memory. ``root`` must be storage every executor can
    write (shared fs / fuse mount on a real cluster).

    Returns one receipt row per shard: sample count, tar byte size, and
    order-insensitive key/caption checksums (sum of the portable Rabin-Karp
    hash mod P) that a DuckDB oracle recomputes from the source table."""
    import io
    import tarfile
    from pathlib import Path

    import pandas as pd

    from ..functions.porthash import P, poly_hash_py

    Path(root).mkdir(parents=True, exist_ok=True)
    assigned = shard_assign(pairs, n_shards, id_col=id_col)
    parts = assigned.repartition(n_shards, "shard").sortWithinPartitions(id_col)
    icol, bcol, ecol, ccol = id_col, bytes_col, ext_col, caption_col

    def write(it):
        state: dict[int, dict] = {}
        for pdf in it:
            for sh, key, data, ext, cap in zip(
                pdf["shard"], pdf[icol], pdf[bcol], pdf[ecol], pdf[ccol]
            ):
                st = state.get(int(sh))
                if st is None:
                    path = Path(root) / f"shard-{int(sh):05d}.tar"
                    fh = open(path, "wb")
                    st = state[int(sh)] = {
                        "tar": tarfile.open(fileobj=fh, mode="w"),
                        "fh": fh, "path": path, "n": 0, "kc": 0, "cc": 0,
                    }
                k, cap = str(key), str(cap)
                for name, payload in (
                    (f"{k}.{ext}", bytes(data)),
                    (f"{k}.txt", cap.encode("utf-8")),
                ):
                    ti = tarfile.TarInfo(name)
                    ti.size = len(payload)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    st["tar"].addfile(ti, io.BytesIO(payload))
                st["n"] += 1
                st["kc"] = (st["kc"] + poly_hash_py(k)) % P
                st["cc"] = (st["cc"] + poly_hash_py(cap)) % P
        rows = []
        for sh, st in sorted(state.items()):
            st["tar"].close()
            st["fh"].close()
            rows.append(
                (sh, st["n"], st["path"].stat().st_size, st["kc"], st["cc"])
            )
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["shard", "n_samples", "tar_bytes", "key_checksum", "caption_checksum"],
            )

    return parts.mapInPandas(
        write,
        schema="shard int, n_samples long, tar_bytes long, "
        "key_checksum long, caption_checksum long",
    )


def read_webdataset_manifest(spark: SparkSession, root: str) -> DataFrame:
    """Re-read the WRITTEN tars and recompute the receipt from the files —
    the round-trip verifier (same stance as export_manifest): member
    pairing (<key>.<ext> ↔ <key>.txt) is asserted per shard, counts and
    key/caption checksums come from the extracted members, so a lost,
    mangled, or mispaired sample anywhere in pack→unpack changes the row.
    One task per tar — reading scales with the shard count."""
    import re
    import tarfile
    from pathlib import Path

    import pandas as pd

    from ..functions.porthash import P, poly_hash_py

    paths = sorted(str(p) for p in Path(root).glob("shard-*.tar"))
    pdf_paths = spark.createDataFrame([(p,) for p in paths], "path string")

    def readback(it):
        for pdf in it:
            rows = []
            for p in pdf["path"]:
                shard = int(re.search(r"shard-(\d+)\.tar$", p).group(1))
                caps: dict[str, str] = {}
                imgs: set[str] = set()
                with tarfile.open(p) as tf:
                    for m in tf.getmembers():
                        base, _, ext = m.name.rpartition(".")
                        if ext == "txt":
                            caps[base] = tf.extractfile(m).read().decode("utf-8")
                        else:
                            imgs.add(base)
                if set(caps) != imgs:
                    raise ValueError(f"webdataset: unpaired members in {p}")
                n = kc = cc = 0
                for k in caps:
                    n += 1
                    kc = (kc + poly_hash_py(k)) % P
                    cc = (cc + poly_hash_py(caps[k])) % P
                rows.append((shard, n, kc, cc))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["shard", "n_samples", "key_checksum", "caption_checksum"]
                )

    return pdf_paths.repartition(max(len(paths), 1)).mapInPandas(
        readback, schema=WDS_CHECK_COLS
    )


def webdataset_manifest_sql(
    n_shards: int, table: str = "documents", id_expr: str = "doc_id",
    caption_expr: str = "substr(text, 1, 80)",
) -> str:
    """DuckDB mirror of the webdataset receipt, computed from the SOURCE:
    shard arithmetic via shard_assign_sql, key/caption checksums via the
    portable Rabin-Karp hash of the stringified id / caption text."""
    from ..functions.porthash import P, poly_hash_sql

    kh = poly_hash_sql(f"CAST({id_expr} AS VARCHAR)")
    ch = poly_hash_sql(caption_expr)
    return (
        f"SELECT {shard_assign_sql(n_shards, id_expr)} AS shard, "
        f"COUNT(*) AS n_samples, "
        f"CAST(SUM({kh}) % {P} AS BIGINT) AS key_checksum, "
        f"CAST(SUM({ch}) % {P} AS BIGINT) AS caption_checksum "
        f"FROM {table} GROUP BY 1"
    )
