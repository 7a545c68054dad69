"""Snapshot-isolated epoch tables over Parquet — the Iceberg stand-in.

The north_rule requires Iceberg tables with snapshot-isolated upserts per
crawl epoch, resumable from checkpoint. No Iceberg runtime jar exists in this
sandbox (verified: /opt/spark jars have none, no network), so this module
emulates the subset we need with a **merge-on-read** layout that is honest
about 10^10-row scale:

    {root}/{table}/epoch=N/part-*.parquet      ← per-epoch DELTA (only new /
                                                  changed / tombstoned rows)
    {root}/{table}/_manifests/{N:08d}.json     ← commit record (written LAST —
                                                  the atomic commit point)

- ``merge(table, df, epoch, keys)`` appends a delta; readers resolve
  latest-wins per key with ``row_number() over (partition by keys order by
  _epoch desc)`` — the same merge-on-read strategy Iceberg v2 position/equality
  deletes use. A full-table rewrite per epoch (the naive emulation) would be
  O(table) per epoch and is exactly what we avoid.
- deletes are tombstone rows (``_deleted = true``) folded out at read time —
  used for the reference's shutdown ``drop_uncrawled_urls`` (reference:
  europarl/db/url.py:139-156, SURVEY D4).
- ``compact(table, epoch)`` collapses base+deltas into a new base snapshot so
  read amplification stays bounded (run every K epochs, like Iceberg
  rewrite_data_files); ``target_partitions`` bounds the small-file count.
- ``expire(table)`` physically drops epochs superseded by the newest base
  (Iceberg expire_snapshots) so the store footprint is bounded at 10^10-row
  scale; expired time travel / pre-watermark incremental reads raise.
- a data dir without its manifest is an aborted write: ignored on read,
  clobbered on retry. Resume = read manifests, continue from max committed
  epoch. Equivalent to the reference's "only fully-processed work commits"
  shutdown protocol (SURVEY T7).

On a real cluster this module is swapped for ``MERGE INTO`` on Iceberg; the
call sites (plans/epoch.py) only use merge/append/read/latest, which map 1:1.
The exact production statements — DDL, MERGE, maintenance CALLs, time travel,
changelog — live in ``icebridge.py`` (emit_* pure functions + an executing
drop-in class), pinned by tests/test_icebridge.py including a Spark-parser
parse check, so the migration is a config change, not a rewrite.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stat_value(v):
    """Footer min/max → a JSON-able, ORDER-PRESERVING scalar: numbers and
    strings as-is, timestamps/dates as ISO strings (lexicographic ==
    chronological), undecodable bytes dropped (prune must stay sound)."""
    import datetime as _dt

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        # One convention for both sides of the compare: Spark writes
        # UTC-adjusted parquet timestamps, so pyarrow footer stats come
        # back tz-aware while caller predicates are usually naive UTC.
        # An aware ISO string ('…+00:00') sorts above the equal naive one
        # and would wrongly prune at exact boundary equality — convert
        # aware → UTC then strip tzinfo so every value stringifies naive.
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def _cmp_gt(a, b) -> bool:
    """a > b, but incomparable (mixed-type) bounds NEVER prune a file."""
    try:
        return a > b
    except TypeError:
        return False


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency failure: another writer advanced the table's
    manifest chain (or committed this exact epoch) between this commit's
    snapshot read and its commit point. The loser's data directory is left
    manifest-less — invisible to readers, clobbered on retry — exactly like
    a losing Iceberg commit's orphaned data files."""


class EpochStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest chain -----------------------------------------------------

    def _mdir(self, table: str) -> Path:
        return self.root / table / "_manifests"

    def manifests(self, table: str) -> list[dict]:
        mdir = self._mdir(table)
        if not mdir.is_dir():
            return []
        out = []
        for p in sorted(mdir.glob("*.json")):
            with open(p) as f:
                out.append(json.load(f))
        return out

    def latest(self, table: str) -> int | None:
        ms = self.manifests(table)
        return ms[-1]["epoch"] if ms else None

    def rollback(self, table: str, to_epoch: int) -> None:
        """Drop every commit after ``to_epoch`` (manifests first, then data)."""
        for m in self.manifests(table):
            if m["epoch"] > to_epoch:
                (self._mdir(table) / f"{m['epoch']:08d}.json").unlink()
                shutil.rmtree(self.root / table / f"epoch={m['epoch']}", ignore_errors=True)

    # -- write paths ---------------------------------------------------------

    def _commit(self, table: str, df: DataFrame, epoch: int, kind: str, keys) -> dict:
        """Write a delta/base/append epoch with OPTIMISTIC CONCURRENCY
        (Iceberg-style parent-CAS): the parent snapshot is captured before
        the data write, re-validated at the commit point, and the manifest
        is published with an EXCLUSIVE create (hard link — atomic AND
        fails-if-exists), so two concurrent writers can never silently fork
        the chain or last-writer-win the same epoch: the stale one raises
        ``CommitConflictError`` and its data dir stays manifest-less
        (ignored by readers, clobbered on retry)."""
        epoch = int(epoch)
        expected_parent = self.latest(table)
        if expected_parent is not None and epoch <= expected_parent:
            raise CommitConflictError(
                f"{table}: epoch {epoch} does not advance the chain "
                f"(latest committed is {expected_parent})"
            )
        mpath = self._mdir(table) / f"{epoch:08d}.json"
        ddir = self.root / table / f"epoch={epoch}"
        if ddir.exists():  # manifest-less ⇒ aborted earlier attempt — clobber
            shutil.rmtree(ddir)
        out = df.withColumn("_epoch", F.lit(epoch))
        if "_deleted" not in out.columns:
            out = out.withColumn("_deleted", F.lit(False))
        out.write.mode("overwrite").parquet(str(ddir))
        # row count + per-file column min/max from parquet FOOTERS —
        # metadata-only, no Spark job. The stats ride in the manifest the
        # way Iceberg manifests carry per-data-file bounds, and are what
        # ``scan`` prunes with.
        import pyarrow.parquet as pq

        rows = 0
        file_stats: dict[str, dict[str, list]] = {}
        for p in sorted(ddir.glob("*.parquet")):
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            fstat: dict[str, list] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if "." in col.path_in_schema:
                        continue  # nested field — no top-level bound
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    mn, mx = _stat_value(st.min), _stat_value(st.max)
                    if mn is None or mx is None:
                        continue
                    cur = fstat.get(col.path_in_schema)
                    if cur is None:
                        fstat[col.path_in_schema] = [mn, mx]
                    else:
                        cur[0], cur[1] = min(cur[0], mn), max(cur[1], mx)
            file_stats[p.name] = fstat
        manifest = {
            "table": table,
            "epoch": epoch,
            "parent": expected_parent,
            "kind": kind,
            "keys": list(keys) if keys else None,
            "rows": rows,
            "files": len(file_stats),
            "file_stats": file_stats,
        }
        self._mdir(table).mkdir(parents=True, exist_ok=True)
        # commit point: CAS on the parent...
        if self.latest(table) != expected_parent:
            raise CommitConflictError(
                f"{table}: concurrent commit detected — parent moved from "
                f"{expected_parent} to {self.latest(table)} during epoch "
                f"{epoch}'s write; retry against the new snapshot"
            )
        # ...then publish atomically AND exclusively: link(2) fails with
        # EEXIST if another writer won the race to this epoch number, and
        # the fully-written tmp file means readers never see a torn manifest
        tmp = mpath.with_suffix(f".json.tmp{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, mpath)
        except FileExistsError:
            raise CommitConflictError(
                f"{table}: epoch {epoch} was committed by a concurrent writer"
            ) from None
        finally:
            os.unlink(tmp)
        return manifest

    def merge(self, table: str, df: DataFrame, epoch: int, keys: list[str]) -> dict:
        """Upsert delta: latest row per key wins at read time (D1–D3 semantics:
        re-merging the same batch is idempotent — same keys, same values)."""
        return self._commit(table, df, epoch, "delta", keys)

    def delete(self, table: str, keys_df: DataFrame, epoch: int, keys: list[str]) -> dict:
        """Tombstone the given keys (reference DELETE, SURVEY D4)."""
        return self._commit(
            table, keys_df.select(*keys).withColumn("_deleted", F.lit(True)), epoch, "delta", keys
        )

    def append(self, table: str, df: DataFrame, epoch: int) -> dict:
        """Append-only table (the requests crawl log, SURVEY D11)."""
        return self._commit(table, df, epoch, "append", None)

    def overwrite(self, table: str, df: DataFrame, epoch: int, keys: list[str] | None = None) -> dict:
        """Full base snapshot (initial load / compaction output)."""
        return self._commit(table, df, epoch, "base", keys)

    def compact(
        self,
        table: str,
        spark: SparkSession,
        epoch: int,
        target_partitions: int | None = None,
    ) -> dict:
        """Fold base+deltas into a fresh base so read cost stays O(1) deltas.

        ``target_partitions`` also fixes the SMALL-FILE problem compaction
        exists for (Iceberg rewrite_data_files' target-file-size): per-epoch
        deltas write one file per task, so after K epochs a reader opens
        O(K·tasks) footers; the rewrite coalesces to a bounded file count."""
        resolved = self.read(table, spark)
        keys = self._keys(table)
        out = resolved.drop("_epoch", "_deleted")
        if target_partitions:
            if keys:
                # repartition(n, keys) alone can be ELIDED: the resolve's
                # row_number window already hash-partitions by the same keys,
                # EnsureRequirements drops the "redundant" user exchange, and
                # AQE is then free to coalesce the window's internal exchange
                # below n (observed: 1 file at shuffle.partitions=2). The
                # extra constant expression changes the partitioning identity
                # — same key clustering, but the user-specified exchange (and
                # its exact partition count) survives.
                out = out.repartition(
                    target_partitions, *[F.col(k) for k in keys], F.lit(0)
                )
            else:
                out = out.repartition(target_partitions)
        return self.overwrite(table, out, epoch, keys)

    def rewrite_sorted(
        self,
        table: str,
        spark: SparkSession,
        epoch: int,
        x_col: str,
        x_bounds: tuple[int, int],
        y_col: str,
        y_bounds: tuple[int, int],
        n_files: int,
    ) -> dict:
        """Iceberg ``rewrite_data_files(strategy => 'sort', sort_order =>
        'zorder(x, y)')`` analog: compact the table into ``n_files`` files
        clustered by the Morton interleave of (x, y), so the per-file
        min/max bounds the commit records become a usable index on BOTH
        columns (consumed by ``scan``). Bounds are the layout's fixed grid
        spec, not data-sniffed — see operators/zorder.py."""
        from ..operators import zorder

        resolved = self.read(table, spark).drop("_epoch", "_deleted")
        laid = zorder.zorder_layout(
            resolved, x_col, x_bounds, y_col, y_bounds, shard_bits=1
        )
        out = (
            laid.repartitionByRange(int(n_files), "_z")
            .sortWithinPartitions("_z")
            .drop("_z", "_zshard")
        )
        return self.overwrite(table, out, epoch, self._keys(table))

    # -- stat-pruned scans ---------------------------------------------------

    def prune_files(
        self,
        table: str,
        col: str,
        lo=None,
        hi=None,
        as_of: int | None = None,
        extra: list[tuple] | None = None,
    ) -> tuple[list[str], int]:
        """(surviving data-file paths, total live files) for the predicate
        ``lo <= col <= hi`` — conjoined with any ``extra`` (col, lo, hi)
        predicates — against the manifests' per-file bounds: the Iceberg
        manifest-pruning step as a visible number. A file is dropped if
        ANY conjunct's range misses its bounds (conjunction prunes the
        intersection — with a Z-ordered layout, an (x AND y) probe keeps
        only the files whose RECTANGLE overlaps both ranges, strictly
        fewer than either dimension alone). Files without a recorded
        bound for a column survive that conjunct (pruning must never be
        the component that drops a row)."""
        preds = [(col, lo, hi)] + [tuple(e) for e in (extra or [])]
        preds = [(c, _stat_value(l), _stat_value(h)) for c, l, h in preds]
        ms = [
            m
            for m in self.manifests(table)
            if as_of is None or m["epoch"] <= as_of
        ]
        base_idx = max(
            (i for i, m in enumerate(ms) if m["kind"] == "base"), default=None
        )
        live = ms if base_idx is None else ms[base_idx:]
        kept, total = [], 0
        for m in live:
            ddir = self.root / table / f"epoch={m['epoch']}"
            stats = m.get("file_stats") or {}
            for p in sorted(ddir.glob("*.parquet")):
                total += 1
                fstat = stats.get(p.name, {})
                dropped = False
                for c, l, h in preds:
                    b = fstat.get(c)
                    if b is None:
                        continue
                    fmin, fmax = b
                    if (h is not None and _cmp_gt(fmin, h)) or (
                        l is not None and _cmp_gt(l, fmax)
                    ):
                        dropped = True
                        break
                if not dropped:
                    kept.append(str(p))
        return kept, total

    def scan(
        self,
        table: str,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        as_of: int | None = None,
        extra: list[tuple] | None = None,
    ) -> DataFrame:
        """``read`` + filter ``lo <= col <= hi`` (AND any ``extra``
        (col, lo, hi) conjuncts), but files whose footer bounds exclude
        the range are never opened. Since r5 this is a thin alias for
        ``read(..., predicates=...)`` — pruning is part of the ordinary
        read path, not an opt-in API."""
        return self.read(
            table,
            spark,
            as_of=as_of,
            predicates=[(col, lo, hi)] + [tuple(e) for e in (extra or [])],
        )

    def expire(self, table: str) -> dict:
        """Iceberg ``expire_snapshots`` analog: physically drop every epoch
        STRICTLY OLDER than the newest base snapshot — they are superseded
        for latest reads (``read`` starts at the newest base), so at
        10^10-row scale this is what bounds the store's footprint.

        The trade is the same one Iceberg makes: time travel to an expired
        snapshot and incremental reads from before the expiry watermark are
        gone — both now RAISE (watermark recorded in ``_expired.json``)
        instead of silently answering from missing data."""
        ms = self.manifests(table)
        bases = [m for m in ms if m["kind"] == "base"]
        if not bases:
            return {"table": table, "expired": [], "watermark": None}
        wm = bases[-1]["epoch"]
        expired = []
        for m in ms:
            if m["epoch"] < wm:
                (self._mdir(table) / f"{m['epoch']:08d}.json").unlink()
                shutil.rmtree(
                    self.root / table / f"epoch={m['epoch']}", ignore_errors=True
                )
                expired.append(m["epoch"])
        wpath = self.root / table / "_expired.json"
        tmp = wpath.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump({"watermark": wm}, f)
        os.replace(tmp, wpath)
        return {"table": table, "expired": expired, "watermark": wm}

    def _expiry_watermark(self, table: str) -> int | None:
        wpath = self.root / table / "_expired.json"
        if not wpath.is_file():
            return None
        with open(wpath) as f:
            return json.load(f)["watermark"]

    # -- read path ------------------------------------------------------------

    def _keys(self, table: str) -> list[str] | None:
        for m in reversed(self.manifests(table)):
            if m["keys"]:
                return m["keys"]
        return None

    def read(
        self,
        table: str,
        spark: SparkSession,
        schema: T.StructType | None = None,
        as_of: int | None = None,
        predicates: list[tuple] | None = None,
    ) -> DataFrame:
        """Resolved view of the table at snapshot ``as_of`` (default: latest).

        Time travel = replay manifests up to as_of, exactly like reading an
        older Iceberg snapshot.

        ``predicates`` — optional conjuncts ``[(col, lo, hi), ...]``
        (either bound may be None) pushed into the read: the residual
        filter ALWAYS applies (exactness never depends on stats), and when
        pruning is sound — append tables, or keyed tables with no live
        deltas past the newest base — files whose footer bounds exclude
        the range are never opened (the Iceberg manifest-pruning step in
        the ordinary read path, r4 VERDICT next-round #8). With live keyed
        deltas the prune is skipped: dropping a file before latest-wins
        could resurrect a superseded row. Every predicated read records
        ``self.last_prune = {table, kept, total}`` so callers/tests can
        see the file skipping actually happen."""
        wm = self._expiry_watermark(table)
        if as_of is not None and wm is not None and as_of < wm:
            raise ValueError(
                f"snapshot {as_of} of {table} was expired (watermark {wm})"
            )
        ms = [m for m in self.manifests(table) if as_of is None or m["epoch"] <= as_of]
        if not ms:
            if schema is None:
                raise ValueError(f"table {table} is empty and no schema given")
            return spark.createDataFrame([], schema)
        # start from the newest base (full snapshot); apply later deltas only
        base_idx = max(
            (i for i, m in enumerate(ms) if m["kind"] == "base"), default=None
        )
        live = ms if base_idx is None else ms[base_idx:]
        keys = self._keys(table)
        need_resolve = keys and any(m["kind"] in ("delta", "base") for m in live)
        pred = None
        if predicates:
            pred = F.lit(True)
            for c, l, h in predicates:
                if l is not None:
                    pred = pred & (F.col(c) >= F.lit(l))
                if h is not None:
                    pred = pred & (F.col(c) <= F.lit(h))
        keyed_deltas = keys and any(m["kind"] == "delta" for m in live)
        if pred is not None and not keyed_deltas:
            first, *extra = list(predicates)
            kept, total = self.prune_files(
                table, first[0], first[1], first[2], as_of=as_of, extra=extra
            )
            self.last_prune = {"table": table, "kept": len(kept), "total": total}
            if not kept:
                empty = self.read(table, spark, schema=schema, as_of=as_of)
                return empty.filter(pred).limit(0)
            # no latest-wins window here: no live deltas ⇒ at most one
            # version per key already (live is a single base, or an
            # append-only chain) — the same reasoning the pre-r5 scan used
            df = spark.read.option("mergeSchema", "true").parquet(*kept)
            return df.filter(~F.col("_deleted")).filter(pred)
        if pred is not None:
            self.last_prune = {
                "table": table,
                "kept": None,  # prune skipped: live keyed deltas
                "total": None,
            }
        parts = [str(self.root / table / f"epoch={m['epoch']}") for m in live]
        # tombstone deltas carry only key columns → schemas differ per epoch
        df = spark.read.option("mergeSchema", "true").parquet(*parts)
        if need_resolve:
            w = Window.partitionBy(*keys).orderBy(F.desc("_epoch"))
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        out = df.filter(~F.col("_deleted"))
        return out.filter(pred) if pred is not None else out

    def snapshot_diff(
        self,
        table: str,
        spark: SparkSession,
        from_epoch: int,
        to_epoch: int,
    ) -> DataFrame:
        """STATE diff between two snapshots: key → 'added' | 'deleted' |
        'changed' (unchanged keys are absent). Unlike ``read_changes``
        (which replays delta files and therefore refuses to cross a
        compaction), this compares the two RESOLVED states — it works
        across base rewrites and answers the dataset-versioning question
        a training pipeline actually asks: "what moved between the
        snapshot I trained on and today's?"

        Plan shape: one full-outer join on the table keys, values packed
        into structs compared with null-safe equality — no window, no
        collect; cost is two snapshot reads + one key shuffle."""
        keys = self._keys(table)
        if not keys:
            raise ValueError(
                f"snapshot_diff({table}) needs a keyed table — append logs "
                "have no identity to diff on"
            )
        a = self.read(table, spark, as_of=from_epoch).drop("_epoch", "_deleted")
        b = self.read(table, spark, as_of=to_epoch).drop("_epoch", "_deleted")
        vals = [c for c in a.columns if c not in keys]
        a2 = a.select(*keys, F.struct(*vals).alias("_va"))
        b2 = b.select(*keys, F.struct(*vals).alias("_vb"))
        j = a2.join(b2, on=keys, how="full_outer")
        status = (
            F.when(F.col("_va").isNull(), F.lit("added"))
            .when(F.col("_vb").isNull(), F.lit("deleted"))
            .when(~F.col("_va").eqNullSafe(F.col("_vb")), F.lit("changed"))
        )
        return (
            j.withColumn("_diff", status)
            .where(F.col("_diff").isNotNull())
            .select(*keys, "_diff")
        )

    def read_changes(
        self,
        table: str,
        spark: SparkSession,
        since: int,
        until: int | None = None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Incremental scan (the Iceberg CDC / incremental-append analog):
        the NET row changes committed in epochs (since, until] — each key's
        latest version in the window, with ``_change`` = 'upsert' |
        'delete'. This is how a downstream training-data pipeline consumes
        the crawl without rescanning the table: process only what the new
        epochs wrote.

        Scale shape: reads ONLY the delta directories in the window
        (manifest-pruned — no scan of the base), one window per key within
        the window for latest-wins. Raises if the window crosses a ``base``
        snapshot (compaction rewrites every row, so 'what changed' is no
        longer answerable from data files — the same rule Iceberg's
        incremental read enforces for overwrite snapshots).
        """
        wm = self._expiry_watermark(table)
        if wm is not None and since < wm:
            raise ValueError(
                f"incremental read of {table} since epoch {since} crosses the "
                f"expiry watermark {wm}: the change history was expired"
            )
        ms = [
            m for m in self.manifests(table)
            if m["epoch"] > since and (until is None or m["epoch"] <= until)
        ]
        if not ms:
            if schema is None:
                raise ValueError(f"no commits after epoch {since} and no schema given")
            return spark.createDataFrame([], schema).withColumn(
                "_change", F.lit("upsert")
            )
        if any(m["kind"] == "base" for m in ms):
            raise ValueError(
                "incremental read across a base snapshot (compaction) is "
                "not change-preserving; read from the compacted epoch instead"
            )
        parts = [str(self.root / table / f"epoch={m['epoch']}") for m in ms]
        df = spark.read.option("mergeSchema", "true").parquet(*parts)
        keys = self._keys(table)
        if keys:
            w = Window.partitionBy(*keys).orderBy(F.desc("_epoch"))
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        return df.withColumn(
            "_change",
            F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("upsert")),
        ).drop("_deleted")
