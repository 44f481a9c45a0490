"""Stage 4: table materialization with snapshots, per-partition lineage and
resumable restarts.

On a production cluster these tables are Iceberg (``df.writeTo(catalog.table)
.createOrReplace()`` — snapshot isolation, partition pruning, time travel).
This sandbox has no Iceberg runtime jar, so ``SnapshotCatalog`` provides the
same contract on plain parquet directories:

  * atomic snapshot commit: data lands in ``<table>/snap-<id>/`` and the
    table-level ``manifest.json`` flips to the new snapshot last (readers
    always see a complete snapshot);
  * per-partition lineage: every write records, per Spark partition,
    ``(rows, checksum)`` (xor of row hashes) into the manifest — the
    resume/metrics record the north rule asks for;
  * resume: ``is_complete(table)`` lets a rerun skip finished stages and
    ``read`` serves the committed snapshot, so a killed pipeline restarts
    from its last snapshot without recomputing completed work.

The writer API is deliberately Iceberg-shaped so swapping the backend is a
one-module change.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "manifest.json")

    def manifest(self, table: str) -> dict | None:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, table: str) -> bool:
        m = self.manifest(table)
        return bool(m and m.get("status") == "committed")

    # -- lineage ----------------------------------------------------------
    @staticmethod
    def _partition_lineage(df: DataFrame) -> list[dict]:
        """Per-Spark-partition (rows, checksum) — one extra narrow job."""
        stats = (
            df.select(
                F.spark_partition_id().alias("pid"),
                F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h"),
            )
            .groupBy("pid")
            .agg(F.count("*").alias("rows"),
                 F.expr("bit_xor(h)").alias("checksum"))
            .collect()
        )
        return [
            {"partition": r["pid"], "rows": r["rows"], "checksum": str(r["checksum"])}
            for r in sorted(stats, key=lambda r: r["pid"])
        ]

    # -- write / read -----------------------------------------------------
    def _snapshot_ids(self, table: str) -> list[int]:
        """Committed snapshot ids, from the per-snapshot manifest history."""
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        ids = []
        for name in os.listdir(tdir):
            if name.startswith("manifest-") and name.endswith(".json"):
                try:
                    ids.append(int(name[len("manifest-"):-len(".json")]))
                except ValueError:
                    pass
        return sorted(ids)

    def write(self, df: DataFrame, table: str, partition_by=(),
              with_lineage: bool = True) -> dict:
        t0 = time.time()
        prev = self.manifest(table)
        # next id = max over ALL committed snapshots (not just the current
        # pointer) so a write after rollback() never overwrites history
        existing = self._snapshot_ids(table)
        snap_id = max([prev["snapshot_id"] if prev else 0] + existing) + 1
        snap_dir = os.path.join(self._table_dir(table), f"snap-{snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(snap_dir)
        committed = self.spark.read.parquet(snap_dir)
        lineage = self._partition_lineage(committed) if with_lineage else []
        manifest = {
            "table": table,
            "snapshot_id": snap_id,
            "status": "committed",
            "rows": sum(p["rows"] for p in lineage) if with_lineage else committed.count(),
            "partition_by": list(partition_by),
            "lineage": lineage,
            "wall_ms": int((time.time() - t0) * 1000),
            "parent": prev["snapshot_id"] if prev else None,
        }
        os.makedirs(self._table_dir(table), exist_ok=True)
        # immutable per-snapshot manifest first (the history record), then
        # the current pointer — the pointer replace is the atomic commit
        hist = os.path.join(self._table_dir(table), f"manifest-{snap_id}.json")
        with open(hist + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(hist + ".tmp", hist)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point
        return manifest

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        """Read the current snapshot, or TIME TRAVEL to ``snapshot_id``
        (any snapshot in the history — old snap dirs are immutable)."""
        if snapshot_id is None:
            m = self.manifest(table)
            if not m or m.get("status") != "committed":
                raise FileNotFoundError(
                    f"table {table!r} has no committed snapshot")
            snapshot_id = m["snapshot_id"]
        elif snapshot_id not in self._snapshot_ids(table):
            raise FileNotFoundError(
                f"table {table!r} has no committed snapshot {snapshot_id}")
        snap_dir = os.path.join(self._table_dir(table), f"snap-{snapshot_id}")
        return self.spark.read.parquet(snap_dir)

    def history(self, table: str) -> list[dict]:
        """All committed snapshot manifests, oldest first (Iceberg
        ``table.history()`` shape: id, parent, rows, lineage)."""
        out = []
        for sid in self._snapshot_ids(table):
            with open(os.path.join(self._table_dir(table),
                                   f"manifest-{sid}.json")) as f:
                out.append(json.load(f))
        return out

    def incremental_read(self, table: str, from_snapshot: int,
                         to_snapshot: int | None = None):
        """Iceberg incremental-consumption surface (``incremental read`` /
        changelog scan): the rows ADDED and REMOVED between two committed
        snapshots — what a downstream consumer processes to catch up from
        ``from_snapshot`` without rescanning the table. Returns
        ``(added_df, removed_df)``; ``to_snapshot`` defaults to the current
        pointer. Both snapshots stay immutable on disk, so the diff is two
        ``exceptAll`` scans (multiset semantics: duplicate rows diff by
        count) — at 10^12 docs a real Iceberg changelog avoids the scans via
        per-file manifests, which is the swap-note path."""
        new = self.read(table, to_snapshot)
        old = self.read(table, from_snapshot)
        return new.exceptAll(old), old.exceptAll(new)

    def rollback(self, table: str, snapshot_id: int) -> dict:
        """Repoint the table to an older snapshot (atomic pointer swap; no
        data is rewritten, and later writes get fresh ids — history keeps
        the abandoned snapshots)."""
        if snapshot_id not in self._snapshot_ids(table):
            raise FileNotFoundError(
                f"table {table!r} has no committed snapshot {snapshot_id}")
        with open(os.path.join(self._table_dir(table),
                               f"manifest-{snapshot_id}.json")) as f:
            manifest = json.load(f)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(table))
        return manifest

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Iceberg-style snapshot expiry (``expireSnapshots`` maintenance):
        delete snapshot data dirs + history manifests older than the
        ``keep_last`` most recent, ALWAYS keeping the current pointer's
        snapshot (a rolled-back table never loses its live data). Returns
        the removed snapshot ids; time travel to them raises afterwards."""
        import shutil

        current = self.manifest(table)
        ids = self._snapshot_ids(table)
        keep = set(ids[-keep_last:] if keep_last > 0 else [])
        if current:
            keep.add(current["snapshot_id"])
        removed = []
        for sid in ids:
            if sid in keep:
                continue
            shutil.rmtree(os.path.join(self._table_dir(table), f"snap-{sid}"),
                          ignore_errors=True)
            # idempotent like the rmtree: a concurrently-expired or manually
            # deleted manifest must not abort the loop mid-expiry
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(self._table_dir(table),
                                       f"manifest-{sid}.json"))
            removed.append(sid)
        return removed

    def write_metrics(self, stage: str, payload: dict):
        """Append a stage-level metrics record (the `_metrics` table)."""
        path = os.path.join(self.base_dir, "_metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"stage": stage, **payload}) + "\n")


class PartitionedIncrementalWriter:
    """Partition-level resume on top of SnapshotCatalog's directory layout:
    rows land under ``<table>/parts/<key>=<value>/`` one partition-value at a
    time, a sidecar manifest records completed values, and a rerun
    anti-joins completed partitions out of the input before computing
    anything for them (SURVEY.md §4 item 3). This is the finer-grained
    complement to stage-level snapshot resume: a killed backfill restarts at
    the first incomplete partition value."""

    def __init__(self, spark: SparkSession, base_dir: str, table: str,
                 partition_col: str):
        self.spark = spark
        self.table_dir = os.path.join(base_dir, table)
        self.data_dir = os.path.join(self.table_dir, "parts")
        self.partition_col = partition_col
        self.manifest_path = os.path.join(self.table_dir, "parts_manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    def completed(self) -> list:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return json.load(f)["completed"]

    def _commit(self, values: list):
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partition_col": self.partition_col,
                       "completed": sorted(values, key=str)}, f)
        os.replace(tmp, self.manifest_path)

    def pending_input(self, df: DataFrame) -> DataFrame:
        """Anti-join completed partition values out of the input (string
        compare: manifest values come from directory names)."""
        done = self.completed()
        if not done:
            return df
        done_df = self.spark.createDataFrame(
            [(str(v),) for v in done], "__done string")
        return df.join(
            F.broadcast(done_df),
            F.col(self.partition_col).cast("string") == F.col("__done"),
            "left_anti")

    def write(self, df: DataFrame, max_new: int | None = None) -> dict:
        """Write the not-yet-completed partitions of ``df``: the pending input
        is computed ONCE (partitionBy into a staging dir — not once per
        partition value, which would re-run the upstream plan O(P) times),
        then each partition directory is moved into place and committed
        atomically. ``max_new`` limits how many partition values are taken
        (used by the kill-mid-backfill test)."""
        import shutil
        from urllib.parse import unquote

        pending = self.pending_input(df)
        values = [r[0] for r in
                  pending.select(self.partition_col).distinct().collect()]
        if any(v is None or str(v) == "" for v in values):
            # Spark maps these to the __HIVE_DEFAULT_PARTITION__ sentinel,
            # which the string anti-join can never match -> endless recompute
            raise ValueError(
                f"partition column {self.partition_col!r} contains null/empty "
                f"values; filter or default them before incremental writes")
        values.sort(key=str)
        if max_new is not None:
            values = values[:max_new]
            pending = pending.filter(F.col(self.partition_col).isin(values))
        done = list(self.completed())
        if not values:
            return {"written_partitions": 0, "completed_total": len(done)}

        staging = os.path.join(self.table_dir, ".staging")
        shutil.rmtree(staging, ignore_errors=True)
        pending.write.partitionBy(self.partition_col).parquet(staging)

        written = 0
        for name in sorted(os.listdir(staging)):
            if not name.startswith(f"{self.partition_col}="):
                continue  # _SUCCESS etc.
            value = unquote(name.split("=", 1)[1])  # Spark percent-escapes
            target = os.path.join(self.data_dir, name)
            shutil.rmtree(target, ignore_errors=True)
            os.replace(os.path.join(staging, name), target)
            done.append(value)
            self._commit(done)  # atomic per-partition commit point
            written += 1
        shutil.rmtree(staging, ignore_errors=True)
        return {"written_partitions": written, "completed_total": len(done)}

    def read(self) -> DataFrame:
        return self.spark.read.option("basePath", self.data_dir).parquet(
            os.path.join(self.data_dir, "*"))


def verify_snapshot(catalog: SnapshotCatalog, table: str) -> dict:
    """Re-derive lineage for a committed snapshot and compare the
    partitioning-INDEPENDENT invariants against the manifest: total rows and
    the global xor of row checksums (xor is associative, so the fold over
    per-partition checksums is stable under any re-read split planning).
    Detects on-disk corruption or a manifest out of sync with its data."""
    manifest = catalog.manifest(table)
    if not manifest or manifest.get("status") != "committed":
        return {"ok": False, "error": "no committed snapshot"}
    expected = manifest["lineage"]
    if not expected:
        return {"ok": False, "error": "snapshot was written with_lineage=False"}
    actual = catalog._partition_lineage(catalog.read(table))

    def fold(parts):
        rows = sum(p["rows"] for p in parts)
        xor = 0
        for p in parts:
            xor ^= int(p["checksum"]) & (2**64 - 1)
        return rows, xor

    exp_rows, exp_xor = fold(expected)
    act_rows, act_xor = fold(actual)
    return {"ok": exp_rows == act_rows and exp_xor == act_xor,
            "rows_expected": exp_rows, "rows_actual": act_rows}
