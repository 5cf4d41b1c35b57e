"""Epoch snapshot store: parquet directories + an atomically-written manifest.

The Iceberg-snapshot stand-in for this sandbox (no Iceberg jars available):
each epoch writes its tables under ``<root>/epoch=NNNNN/<table>/`` and then a
``manifest.json`` LAST — a snapshot is complete iff its manifest exists, so a
crashed epoch is invisible to resume (the same commit-by-manifest protocol
Iceberg uses; swap ``write``/``read`` bodies for ``df.writeTo(...)`` /
``spark.read.table`` + snapshot ids to run on a real catalog).

Snapshot addressing + maintenance (the Iceberg table-maintenance analogs):

- every commit (epoch append or compaction) appends an entry to the
  root-level ``snapshots.json`` log and gets a monotonically increasing
  ``snapshot_id`` — ``read_merged(..., snapshot_id=...)`` time-travels to
  exactly the state visible at that commit;
- :meth:`compact` is the MERGE-equivalent over the seen-set deltas: fold
  every committed delta of a table up to an epoch into ONE base directory,
  committed as a new snapshot (readers then scan base + later deltas —
  bounded file count instead of one dir per epoch);
- :meth:`expire_deltas` is ``expire_snapshots``: physically drop delta dirs
  already covered by a base (older snapshot ids referencing them become
  unreadable, exactly like Iceberg after expiry).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CheckpointStore"]


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.root, f"epoch={epoch:05d}")

    # -- snapshot log -------------------------------------------------------

    def _snapshot_log_path(self) -> str:
        return os.path.join(self.root, "snapshots.json")

    def snapshots(self) -> list[dict]:
        """All committed snapshots, oldest first."""
        p = self._snapshot_log_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _append_snapshot(self, entry: dict) -> int:
        log = self.snapshots()
        entry = dict(entry, snapshot_id=len(log) + 1)
        log.append(entry)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".snap.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(log, f)
        os.replace(tmp, self._snapshot_log_path())
        return entry["snapshot_id"]

    def snapshot(self, snapshot_id: int) -> dict | None:
        for s in self.snapshots():
            if s["snapshot_id"] == snapshot_id:
                return s
        return None

    def write(self, epoch: int, tables: dict[str, DataFrame], extra: dict | None = None) -> None:
        """Commit an epoch snapshot ATOMICALLY: all tables plus the manifest
        are staged under a dot-prefixed temp dir (invisible to
        :meth:`latest`/:meth:`read_merged`, which only look at ``epoch=``
        dirs), then one directory rename publishes the whole epoch.  A
        writer killed mid-snapshot leaves only the temp dir; a previous
        crashed IN-PLACE attempt (table dirs but no manifest) is swept
        before publish.  Same commit shape as Iceberg: readers never see a
        torn snapshot."""
        import shutil

        edir = self._epoch_dir(epoch)
        tmpdir = tempfile.mkdtemp(
            prefix=f".epoch={epoch:05d}.", suffix=".tmp", dir=self.root
        )
        try:
            counts = {}
            for name, df in tables.items():
                df.write.mode("overwrite").parquet(os.path.join(tmpdir, name))
            manifest = {
                "epoch": epoch,
                "tables": sorted(tables),
                "counts": counts,
                "extra": extra or {},
            }
            fd, tmp = tempfile.mkstemp(dir=tmpdir, suffix=".manifest.tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, os.path.join(tmpdir, "manifest.json"))
            if os.path.isdir(edir):
                # an existing committed epoch is an explicit rewrite; an
                # existing manifest-less dir is torn garbage — either way
                # the fully-staged snapshot replaces it
                shutil.rmtree(edir)
            os.rename(tmpdir, edir)  # the commit: one atomic publish
        except BaseException:
            shutil.rmtree(tmpdir, ignore_errors=True)
            raise
        self._append_snapshot(
            {"type": "append", "epoch": epoch, "tables": sorted(tables)}
        )

    def latest(self) -> dict | None:
        best = None
        if not os.path.isdir(self.root):
            return None
        for d in sorted(os.listdir(self.root)):
            mpath = os.path.join(self.root, d, "manifest.json")
            if d.startswith("epoch=") and os.path.exists(mpath):
                with open(mpath) as f:
                    best = json.load(f)
        return best

    def manifest(self, epoch: int) -> dict | None:
        mpath = os.path.join(self._epoch_dir(epoch), "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def read(self, spark: SparkSession, epoch: int, table: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._epoch_dir(epoch), table))


    def _base_for(self, table: str, epoch: int,
                  snapshot_id: int | None = None) -> dict | None:
        """Newest compaction snapshot for ``table`` with base epoch ≤
        ``epoch`` (and snapshot id ≤ ``snapshot_id`` when time-traveling)."""
        best = None
        for s in self.snapshots():
            if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
                break
            if (s["type"] == "compaction" and s["table"] == table
                    and s["epoch"] <= epoch):
                best = s
        return best

    def read_merged(
        self,
        spark: SparkSession,
        epoch: int,
        table: str,
        window: int | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Merge-on-read: union of per-epoch DELTA directories for ``table``
        up to ``epoch`` — the Iceberg MoR seen-set shape from the north rule.
        Each epoch commits only its delta (O(delta) write, not O(total)
        rewrite); readers union the committed deltas.  ``window`` prunes to
        the last N epochs, which IS recrawl expiry when every delta row
        shares that epoch's ``first_epoch``: dropping whole delta dirs ==
        dropping expired entries, no data rewrite ever.

        When a :meth:`compact` base covers a prefix of the epochs, the scan
        is base + post-base deltas (bounded file count); ``snapshot_id``
        time-travels — bases committed after that snapshot are ignored."""
        lo = 0 if window is None else max(0, epoch - window + 1)
        base = self._base_for(table, epoch, snapshot_id)
        paths = []
        # a base folds epochs [0, base.epoch]; it can only stand in for the
        # delta prefix when the window does not exclude any of those epochs
        if base is not None and lo == 0:
            paths.append(os.path.join(self.root, base["path"]))
            lo = base["epoch"] + 1
        for e in range(lo, epoch + 1):
            m = self.manifest(e)
            if m and table in m["tables"]:
                paths.append(os.path.join(self._epoch_dir(e), table))
        if not paths:
            raise FileNotFoundError(f"no committed '{table}' deltas <= epoch {epoch}")
        return spark.read.parquet(*paths)

    def compact(
        self,
        spark: SparkSession,
        epoch: int,
        table: str,
        dedup_cols: list[str] | None = None,
    ) -> int:
        """MERGE-equivalent maintenance: fold every committed delta of
        ``table`` up to ``epoch`` into ONE base directory and commit it as a
        new snapshot.  ``dedup_cols`` keeps the FIRST row per key in epoch
        order (seen-set semantics: the earliest sighting wins), matching
        what the unioned deltas resolve to under the crawl loop's own
        min-epoch aggregation.  Readers switch to base + later deltas;
        resume from the compacted snapshot is bit-exact because the base
        holds exactly the union's row set."""
        df = self.read_merged(spark, epoch, table)
        if dedup_cols:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            order = [c for c in df.columns if c not in dedup_cols]
            w = Window.partitionBy(*dedup_cols).orderBy(*(order or dedup_cols))
            df = (
                df.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1).drop("_rk")
            )
        rel = os.path.join(f"epoch={epoch:05d}", f"{table}.base")
        final = os.path.join(self.root, rel)
        # stage + rename: the snapshot-log append below is the commit, but
        # publishing the base atomically keeps a killed compaction from
        # leaving a partial dir under the final name for a retry to trip on
        import shutil

        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = tempfile.mkdtemp(
            prefix=f".{table}.base.", suffix=".tmp", dir=os.path.dirname(final)
        )
        try:
            df.write.mode("overwrite").parquet(tmp)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return self._append_snapshot(
            {"type": "compaction", "epoch": epoch, "table": table, "path": rel}
        )

    def expire_deltas(self, table: str) -> list[str]:
        """``expire_snapshots`` analog: physically remove delta directories
        already covered by the newest compaction base (older snapshot ids
        referencing them become unreadable, exactly like Iceberg after
        expiry).  Returns the removed paths."""
        import shutil

        base = self._base_for(table, epoch=1 << 31)
        removed = []
        if base is None:
            return removed
        for e in range(base["epoch"] + 1):
            d = os.path.join(self._epoch_dir(e), table)
            if os.path.isdir(d):
                shutil.rmtree(d)
                removed.append(d)
        return removed
