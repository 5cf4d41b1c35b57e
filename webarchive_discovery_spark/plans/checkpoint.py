"""Epoch snapshot store: parquet directories + an atomically-written manifest.

The Iceberg-snapshot stand-in for this sandbox (no Iceberg jars available):
each epoch writes its tables under ``<root>/epoch=NNNNN/<table>/`` and then a
``manifest.json`` LAST — a snapshot is complete iff its manifest exists, so a
crashed epoch is invisible to resume (the same commit-by-manifest protocol
Iceberg uses; swap ``write``/``read`` bodies for ``df.writeTo(...)`` /
``spark.read.table`` + snapshot ids to run on a real catalog).

Snapshot addressing + maintenance (the Iceberg table-maintenance analogs):

- every commit (epoch append or compaction) publishes an IMMUTABLE
  ``metadata/v{N}.metadata.json`` (format-version 2 shape: table uuid,
  current-snapshot-id, full snapshot list) claimed by an atomic
  create-if-absent, with ``version-hint.text`` pointing readers at the
  current version — Iceberg's optimistic-concurrency metadata swap, so
  concurrent committers conflict-and-retry instead of lost-updating; each
  snapshot gets a monotonically increasing ``snapshot_id`` —
  ``read_merged(..., snapshot_id=...)`` time-travels to exactly the state
  visible at that commit (pre-protocol dirs with a root ``snapshots.json``
  remain readable);
- :meth:`compact` is the MERGE-equivalent over the seen-set deltas: fold
  every committed delta of a table up to an epoch into ONE base directory,
  committed as a new snapshot (readers then scan base + later deltas —
  bounded file count instead of one dir per epoch);
- :meth:`expire_deltas` is ``expire_snapshots``: physically drop delta dirs
  already covered by a base (older snapshot ids referencing them become
  unreadable, exactly like Iceberg after expiry).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CheckpointStore", "CommitConflict"]


class CommitConflict(RuntimeError):
    """Another writer committed the metadata version this commit targeted
    (the Iceberg optimistic-concurrency failure mode)."""


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.root, f"epoch={epoch:05d}")

    # -- manifest stats (the Iceberg per-file min/max bounds) ----------------

    @staticmethod
    def _harvest_stats(path: str) -> dict:
        """File/row/column-bounds stats for one committed table directory,
        read from parquet FOOTERS only — no data scan, no extra Spark job
        (Iceberg gets the same numbers from its manifest files).  Columns
        whose bounds aren't JSON-comparable scalars (binary, nested,
        timestamps) are simply omitted; pruning treats absence as
        'unknown — keep'."""
        import pyarrow.parquet as pq

        rows = 0
        files = 0
        cols: dict[str, list] = {}
        dropped: set[str] = set()
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".parquet"):
                continue
            files += 1
            md = pq.ParquetFile(os.path.join(path, fn)).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    st = c.statistics
                    name = c.path_in_schema
                    if (st is None or not st.has_min_max or "." in name
                            or name in dropped):
                        continue
                    mn, mx = st.min, st.max
                    try:
                        json.dumps([mn, mx])
                    except (TypeError, ValueError):
                        dropped.add(name)
                        cols.pop(name, None)
                        continue
                    cur = cols.get(name)
                    if cur is None:
                        cols[name] = [mn, mx]
                    else:
                        try:
                            cur[0] = min(cur[0], mn)
                            cur[1] = max(cur[1], mx)
                        except TypeError:
                            dropped.add(name)
                            cols.pop(name, None)
        return {"files": files, "rows": rows,
                "columns": {k: {"min": v[0], "max": v[1]}
                            for k, v in cols.items()}}

    @staticmethod
    def _stats_overlap(stats: dict | None, prune: dict) -> bool:
        """True when the stats ranges MAY intersect ``prune`` — absence of
        stats (legacy manifests, dropped columns) always keeps the dir."""
        if not stats:
            return True
        for col, (lo, hi) in prune.items():
            cs = stats.get("columns", {}).get(col)
            if cs is None:
                continue
            if ((hi is not None and cs["min"] > hi)
                    or (lo is not None and cs["max"] < lo)):
                return False
        return True

    # -- snapshot log: Iceberg metadata-file protocol -------------------------
    #
    # Every commit writes an IMMUTABLE ``metadata/v{N}.metadata.json`` holding
    # the full snapshot list, claimed via hard-link (an atomic create-if-absent
    # on POSIX) so two concurrent committers cannot both win version N — the
    # loser re-reads and re-commits on top (no lost update), exactly Iceberg's
    # optimistic-concurrency metadata swap.  ``version-hint.text`` points
    # readers at the current version; a stale hint only costs a directory
    # probe, never correctness.

    def _metadata_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    def _version_hint_path(self) -> str:
        return os.path.join(self._metadata_dir(), "version-hint.text")

    def _legacy_log_path(self) -> str:
        return os.path.join(self.root, "snapshots.json")

    def _current_version(self) -> int:
        """Current metadata version: the hint when valid, else the newest
        ``v{N}.metadata.json`` actually present (hint writes can race)."""
        mdir = self._metadata_dir()
        best = 0
        try:
            with open(self._version_hint_path()) as f:
                best = int(f.read().strip())
        except (OSError, ValueError):
            pass
        while os.path.exists(os.path.join(mdir, f"v{best + 1}.metadata.json")):
            best += 1
        return best

    def _metadata(self, version: int | None = None) -> dict | None:
        v = self._current_version() if version is None else version
        if v <= 0:
            return None
        p = os.path.join(self._metadata_dir(), f"v{v}.metadata.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All committed snapshots, oldest first."""
        meta = self._metadata()
        if meta is not None:
            return meta["snapshots"]
        # pre-metadata-protocol checkpoint dirs: mutable root-level log
        p = self._legacy_log_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _append_snapshot(self, entry: dict, max_attempts: int = 5) -> int:
        mdir = self._metadata_dir()
        os.makedirs(mdir, exist_ok=True)
        table_uuid = hashlib.sha1(self.root.encode()).hexdigest()
        for _ in range(max_attempts):
            version = self._current_version()
            log = self.snapshots()
            committed = dict(entry, snapshot_id=len(log) + 1,
                             sequence_number=len(log) + 1)
            meta = {
                "format_version": 2,
                "table_uuid": table_uuid,
                "location": self.root,
                "current_snapshot_id": committed["snapshot_id"],
                "snapshots": log + [committed],
            }
            fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".meta.tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(meta, f)
            target = os.path.join(mdir, f"v{version + 1}.metadata.json")
            try:
                os.link(tmp, target)  # atomic create-if-absent: the CAS
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race — re-read the log and retry on top
            os.unlink(tmp)
            fd, hint_tmp = tempfile.mkstemp(dir=mdir, suffix=".hint.tmp")
            with os.fdopen(fd, "w") as f:
                f.write(str(version + 1))
            os.replace(hint_tmp, self._version_hint_path())
            return committed["snapshot_id"]
        raise CommitConflict(
            f"lost the metadata CAS {max_attempts} times under {self.root}")

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
            stats = {}
            for name, df in tables.items():
                tdir = os.path.join(tmpdir, name)
                df.write.mode("overwrite").parquet(tdir)
                stats[name] = self._harvest_stats(tdir)
            manifest = {
                "epoch": epoch,
                "tables": sorted(tables),
                "counts": {n: s["rows"] for n, s in stats.items()},
                "stats": stats,
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
        prune: dict[str, tuple] | None = None,
        apply_deletes: bool = False,
        delete_keys: list[str] | None = None,
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
        time-travels — bases committed after that snapshot are ignored.

        ``prune`` is Iceberg manifest-level scan pruning: a ``{column:
        (lo, hi)}`` bound (either end None = open) skips every committed
        directory whose footer-harvested min/max range cannot intersect —
        metadata-only, so a seen-probe restricted to one hash range never
        opens the other ranges' files.  Callers must still apply the actual
        filter; pruning only removes directories that filter would empty.

        ``apply_deletes`` turns on Iceberg-v2 merge-on-read EQUALITY
        DELETES: an epoch may commit, alongside its data delta, a
        ``<table>.deletes`` table of key rows (via the same :meth:`write`
        call); a delete committed at epoch *d* removes every matching row
        committed at any epoch ≤ *d* — later re-appends of the same key
        survive.  Reads anti-join data against the applicable delete files
        (small side, broadcast) — no data rewrite ever.  ``delete_keys``
        defaults to every column of the delete table."""
        lo = 0 if window is None else max(0, epoch - window + 1)
        base = self._base_for(table, epoch, snapshot_id)
        candidates: list[tuple[str, dict | None, int]] = []
        base_epoch = -1
        deletes_folded = False
        # a base folds epochs [0, base.epoch]; it can only stand in for the
        # delta prefix when the window does not exclude any of those epochs
        if base is not None and lo == 0:
            candidates.append((os.path.join(self.root, base["path"]),
                               base.get("stats"), base["epoch"]))
            base_epoch = base["epoch"]
            deletes_folded = bool(base.get("deletes_folded"))
            lo = base["epoch"] + 1
        for e in range(lo, epoch + 1):
            m = self.manifest(e)
            if m and table in m["tables"]:
                candidates.append((os.path.join(self._epoch_dir(e), table),
                                   (m.get("stats") or {}).get(table), e))
        if not candidates:
            raise FileNotFoundError(f"no committed '{table}' deltas <= epoch {epoch}")
        kept = [(p, e) for p, s, e in candidates
                if prune is None or self._stats_overlap(s, prune)]
        if not kept:
            # everything pruned: empty result with the table's real schema
            return spark.read.parquet(candidates[0][0]).limit(0)
        if not apply_deletes:
            return spark.read.parquet(*(p for p, _ in kept))

        from pyspark.sql import functions as F

        # delete files applicable to this read: committed ≤ epoch, inside
        # the window, and (when a base already folded its prefix) after the
        # base epoch
        dlo = 0 if window is None else max(0, epoch - window + 1)
        if deletes_folded:
            dlo = max(dlo, base_epoch + 1)
        del_dirs = []
        for e in range(dlo, epoch + 1):
            m = self.manifest(e)
            if m and f"{table}.deletes" in m["tables"]:
                del_dirs.append(
                    (os.path.join(self._epoch_dir(e), f"{table}.deletes"), e))

        data = None
        for p, e in kept:
            part = spark.read.parquet(p).withColumn(
                "_commit_epoch", F.lit(e))
            data = part if data is None else data.unionByName(part)
        if not del_dirs:
            return data.drop("_commit_epoch")
        dels = None
        for p, e in del_dirs:
            part = spark.read.parquet(p).withColumn(
                "_delete_epoch", F.lit(e))
            dels = part if dels is None else dels.unionByName(part)
        keys = delete_keys or [c for c in dels.columns if c != "_delete_epoch"]
        dels = dels.groupBy(*keys).agg(
            F.max("_delete_epoch").alias("_delete_epoch"))
        cond = F.lit(True)
        for k in keys:
            cond = cond & (data[k] == dels[k])
        cond = cond & (dels["_delete_epoch"] >= data["_commit_epoch"])
        # delete sets are key lists — tiny next to the data; broadcast keeps
        # the anti-join shuffle-free on the data side
        return (data.join(F.broadcast(dels), cond, "left_anti")
                .drop("_commit_epoch"))

    def compact(
        self,
        spark: SparkSession,
        epoch: int,
        table: str,
        dedup_cols: list[str] | None = None,
        apply_deletes: bool = False,
        delete_keys: list[str] | None = None,
    ) -> int:
        """MERGE-equivalent maintenance: fold every committed delta of
        ``table`` up to ``epoch`` into ONE base directory and commit it as a
        new snapshot.  ``dedup_cols`` keeps the FIRST row per key in epoch
        order (seen-set semantics: the earliest sighting wins), matching
        what the unioned deltas resolve to under the crawl loop's own
        min-epoch aggregation.  Readers switch to base + later deltas;
        resume from the compacted snapshot is bit-exact because the base
        holds exactly the union's row set.

        ``apply_deletes`` additionally folds the equality-delete files ≤
        ``epoch`` into the base (rows they remove are gone physically) and
        marks the snapshot ``deletes_folded`` so reads never re-apply them."""
        df = self.read_merged(spark, epoch, table,
                              apply_deletes=apply_deletes,
                              delete_keys=delete_keys)
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
            stats = self._harvest_stats(tmp)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return self._append_snapshot(
            {"type": "compaction", "epoch": epoch, "table": table,
             "path": rel, "stats": stats,
             "deletes_folded": bool(apply_deletes)}
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
        names = [table]
        if base.get("deletes_folded"):
            # the base already physically applied these delete files —
            # they are dead weight once the covered deltas go
            names.append(f"{table}.deletes")
        for e in range(base["epoch"] + 1):
            for name in names:
                d = os.path.join(self._epoch_dir(e), name)
                if os.path.isdir(d):
                    shutil.rmtree(d)
                    removed.append(d)
        return removed
