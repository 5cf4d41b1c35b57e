"""Epoch snapshot store: parquet directories + an atomically-written manifest.

The Iceberg-snapshot stand-in for this sandbox (no Iceberg jars available):
each epoch writes its tables under ``<root>/epoch=NNNNN/<table>/`` and then a
``manifest.json`` LAST — a snapshot is complete iff its manifest exists, so a
crashed epoch is invisible to resume (the same commit-by-manifest protocol
Iceberg uses; swap ``write``/``read`` bodies for ``df.writeTo(...)`` /
``spark.read.table`` + snapshot ids to run on a real catalog).
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

    def write(self, epoch: int, tables: dict[str, DataFrame], extra: dict | None = None) -> None:
        edir = self._epoch_dir(epoch)
        counts = {}
        for name, df in tables.items():
            path = os.path.join(edir, name)
            df.write.mode("overwrite").parquet(path)
        manifest = {
            "epoch": epoch,
            "tables": sorted(tables),
            "counts": counts,
            "extra": extra or {},
        }
        # atomic: write sidecar then rename — manifest presence == commit
        fd, tmp = tempfile.mkstemp(dir=edir, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(edir, "manifest.json"))

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


    def read_merged(
        self,
        spark: SparkSession,
        epoch: int,
        table: str,
        window: int | None = None,
    ) -> DataFrame:
        """Merge-on-read: union of per-epoch DELTA directories for ``table``
        up to ``epoch`` — the Iceberg MoR seen-set shape from the north rule.
        Each epoch commits only its delta (O(delta) write, not O(total)
        rewrite); readers union the committed deltas.  ``window`` prunes to
        the last N epochs, which IS recrawl expiry when every delta row
        shares that epoch's ``first_epoch``: dropping whole delta dirs ==
        dropping expired entries, no data rewrite ever."""
        lo = 0 if window is None else max(0, epoch - window + 1)
        paths = []
        for e in range(lo, epoch + 1):
            m = self.manifest(e)
            if m and table in m["tables"]:
                paths.append(os.path.join(self._epoch_dir(e), table))
        if not paths:
            raise FileNotFoundError(f"no committed '{table}' deltas <= epoch {epoch}")
        return spark.read.parquet(*paths)
