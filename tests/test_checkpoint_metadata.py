"""Iceberg metadata-file commit protocol on the checkpoint store.

Pure-filesystem tests (no Spark): versioned immutable metadata files,
version-hint recovery, optimistic-concurrency CAS with no lost updates,
and legacy ``snapshots.json`` migration.
"""

import json
import os

import pytest

from webarchive_discovery_spark.plans.checkpoint import (
    CheckpointStore,
    CommitConflict,
)


def _meta_path(store, v):
    return os.path.join(store.root, "metadata", f"v{v}.metadata.json")


class TestMetadataProtocol:
    def test_versioned_files_and_hint(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        for e in range(3):
            store._append_snapshot({"type": "append", "epoch": e,
                                    "tables": ["t"]})
        for v in (1, 2, 3):
            assert os.path.exists(_meta_path(store, v))
        with open(store._version_hint_path()) as f:
            assert f.read().strip() == "3"
        snaps = store.snapshots()
        assert [s["snapshot_id"] for s in snaps] == [1, 2, 3]
        assert [s["sequence_number"] for s in snaps] == [1, 2, 3]
        meta = store._metadata()
        assert meta["format_version"] == 2
        assert meta["current_snapshot_id"] == 3

    def test_metadata_files_immutable(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        store._append_snapshot({"type": "append", "epoch": 0, "tables": ["t"]})
        with open(_meta_path(store, 1)) as f:
            v1_before = f.read()
        store._append_snapshot({"type": "append", "epoch": 1, "tables": ["t"]})
        with open(_meta_path(store, 1)) as f:
            assert f.read() == v1_before  # v1 never rewritten
        assert len(store._metadata(1)["snapshots"]) == 1
        assert len(store._metadata(2)["snapshots"]) == 2

    def test_cas_retry_keeps_foreign_commit(self, tmp_path):
        """A version claimed by another writer between read and publish must
        not be lost: the retry re-reads and commits on top."""
        store = CheckpointStore(str(tmp_path / "ck"))
        store._append_snapshot({"type": "append", "epoch": 0, "tables": ["t"]})
        # a second committer (same root, separate instance — two drivers)
        # wins version 2 first
        other = CheckpointStore(store.root)
        other._append_snapshot({"type": "compaction", "epoch": 0,
                                "table": "t", "path": "p"})
        sid = store._append_snapshot({"type": "append", "epoch": 1,
                                      "tables": ["t"]})
        assert sid == 3
        snaps = store.snapshots()
        assert [s["snapshot_id"] for s in snaps] == [1, 2, 3]
        assert snaps[1]["type"] == "compaction"  # the foreign commit survived

    def test_cas_conflict_planted_version_steps_over(self, tmp_path):
        """A directly-planted conflicting metadata file (simulating a racing
        writer that died before updating the hint) forces the CAS onto the
        next version and its snapshots are preserved."""
        store = CheckpointStore(str(tmp_path / "ck"))
        store._append_snapshot({"type": "append", "epoch": 0, "tables": ["t"]})
        foreign = {
            "format_version": 2, "table_uuid": "x", "location": store.root,
            "current_snapshot_id": 2,
            "snapshots": store.snapshots() + [
                {"type": "append", "epoch": 99, "tables": ["t"],
                 "snapshot_id": 2, "sequence_number": 2}],
        }
        with open(_meta_path(store, 2), "w") as f:
            json.dump(foreign, f)
        sid = store._append_snapshot({"type": "append", "epoch": 1,
                                      "tables": ["t"]})
        assert sid == 3 and os.path.exists(_meta_path(store, 3))
        assert store.snapshots()[1]["epoch"] == 99

    def test_cas_exhaustion_raises(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        with pytest.raises(CommitConflict):
            store._append_snapshot({"type": "append", "epoch": 0,
                                    "tables": ["t"]}, max_attempts=0)

    def test_stale_hint_recovers(self, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        store._append_snapshot({"type": "append", "epoch": 0, "tables": ["t"]})
        store._append_snapshot({"type": "append", "epoch": 1, "tables": ["t"]})
        with open(store._version_hint_path(), "w") as f:
            f.write("1")  # stale hint: v2 exists
        assert store._current_version() == 2
        assert len(store.snapshots()) == 2

    def test_legacy_snapshots_json_migrates(self, tmp_path):
        root = str(tmp_path / "ck")
        os.makedirs(root)
        legacy = [{"type": "append", "epoch": 0, "tables": ["t"],
                   "snapshot_id": 1}]
        with open(os.path.join(root, "snapshots.json"), "w") as f:
            json.dump(legacy, f)
        store = CheckpointStore(root)
        assert store.snapshots() == legacy  # readable pre-migration
        sid = store._append_snapshot({"type": "append", "epoch": 1,
                                      "tables": ["t"]})
        assert sid == 2
        # the first metadata version carries the legacy log forward
        assert [s["snapshot_id"] for s in store.snapshots()] == [1, 2]


class TestManifestStats:
    def _write_epochs(self, spark, store):
        # two deltas with DISJOINT url_hash ranges + distinct hosts
        for epoch, lo in ((0, 0), (1, 1000)):
            df = spark.createDataFrame(
                [(lo + i, f"h{epoch}.example") for i in range(10)],
                "url_hash long, host string")
            store.write(epoch, {"seen_delta": df})

    def test_footer_stats_in_manifest(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._write_epochs(spark, store)
        m = store.manifest(0)
        st = m["stats"]["seen_delta"]
        assert st["rows"] == 10 and m["counts"]["seen_delta"] == 10
        assert st["columns"]["url_hash"] == {"min": 0, "max": 9}
        assert st["columns"]["host"]["min"] == "h0.example"

    def test_prune_skips_disjoint_deltas(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._write_epochs(spark, store)
        full = store.read_merged(spark, 1, "seen_delta")
        assert full.count() == 20
        pruned = store.read_merged(spark, 1, "seen_delta",
                                   prune={"url_hash": (1000, 1009)})
        rows = pruned.collect()
        # only epoch 1's directory was opened: epoch 0 rows are absent
        # WITHOUT any row filter having run
        assert len(rows) == 10
        assert all(r["url_hash"] >= 1000 for r in rows)
        assert len(pruned.inputFiles()) < len(full.inputFiles())

    def test_prune_open_bounds_and_unknown_column(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._write_epochs(spark, store)
        # open lower bound
        assert store.read_merged(spark, 1, "seen_delta",
                                 prune={"url_hash": (None, 9)}).count() == 10
        # column without stats: keep everything
        assert store.read_merged(spark, 1, "seen_delta",
                                 prune={"nope": (0, 1)}).count() == 20

    def test_prune_all_out_yields_empty_with_schema(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._write_epochs(spark, store)
        out = store.read_merged(spark, 1, "seen_delta",
                                prune={"url_hash": (10_000, 20_000)})
        assert out.count() == 0
        assert set(out.columns) == {"url_hash", "host"}

    def test_compaction_base_carries_stats_and_prunes(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._write_epochs(spark, store)
        sid = store.compact(spark, 1, "seen_delta", dedup_cols=["url_hash"])
        snap = store.snapshot(sid)
        assert snap["stats"]["columns"]["url_hash"] == {"min": 0, "max": 1009}
        assert snap["stats"]["rows"] == 20
        # base range covers the probe: base is read
        assert store.read_merged(spark, 1, "seen_delta",
                                 prune={"url_hash": (0, 5)}).count() == 20
        # probe outside the base's whole range: nothing opened
        assert store.read_merged(spark, 1, "seen_delta",
                                 prune={"url_hash": (10_000, None)}).count() == 0


class TestEqualityDeletes:
    """Iceberg-v2 merge-on-read equality deletes: a ``<table>.deletes``
    key table committed at epoch d removes matching rows committed at any
    epoch <= d; later re-appends survive; compaction folds deletes
    physically; expiry then drops the dead delete files."""

    def _seed(self, spark, store):
        def df(rows):
            return spark.createDataFrame(rows, "url_hash long, host string")
        store.write(0, {"seen": df([(1, "a"), (2, "b"), (3, "c"), (4, "d")])})
        store.write(1, {
            "seen": df([(5, "e")]),
            "seen.deletes": spark.createDataFrame([(2,)], "url_hash long"),
        })
        store.write(2, {"seen": df([(2, "b2")])})  # re-append after delete

    def test_deletes_applied_and_reappend_survives(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._seed(spark, store)
        rows = sorted(
            (r["url_hash"], r["host"]) for r in store.read_merged(
                spark, 2, "seen", apply_deletes=True,
                delete_keys=["url_hash"]).collect())
        # epoch-0 (2,'b') deleted by the epoch-1 delete file;
        # epoch-2 (2,'b2') committed AFTER the delete, so it survives
        assert rows == [(1, "a"), (2, "b2"), (3, "c"), (4, "d"), (5, "e")]

    def test_without_apply_deletes_everything_visible(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._seed(spark, store)
        assert store.read_merged(spark, 2, "seen").count() == 6

    def test_delete_before_its_epoch_does_not_apply(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "ck"))
        self._seed(spark, store)
        # reading only up to epoch 0: the epoch-1 delete is not yet visible
        rows = store.read_merged(spark, 0, "seen", apply_deletes=True,
                                 delete_keys=["url_hash"]).count()
        assert rows == 4

    def test_compact_folds_deletes_and_expiry_drops_them(self, spark, tmp_path):
        import os

        store = CheckpointStore(str(tmp_path / "ck"))
        self._seed(spark, store)
        want = sorted(
            (r["url_hash"], r["host"]) for r in store.read_merged(
                spark, 2, "seen", apply_deletes=True,
                delete_keys=["url_hash"]).collect())
        sid = store.compact(spark, 2, "seen", apply_deletes=True,
                            delete_keys=["url_hash"])
        snap = store.snapshot(sid)
        assert snap["deletes_folded"] is True
        # base physically excludes the deleted row
        got = sorted(
            (r["url_hash"], r["host"]) for r in store.read_merged(
                spark, 2, "seen", apply_deletes=True,
                delete_keys=["url_hash"]).collect())
        assert got == want
        removed = store.expire_deltas("seen")
        assert any(p.endswith("seen.deletes") for p in removed)
        assert not os.path.isdir(
            os.path.join(store._epoch_dir(1), "seen.deletes"))
        # post-expiry read still correct (base + nothing)
        got2 = sorted(
            (r["url_hash"], r["host"]) for r in store.read_merged(
                spark, 2, "seen", apply_deletes=True,
                delete_keys=["url_hash"]).collect())
        assert got2 == want
