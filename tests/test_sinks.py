"""Sink semantics: JSONL/multi-file/text writers and the batched push sink
(batch boundaries, 3-strikes poison-batch drop)."""

import glob
import gzip
import json
import os

from webarchive_discovery_spark.operators.sinks import (
    batched_foreach_sink,
    write_jsonl,
    write_multi_file,
    write_text_lines,
)


def test_write_jsonl_gzip(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "concat('v', id) as v")
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out, gzip_output=True)
    files = glob.glob(out + "/*.json.gz")
    assert files
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(10))


def test_write_multi_file_partitions(spark, tmp_path):
    df = spark.range(20).selectExpr("id", "concat('src', id % 3) as source_file")
    out = str(tmp_path / "multi")
    write_multi_file(df, out, "source_file")
    assert sorted(os.listdir(out) + []).count("source_file=src0") == 1


def test_write_text_lines(spark, tmp_path):
    df = spark.range(5).selectExpr("concat('line-', id) as cdx")
    out = str(tmp_path / "text")
    write_text_lines(df, "cdx", out, gzip_output=False)
    lines = []
    for f in glob.glob(out + "/part-*"):
        lines += open(f).read().splitlines()
    assert sorted(lines) == [f"line-{i}" for i in range(5)]


def test_batched_sink_batching_and_poison_drop(spark, tmp_path):
    # transport that records batch sizes and fails permanently on batches
    # containing the poison row — communicated back via files (executors are
    # in-process for local mode but state still must not rely on that)
    log_dir = str(tmp_path / "sent")
    os.makedirs(log_dir, exist_ok=True)

    def send(batch):
        if any(row["id"] == 7 for row in batch):
            raise RuntimeError("endpoint rejects poison batch")
        with open(os.path.join(log_dir, f"b{os.getpid()}_{len(os.listdir(log_dir))}"), "w") as f:
            f.write("\n".join(str(row["id"]) for row in batch))

    df = spark.range(20).coalesce(1)
    batched_foreach_sink(df, send, batch_size=5, max_consecutive_failures=1)
    sent = []
    for f in glob.glob(log_dir + "/*"):
        sent += [int(x) for x in open(f).read().splitlines()]
    # the batch containing id=7 (5..9) was dropped after failures; others sent
    assert 7 not in sent
    assert set(range(0, 5)).issubset(set(sent))
    assert set(range(10, 20)).issubset(set(sent))
