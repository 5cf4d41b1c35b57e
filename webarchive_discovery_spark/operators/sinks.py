"""Sinks: JSONL/XML/text writers and the batched push-sink pattern.

Reference analogs (SURVEY.md §2.2):

- ``SingleFileDocumentConsumer`` / ``MultiFileDocumentConsumer`` — JSONL/XML
  output, optional gzip, per-source-file boundaries → ``write.json`` with
  compression / ``partitionBy``.
- ``KeylessTextOutputFormat`` — value-only text lines (CDX files).
- ``WARCIndexerReducer.checkSubmission`` — buffered batch POSTs (500 docs /
  20 MB), 3-consecutive-failure drop, backoff → ``foreachPartition`` batcher
  with the same accounting, transport injected as a callable (HTTP in prod,
  a recorder in tests).  Iceberg/parquet appends make most of this machinery
  unnecessary for table sinks; it exists for push-style endpoints (Solr,
  OpenSearch, tinycdxserver).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_jsonl", "write_multi_file", "write_text_lines", "batched_foreach_sink"]


def write_jsonl(df: DataFrame, path: str, gzip_output: bool = False, mode: str = "overwrite") -> None:
    """JSONL dataset output (``SingleFileDocumentConsumer`` / the reducer's
    ``--jsonl`` path, ``WARCIndexerReducer.java:149-151``)."""
    writer = df.write.mode(mode)
    if gzip_output:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def write_multi_file(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    """Per-key file boundaries (``MultiFileDocumentConsumer`` per-WARC files;
    ``MultipleOutputs`` named datasets) → ``partitionBy`` directory layout."""
    df.write.mode(mode).partitionBy(partition_col).json(path)


def write_text_lines(df: DataFrame, line_col: str, path: str, gzip_output: bool = True,
                     mode: str = "overwrite") -> None:
    """Value-only text output (``KeylessTextOutputFormat`` + GzipCodec —
    CDX shard files)."""
    writer = df.select(F.col(line_col).cast("string").alias("value")).write.mode(mode)
    if gzip_output:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def batched_foreach_sink(
    df: DataFrame,
    send: Callable[[list], None],
    batch_size: int = 500,
    batch_bytes: int = 20 * 1024 * 1024,
    max_consecutive_failures: int = 3,
) -> None:
    """Push rows to an external endpoint in bounded batches per partition.

    Semantics from ``WARCIndexerReducer.java:217-260`` / ``TinyCDXSender``:
    flush at ``batch_size`` docs or ``batch_bytes`` payload; after
    ``max_consecutive_failures`` consecutive failed sends the batch is
    DROPPED (poison-batch protection) and the counter resets.  ``send`` is
    the transport (HTTP POST in production).  Executor-side only — no
    driver collect.
    """

    def run(rows: Iterable) -> None:
        batch: list = []
        size = 0
        failures = 0

        def flush() -> None:
            nonlocal batch, size, failures
            if not batch:
                return
            try:
                send(batch)
                failures = 0
            except Exception:
                failures += 1
                if failures < max_consecutive_failures:
                    raise  # let Spark retry the task
                # 3 strikes: drop the batch, keep going (reference behavior)
                failures = 0
            batch, size = [], 0

        for row in rows:
            batch.append(row)
            size += sum(len(str(v)) for v in row)
            if len(batch) >= batch_size or size >= batch_bytes:
                flush()
        flush()

    df.foreachPartition(run)
