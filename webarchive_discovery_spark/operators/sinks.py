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

__all__ = ["write_jsonl", "write_multi_file", "write_text_lines", "write_xml", "solr_doc_xml", "batched_foreach_sink"]


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
    backoff_seconds: float = 0.0,
    on_drop: Callable[[list], None] | None = None,
) -> None:
    """Push rows to an external endpoint in bounded batches per partition.

    Semantics from ``WARCIndexerReducer.checkSubmission``
    (``WARCIndexerReducer.java:217-260``): flush at ``batch_size`` docs or
    ``batch_bytes`` payload; a failed send keeps the batch and RETRIES it
    in-process after ``backoff_seconds`` (the reference sleeps
    ``SUBMISSION_PAUSE_MINS``); once the consecutive-failure count reaches
    ``max_consecutive_failures`` the batch is DROPPED (poison-batch
    protection, "assuming bad data").  The task NEVER aborts, so batches
    already sent are never re-sent by a task retry (exactly-once per batch
    against a transport with no idempotence).  As in the reference, the
    counter resets only on a successful send — after a drop, further
    failures drop immediately until a send succeeds.  ``on_drop`` observes
    dropped batches (the reference's ``NUM_DROPPED_RECORDS`` counter).
    ``send`` is the transport (HTTP POST in production).  Executor-side
    only — no driver collect.
    """

    def run(rows: Iterable) -> None:
        import time

        batch: list = []
        size = 0
        failures = 0

        def flush() -> None:
            nonlocal batch, size, failures
            while batch:
                try:
                    send(batch)
                    failures = 0
                    break
                except Exception:
                    failures += 1
                    if failures >= max_consecutive_failures:
                        if on_drop is not None:
                            on_drop(batch)
                        break  # drop the poison batch; counter NOT reset
                    if backoff_seconds:
                        time.sleep(backoff_seconds)
            batch, size = [], 0

        for row in rows:
            batch.append(row)
            size += sum(len(str(v)) for v in row)
            if len(batch) >= batch_size or size >= batch_bytes:
                flush()
        flush()

    df.foreachPartition(run)


def _xml_escape(col):
    out = F.regexp_replace(col.cast("string"), "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def solr_doc_xml(df: DataFrame) -> "F.Column":
    """One Solr add-doc ``<doc>`` element per row (the reference's XML output
    format, ``SingleFileDocumentConsumer.java:101-148`` /
    ``ClientUtils.toXML``): ``<field name="c">v</field>`` per non-null value,
    one element per array entry for multi-valued fields.  Pure codegen
    expressions (escape via regexp_replace chains)."""
    parts = [F.lit("<doc>")]
    for field in df.schema.fields:
        name = field.name
        open_tag = f'<field name="{name}">'
        if field.dataType.typeName() == "array":
            rendered = F.array_join(
                F.transform(
                    F.col(name),
                    lambda v: F.concat(F.lit(open_tag), _xml_escape(v), F.lit("</field>")),
                ),
                "",
            )
        else:
            rendered = F.concat(F.lit(open_tag), _xml_escape(F.col(name)), F.lit("</field>"))
        parts.append(F.coalesce(rendered, F.lit("")))
    parts.append(F.lit("</doc>"))
    return F.concat(*parts)


def write_xml(df: DataFrame, path: str, gzip_output: bool = False, mode: str = "overwrite") -> None:
    """Solr add-doc XML output (``--output xml`` path of the reference CLI):
    every part file is a complete ``<add>…</add>`` document — the per-file
    wrapper is emitted by the partition generator (first/last yield), so the
    layout matches ``SingleFileDocumentConsumer``'s one-document-per-file
    contract without any driver-side pass."""
    import pandas as pd

    docs = df.select(solr_doc_xml(df).alias("value"))

    def wrap(batches):
        yield pd.DataFrame({"value": ["<add>"]})
        for pdf in batches:
            yield pdf
        yield pd.DataFrame({"value": ["</add>"]})

    wrapped = docs.mapInPandas(wrap, "value string")
    writer = wrapped.write.mode(mode)
    if gzip_output:
        writer = writer.option("compression", "gzip")
    writer.text(path)
