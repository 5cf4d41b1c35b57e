"""CDX generation: per-record projection + compressed-length differencing +
global total-order sort by canonical URL key.

Reference: ``ArchiveCDXGenerator`` + ``DereferencingArchiveToCDXRecordReader``
(``warc-hadoop-recordreaders/.../cdx/ArchiveCDXGenerator.java:155-223``,
``.../lib/DereferencingArchiveToCDXRecordReader.java:85-214``), CDX-11 format
``"urlkey timestamp url mime status digest redirect meta complen offset file"``
with compressed length computed by differencing consecutive record offsets
within a file (``CaptureSearchResultIterator.java:60-97``), then a
total-order sort using ``TotalOrderPartitioner`` + ``InputSampler``.

Spark-first: the offset differencing is a ``lead`` window per source file,
and the global sort is ``repartitionByRange + sortWithinPartitions`` — Spark
samples range boundaries exactly like the reference's ``InputSampler``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cdx_project", "total_order_sort", "cdx_junk_filter", "cdx11_line", "CDX11_FORMAT"]

#: The reference's 11-field format spec (``DereferencingArchiveToCDXRecordReader.java:66``)
CDX11_FORMAT = " CDX N b a m s k r M S V g"


def cdx_project(
    df: DataFrame,
    urlkey_col: str,
    file_col: str,
    offset_col: str,
    file_size_col: str | None = None,
) -> DataFrame:
    """Add ``compressed_length`` = next-record offset − this offset within the
    same source file (last record: file size − offset when available)."""
    w = Window.partitionBy(file_col).orderBy(F.col(offset_col).cast("long"))
    nxt = F.lead(F.col(offset_col).cast("long")).over(w)
    if file_size_col is not None:
        tail = F.col(file_size_col).cast("long") - F.col(offset_col).cast("long")
    else:
        tail = F.lit(None).cast("long")
    return df.withColumn("compressed_length", F.coalesce(nxt - F.col(offset_col).cast("long"), tail))


def total_order_sort(df: DataFrame, key_col: str, num_partitions: int | None = None) -> DataFrame:
    """Globally ordered output by ``key_col``: range-partition (sampled
    boundaries) then sort within partitions — every output partition i holds
    keys strictly below partition i+1, the property the reference builds with
    ``TotalOrderPartitioner``."""
    if num_partitions:
        return df.repartitionByRange(num_partitions, key_col).sortWithinPartitions(key_col)
    return df.orderBy(key_col)


def cdx_junk_filter(df: DataFrame, mime_col: str, record_type_col: str) -> DataFrame:
    """Drop OPTIONS-response / request / metadata lines before sinking.

    Reference: ``TinyCDXServerReducer.java:63-74`` (skip
    ``application/http 200``-style junk, ``warc/request``, ``warc/metadata``).
    """
    return df.filter(
        ~F.col(mime_col).startswith("application/http")
        & ~F.col(record_type_col).isin("request", "metadata")
    )


def cdx11_line(
    df: DataFrame,
    urlkey: str = "urlkey",
    timestamp: str = "timestamp",
    url: str = "url",
    mime: str = "mime",
    status: str = "status_code",
    digest: str = "digest",
    redirect: str = "redirect",
    meta: str = "meta",
    length: str = "compressed_length",
    offset: str = "record_offset",
    filename: str = "source_file",
    out_col: str = "cdx_line",
) -> DataFrame:
    """Format the full CDX-11 line ``"N b a m s k r M S V g"`` =
    ``urlkey timestamp url mime status digest redirect meta
    compressed-size offset filename`` with ``-`` for absent fields —
    golden rows in ``DereferencingArchiveToCDXRecordReaderTest.java:90-106``
    (ported to ``tests/test_operators.py::test_cdx11_golden_lines``).
    Pure codegen expression: no UDF, no shuffle."""

    def dash(c: str):
        return F.coalesce(F.col(c).cast("string"), F.lit("-"))

    return df.withColumn(
        out_col,
        F.concat_ws(
            " ",
            dash(urlkey), dash(timestamp), dash(url), dash(mime), dash(status),
            dash(digest), dash(redirect), dash(meta), dash(length),
            dash(offset), dash(filename),
        ),
    )


def explicit_boundary_partition(
    df: DataFrame, key_col: str, boundaries: list[str], out_col: str = "partition_id"
) -> DataFrame:
    """User-supplied boundary partitioning — ``AlphaPartitioner``
    (``org/archive/hadoop/mapreduce/AlphaPartitioner.java:61-71``): partition
    i holds keys in ``[boundaries[i], boundaries[i+1])``; keys below the
    first boundary go to partition 0 (the reference clamps the binary-search
    insertion point).  The id is computed JVM-side as the count of
    boundaries ≤ key over a sorted literal array (boundary files are small —
    one line per reducer)."""
    bounds = sorted(boundaries)
    arr = F.array(*[F.lit(b) for b in bounds])
    key = F.col(key_col)
    pid = F.size(F.filter(arr, lambda b: b <= key)) - 1
    return df.withColumn(out_col, F.greatest(F.lit(0), pid))


def explicit_boundary_sort(
    df: DataFrame, key_col: str, boundaries: list[str], out_col: str = "partition_id"
) -> DataFrame:
    """Total order with EXPLICIT cut points (vs the sampled boundaries of
    :func:`total_order_sort`): stamp ``partition_id``, range-shuffle on
    ``(partition_id, key)``, sort within partitions.  For the reference's
    file-level contract (shard i = boundary i exactly), write with
    ``.write.partitionBy(out_col)`` — directory boundaries are then exact
    regardless of physical partition merging."""
    staged = explicit_boundary_partition(df, key_col, boundaries, out_col)
    n = max(1, len(boundaries))
    return staged.repartitionByRange(
        n, F.col(out_col), F.col(key_col)
    ).sortWithinPartitions(out_col, key_col)
