"""Aggregation operators re-expressing the reference's reducers.

Every operator here is a pure DataFrame expression — Catalyst gives
partial+final hash aggregation (map-side combine) for free, which is exactly
what the reference hand-codes in its MapReduce reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["frequency_count", "hosts_report", "top_k", "warc_regex_matches"]


def frequency_count(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Per key, count occurrences of each distinct value.

    Reference: ``FrequencyCountingReducer``
    (``warc-hadoop-recordreaders/.../mapred/FrequencyCountingReducer.java:71-110``)
    — a HashMap count per reduce group; here a single hash aggregate with
    map-side partials, no per-key memory blowup at scale.
    """
    return (
        df.groupBy(*key_cols, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hosts_report(
    df: DataFrame,
    host_col: str = "host",
    bytes_col: Column | str = "bytes",
    robots_denied: Column | None = None,
    dup_by_hash: Column | None = None,
) -> DataFrame:
    """Per-host crawl accounting: #urls, #bytes, #robots-denied, #dups,
    #dup-bytes.

    Reference: ``HostsReportMapper.java:52-77`` + ``HostsReportReducer.java:37-53``
    (5 summed counters per host).  One shuffle on ``host``; partial aggregation
    map-side keeps skewed hosts cheap.
    """
    b = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    robots = robots_denied if robots_denied is not None else F.lit(0)
    dup = dup_by_hash if dup_by_hash is not None else F.lit(0)
    return df.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("num_urls"),
        F.sum(b).alias("num_bytes"),
        F.sum(robots.cast("long")).alias("num_robots_denied"),
        F.sum(dup.cast("long")).alias("num_dup_by_hash"),
        F.sum((dup.cast("long") * b)).alias("num_dup_bytes"),
    )


def top_k(df: DataFrame, order_col: str, k: int = 20, ascending: bool = False) -> DataFrame:
    """Global top-k — Spark plans this as TakeOrderedAndProject (per-partition
    heap + driver merge), no full sort/shuffle.

    Reference: ``Instrument.createSortedStat(..., SORT.time, 20)``
    (``warc-indexer/.../util/Instrument.java:88``).
    """
    col = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(col).limit(k)


def warc_regex_matches(
    df: DataFrame,
    pattern: str,
    url_col: str = "target_uri",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    max_chars: int = 1024 * 1024,
) -> DataFrame:
    """``(record_key, match)`` rows: every occurrence of ``pattern`` in the
    first MiB of each payload, keyed by digits-only-date ``/`` URL
    (``WARCRegexMapper.java:78-93``; ``0/unknown`` when the header is empty).
    Compose with :func:`frequency_count` for the reference's
    ``WARCRegexIndexer`` job shape.  Pure codegen: ``regexp_extract_all`` +
    explode, no UDF."""
    key = F.when(
        F.col(url_col).isNull() & F.col(date_col).isNull(), F.lit("0/unknown")
    ).otherwise(
        F.concat_ws(
            "/",
            F.regexp_replace(F.coalesce(F.col(date_col), F.lit("")), "[^0-9]", ""),
            F.coalesce(F.col(url_col), F.lit("unknown")),
        )
    )
    return df.select(
        key.alias("record_key"),
        F.explode(
            F.regexp_extract_all(
                F.substring(F.col(payload_col), 1, max_chars), F.lit(pattern), F.lit(0)
            )
        ).alias("match"),
    )
