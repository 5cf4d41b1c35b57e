"""Heritrix crawl.log line source.

Reference: ``HostsReportMapper.java:43-80`` — 12 whitespace-separated
columns ``timestamp status size uri discovery_path referrer mime thread
request_ts+dur digest - annotations``; lines with ≠12 columns are dropped;
negative status codes are invalid EXCEPT ``-9998`` (robots-denied);
``size == '-'`` means 0; host comes from the URI (``dns:`` entries keep the
bare name); a ``warcRevists:digest`` annotation marks a hash-duplicate.

Spark shape: ``spark.read.text`` + pure column expressions (split, when
ladders) — whole-stage codegen end to end, filters pushable; feeds
``aggregates.hosts_report`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_crawl_log", "parse_crawl_log_lines"]

CRAWL_LOG_COLUMNS = [
    "log_ts", "status", "size", "uri", "discovery_path", "referrer",
    "mime", "thread", "request_ts", "digest", "via", "annotations",
]

ROBOTS_DENIED_STATUS = "-9998"


def parse_crawl_log_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw crawl.log lines into typed columns + derived accounting
    fields (host, num_bytes, robots_denied, dup_by_hash), dropping invalid
    rows exactly like the reference mapper.

    The always-true nondeterministic guard below pins the validity filter
    AT the parse: when ``value`` is itself a computed column (a synthesized
    or transformed line), Catalyst would otherwise push the filter below
    the producer's exchange — re-deriving the full line + split once per
    conjunct on the PRE-exchange side (measured 2x the whole query at
    sf0.1, and on a narrow scan it serializes the parse onto the scan's
    task count).  ``spark_partition_id() >= 0`` keeps every row and costs
    one int compare; for plain text scans the filter ran at the scan
    anyway, so nothing is lost there."""
    lines = lines.filter(F.spark_partition_id() >= 0)
    toks = F.split(F.trim(F.col(value_col)), r"\s+")
    parsed = lines.select(
        *[toks.getItem(i).alias(name) for i, name in enumerate(CRAWL_LOG_COLUMNS)],
        F.size(toks).alias("_ncols"),
    )
    valid = parsed.filter(
        (F.col("_ncols") == 12)
        & (
            ~F.col("status").startswith("-")
            | (F.col("status") == ROBOTS_DENIED_STATUS)
        )
    ).drop("_ncols")
    host = F.when(
        F.col("uri").startswith("dns:"),
        F.regexp_replace(F.col("uri"), r"^dns:", ""),
    ).otherwise(F.regexp_extract(F.col("uri"), r"^https?://([^/]+)/.*$", 1))
    dup = F.col("annotations").contains("warcRevists:digest")
    num_bytes = F.when(F.col("size") == "-", F.lit(0)).otherwise(
        F.col("size").cast("long")
    )
    return valid.select(
        "*",
        host.alias("host"),
        num_bytes.alias("num_bytes"),
        (F.col("status") == ROBOTS_DENIED_STATUS).cast("long").alias("robots_denied"),
        dup.cast("long").alias("dup_by_hash"),
    ).filter(F.col("host") != "")


def read_crawl_log(spark: SparkSession, path: str) -> DataFrame:
    """crawl.log file(s) → parsed rows (text scan is splittable; gzip logs
    fall back to one task per file, like any text source)."""
    return parse_crawl_log_lines(spark.read.text(path))
