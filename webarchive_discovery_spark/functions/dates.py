"""Crawl-date / wayback-timestamp functions as column expressions.

Reference semantics:
- wayback 14-digit timestamp ``yyyyMMddHHmmss`` and its 12/16/17-digit
  variants (``WARCIndexer.java:791-807``) — shorter forms right-padded,
  longer forms truncated;
- ``extractYear`` with the ``0000``→unknown guard (``WARCIndexer.java:827-838``);
- record id = ``waybackDate + "/" + base64(md5(url))``
  (``WARCIndexer.java:519-546``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["wayback_date", "parse_wayback_timestamp", "crawl_year", "record_id"]


def wayback_date(ts: Column) -> Column:
    """Timestamp column → 14-digit wayback date string ``yyyyMMddHHmmss``."""
    return F.date_format(ts, "yyyyMMddHHmmss")


def parse_wayback_timestamp(s: Column) -> Column:
    """12/14/16/17-digit wayback string → timestamp.  12-digit forms lack
    seconds (padded ``00``); >14 digits are truncated (sub-second)."""
    digits = F.regexp_replace(s, r"[^0-9]", "")
    norm = F.rpad(F.substring(digits, 1, 14), 14, "0")
    return F.to_timestamp(norm, "yyyyMMddHHmmss")


def crawl_year(ts_or_str: Column, is_string: bool = False) -> Column:
    """Year with the reference's unknown-year guard: ``0000`` → null."""
    year = (
        F.substring(ts_or_str, 1, 4).cast("int") if is_string else F.year(ts_or_str)
    )
    return F.when(year > 0, year)


def record_id(wayback: Column, url: Column) -> Column:
    """``waybackDate/base64(md5(url))`` — the reference's capture id
    (URL × timestamp uniqueness, ``WARCIndexer.java:519-546``)."""
    return F.concat(wayback, F.lit("/"), F.base64(F.unhex(F.md5(url))))
