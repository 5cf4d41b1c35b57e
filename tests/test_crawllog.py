"""crawl.log source parsing (HostsReportMapper.java:43-80 semantics) and the
hosts-report pipeline fed from it."""

from webarchive_discovery_spark.operators.aggregates import hosts_report
from webarchive_discovery_spark.sources.crawllog import parse_crawl_log_lines

LINES = [
    # ts status size uri path referrer mime thread reqts digest via annotations
    "2024-01-01T00:00:00Z 200 1024 http://a.org/x L http://a.org/ text/html 1 t+10 sha1:AAA - -",
    "2024-01-01T00:00:01Z 200 2048 http://a.org/y L http://a.org/ text/html 1 t+10 sha1:BBB - warcRevists:digest",
    "2024-01-01T00:00:02Z -9998 - http://b.net/z L - unknown 2 t+1 - - -",     # robots-denied
    "2024-01-01T00:00:03Z -404 - http://b.net/w L - unknown 2 t+1 - - -",      # invalid negative
    "2024-01-01T00:00:04Z 200 10 dns:c.com P - text/dns 3 t+1 sha1:CCC - -",   # dns: entry
    "short line",                                                               # != 12 cols
]


def test_crawl_log_parsing(spark):
    df = parse_crawl_log_lines(spark.createDataFrame([(l,) for l in LINES], "value string"))
    rows = {r.uri: r for r in df.collect()}
    assert set(rows) == {"http://a.org/x", "http://a.org/y", "http://b.net/z", "dns:c.com"}
    assert rows["http://a.org/x"].host == "a.org"
    assert rows["http://a.org/x"].num_bytes == 1024
    assert rows["http://a.org/y"].dup_by_hash == 1
    assert rows["http://b.net/z"].robots_denied == 1
    assert rows["http://b.net/z"].num_bytes == 0
    assert rows["dns:c.com"].host == "c.com"


def test_crawl_log_feeds_hosts_report(spark):
    from pyspark.sql import functions as F

    df = parse_crawl_log_lines(spark.createDataFrame([(l,) for l in LINES], "value string"))
    rep = {r.host: r for r in hosts_report(
        df, host_col="host", bytes_col="num_bytes",
        robots_denied=F.col("robots_denied"), dup_by_hash=F.col("dup_by_hash"),
    ).collect()}
    assert rep["a.org"].num_urls == 2
    assert rep["a.org"].num_bytes == 3072
    assert rep["a.org"].num_dup_by_hash == 1
    assert rep["a.org"].num_dup_bytes == 2048
    assert rep["b.net"].num_robots_denied == 1


def test_crawl_log_is_codegen(spark):
    df = parse_crawl_log_lines(spark.createDataFrame([("x",)], "value string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
