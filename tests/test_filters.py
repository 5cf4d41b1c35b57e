"""Exact-count filter fixtures (FIXTURES.md §8, pattern from
WARCIndexerTest.java:115-240): a deterministic 36-row mini-frontier where
each filter configuration must null out an exact pre-computed count."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mini_frontier(spark):
    # 36 rows like the IAH-urls-wget.warc.gz fixture: a mix of record types,
    # protocols, status codes and paths — all deterministic
    rows = []
    for i in range(36):
        rtype = ["response", "request", "revisit", "resource"][i % 4]
        proto = ["http", "https", "ftp", "dns"][i % 4 if i < 8 else 0]
        status = ["200", "301", "404", "503"][i % 4]
        path = ["/", "/index.html", "/robots.txt", f"/page/{i}"][i % 4]
        rows.append((i, rtype, f"{proto}://h{i % 6}.example.org{path}", status))
    return spark.createDataFrame(rows, "id int, record_type string, url string, status string")


def test_record_type_filter(mini_frontier):
    # keep response/resource/revisit (reference.conf:90-92; WARCIndexer.java:308-310)
    kept = mini_frontier.filter(
        F.col("record_type").isin("response", "resource", "revisit")
    )
    assert kept.count() == 27  # 36 - 9 requests


def test_protocol_filter(mini_frontier):
    # keep http/https (WARCIndexer.java:850-857)
    kept = mini_frontier.filter(F.col("url").rlike("^https?://"))
    assert kept.count() == 32  # rows 2,6 ftp + 3,7 dns excluded


def test_url_exclude_filter(mini_frontier):
    # drop URLs matching .*robots.txt.* (WARCIndexer.java:840-848)
    kept = mini_frontier.filter(~F.col("url").rlike(".*robots\\.txt.*"))
    assert kept.count() == 27  # 9 robots.txt rows dropped


def test_response_code_filter(mini_frontier):
    # keep status startswith "2" or "3" (WARCIndexer.java:859-875)
    kept = mini_frontier.filter(
        F.col("status").startswith("2") | F.col("status").startswith("3")
    )
    assert kept.count() == 18


def test_url_type_classification(mini_frontier):
    # url_type: robots.txt exact path; slashpage for / or /index.*
    # (WARCIndexer.java:599-606)
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    typed = mini_frontier.withColumn(
        "url_type",
        F.when(path == "/robots.txt", "robots.txt")
        .when((path == "/") | path.rlike("^/index\\."), "slashpage")
        .otherwise("normal"),
    )
    counts = {r["url_type"]: r["count"] for r in typed.groupBy("url_type").count().collect()}
    assert counts == {"robots.txt": 9, "slashpage": 18, "normal": 9}


def test_combined_filters_exact(mini_frontier):
    # stacked filter chain mirrors the reference's extract() short-circuit
    kept = (
        mini_frontier.filter(F.col("record_type").isin("response", "resource", "revisit"))
        .filter(F.col("url").rlike("^https?://"))
        .filter(~F.col("url").rlike(".*robots\\.txt.*"))
        .filter(F.col("status").startswith("2"))
    )
    assert kept.count() == 9  # exactly the i%4==0 rows (response, http, "/", 200)
