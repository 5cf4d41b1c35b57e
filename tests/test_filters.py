"""Exact-count filter fixtures (FIXTURES.md §8, pattern from
WARCIndexerTest.java:115-240) exercised through the PACKAGED operators in
``operators/record_filters.py`` — a deterministic 36-row mini-frontier where
each filter configuration must null out an exact pre-computed count."""

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import record_filters as rf


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
    assert rf.record_type_filter(mini_frontier).count() == 27  # 36 - 9 requests


def test_protocol_filter(mini_frontier):
    assert rf.protocol_filter(mini_frontier).count() == 32  # ftp + dns excluded


def test_url_exclude_filter(mini_frontier):
    assert rf.url_exclude_filter(mini_frontier, "url", r".*robots\.txt.*").count() == 27
    # no pattern configured → no-op (reference default)
    assert rf.url_exclude_filter(mini_frontier, "url", None).count() == 36


def test_response_code_filter(mini_frontier):
    assert rf.response_code_filter(mini_frontier, "status").count() == 18


def test_url_type_classification(mini_frontier):
    typed = rf.with_url_type(mini_frontier)
    counts = {r["url_type"]: r["count"] for r in typed.groupBy("url_type").count().collect()}
    assert counts == {"robots.txt": 9, "slashpage": 18, "normal": 9}
    # empty path counts as slashpage (WARCIndexer.java:599-601)
    one = rf.with_url_type(
        mini_frontier.sparkSession.createDataFrame([("http://h.org",)], "url string")
    ).first()
    assert one.url_type == "slashpage"


def test_slashpage_only(mini_frontier):
    assert rf.slashpage_only(mini_frontier).count() == 18


def test_combined_filters_exact(mini_frontier):
    kept = rf.default_filter_chain(
        mini_frontier,
        record_type_col="record_type",
        url_col="url",
        status_col="status",
        exclude_pattern=r".*robots\.txt.*",
    ).filter(F.col("status").startswith("2"))
    assert kept.count() == 9  # exactly the i%4==0 rows (response, http, "/", 200)


def test_filter_chain_is_codegen(mini_frontier):
    plan = rf.default_filter_chain(
        mini_frontier, status_col="status"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
