"""Annotation application semantics (Annotator.java:127-288): the four
scopes, date gating of collections, ungated subjects, OA/RRO SURT terms."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators.annotations import apply_annotations

TS = dt.datetime


@pytest.fixture(scope="module")
def captures(spark):
    rows = [
        # (url_norm, host, crawl_date, source_file, url_key)
        ("http://example.org/page1", "example.org", TS(2015, 6, 1), "job-a.warc", "(org,example,)/page1"),
        ("http://example.org/section/deep", "example.org", TS(2021, 1, 1), "job-b.warc", "(org,example,)/section/deep"),
        ("http://blog.example.org/x", "blog.example.org", TS(2015, 6, 1), "job-a.warc", "(org,example,blog,)/x"),
        ("http://other.net/y", "other.net", TS(2015, 6, 1), "special-123.warc", "(net,other,)/y"),
    ]
    return spark.createDataFrame(
        rows, "url_norm string, host string, crawl_date timestamp, source_file string, url_key string"
    )


@pytest.fixture(scope="module")
def annotations(spark):
    rows = [
        # scope, key, collection, collections, subjects, date_from, date_to
        ("resource", "http://example.org/page1", "colA", ["colA", "colA1"], ["subj1"],
         TS(2010, 1, 1), TS(2020, 1, 1)),
        ("root", "http://example.org/section/", "colB", ["colB"], None,
         TS(2010, 1, 1), TS(2020, 1, 1)),  # capture is 2021 → date-gated OUT
        ("subdomains", "example.org", "colC", None, ["subj2"], None, None),
        ("subdomains", "deep.blog.example.org", "colE", None, None, None, None),
        ("source_file_matches", r"special-\d+\.warc", "colD", ["colD"], None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "scope string, key string, collection string, collections array<string>, "
        "subjects array<string>, date_from timestamp, date_to timestamp",
    )


@pytest.fixture(scope="module")
def annotated(spark, captures, annotations):
    surts = spark.createDataFrame([("(org,example,",)], "prefix string")
    df = apply_annotations(
        captures, annotations, open_access_surts=surts, surt_col="url_key"
    )
    return {r.url_norm: r for r in df.collect()}


def test_resource_scope_with_date_gate(annotated):
    r = annotated["http://example.org/page1"]
    # resource (in range) + both subdomain annotations (example.org equals;
    # deep.blog.example.org is a subdomain of the record's domain)
    assert r.collection == ["colA", "colC", "colE"]
    assert r.collections == ["colA", "colA1"]
    assert r.wct_subjects == ["subj1", "subj2"]


def test_root_scope_date_gated_out(annotated):
    r = annotated["http://example.org/section/deep"]
    # root prefix matches but 2021 is outside [2010, 2020] → collections
    # dropped; the ungated subdomains annotations still apply
    assert r.collection == ["colC", "colE"]
    assert r.collections == []
    assert r.wct_subjects == ["subj2"]


def test_subdomains_scope_reference_direction(annotated):
    """Annotator.java:181: the KEY's host must equal the record's
    www-stripped host or be a subdomain of it — so an annotation keyed on
    the parent domain does NOT cover child hosts, but one keyed on a deeper
    subdomain covers its ancestors."""
    r = annotated["http://blog.example.org/x"]
    assert r.collection == ["colE"]  # from deep.blog.example.org, not colC
    assert r.wct_subjects == []


def test_source_file_regex_scope(annotated):
    r = annotated["http://other.net/y"]
    assert r.collection == ["colD"]
    assert r.collections == ["colD"]


def test_access_terms_oa_rro(annotated):
    assert annotated["http://example.org/page1"].access_terms == "OA"
    assert annotated["http://blog.example.org/x"].access_terms == "OA"
    assert annotated["http://other.net/y"].access_terms == "RRO"


def test_plan_is_broadcast_only(spark, captures, annotations):
    df = apply_annotations(captures, annotations)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
