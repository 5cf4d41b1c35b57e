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
    # array<string> — multivalued in SolrFields/CAPTURE_SCHEMA
    assert annotated["http://example.org/page1"].access_terms == ["OA"]
    assert annotated["http://blog.example.org/x"].access_terms == ["OA"]
    assert annotated["http://other.net/y"].access_terms == ["RRO"]


def test_plan_is_broadcast_only(spark, captures, annotations):
    df = apply_annotations(captures, annotations)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


ANNOTATIONS_JSON = """/*
 * header comment, as in the shipped annotations files (Jackson ALLOW_COMMENTS)
 */
{
  "collections" : {
    "subdomains" : {
      "en.wikipedia.org" : {
        "collection" : "Wikipedia",
        "collections" : [ "Wikipedia" ],
        "subject" : [ "Crowdsourcing" ]
      }
    },
    "root" : {
      "http://en.wikipedia.org/" : {
        "collection" : "Wikipedia",
        "collections" : [ "Wikipedia", "Wikipedia|Main Site" ],
        "subject" : [ "Crowdsourcing" ]
      }
    },
    "plus1" : { },
    "resource" : {
      "http://en.wikipedia.org/wiki/Mona_Lisa" : {
        "collection" : "Wikipedia",
        "collections" : [ "Wikipedia", "Wikipedia|Main Site", "Wikipedia|Main Site|Mona Lisa" ],
        "subject" : [ "Crowdsourcing" ]
      }
    }
  },
  "collectionDateRanges" : {
    "Wikipedia|Main Site" : {
      "start" : "1970-01-01T00:00:00.000+0000",
      "end" : "2016-12-23T17:57:42.809+0000"
    },
    "Wikipedia" : {
      "start" : "1970-01-01T00:00:00.000+0000",
      "end" : "9999-12-23T17:57:42.749+0000"
    }
  }
}
"""


def test_load_annotations_json(spark, tmp_path):
    """Loader decomposition (Annotations.java → ANNOTATION_COLUMNS): one row
    per collection value with that value's own date range, one ungated
    subjects row; comment header stripped; plus1 preserved but inert."""
    from webarchive_discovery_spark.operators.annotations import (
        load_annotations_json,
    )

    p = tmp_path / "ann.json"
    p.write_text(ANNOTATIONS_JSON)
    ann = load_annotations_json(spark, str(p))
    rows = ann.collect()
    res = [r for r in rows if r.scope == "resource"]
    # 3 collection values + 1 subjects row
    assert len(res) == 4
    by_val = {r.collections[0]: r for r in res if r.collections}
    assert set(by_val) == {"Wikipedia", "Wikipedia|Main Site",
                           "Wikipedia|Main Site|Mona Lisa"}
    # per-value ranges: Main Site ends 2016; Mona Lisa has no range
    assert by_val["Wikipedia|Main Site"].date_to.year == 2016
    assert by_val["Wikipedia|Main Site|Mona Lisa"].date_to is None
    # the singular collection is attached to its own value's row only
    assert by_val["Wikipedia"].collection == "Wikipedia"
    assert by_val["Wikipedia|Main Site"].collection is None
    subj = [r for r in res if r.subjects]
    assert len(subj) == 1 and subj[0].subjects == ["Crowdsourcing"]
    assert subj[0].date_from is None


def test_loaded_annotations_apply_per_value_gating(spark, tmp_path):
    """End-to-end: a 2020 capture of the Mona Lisa page keeps 'Wikipedia'
    and the ungated 'Mona Lisa' value but loses 'Main Site' (range ended
    2016); subjects survive regardless."""
    from webarchive_discovery_spark.operators.annotations import (
        apply_annotations, load_annotations_json,
    )

    p = tmp_path / "ann.json"
    p.write_text(ANNOTATIONS_JSON)
    ann = load_annotations_json(spark, str(p))
    caps = spark.createDataFrame(
        [("http://en.wikipedia.org/wiki/Mona_Lisa", "en.wikipedia.org",
          TS(2020, 6, 1), "f.warc")],
        "url_norm string, host string, crawl_date timestamp, source_file string",
    )
    row = apply_annotations(caps, ann).first()
    assert row.collections == ["Wikipedia", "Wikipedia|Main Site|Mona Lisa"]
    assert row.collection == ["Wikipedia"]
    assert row.wct_subjects == ["Crowdsourcing"]
