"""Sitemap discovery: robots Sitemap: directives, sitemap/sitemapindex XML
parsing, and frontier priority scoring (operators/sitemap.py)."""

import datetime

from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import sitemap as sm

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example.org/p?x=1&amp;y=2 </loc>
    <lastmod>2024-03-05T08:00:00+00:00</lastmod>
    <changefreq>Daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example.org/only-loc</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://a.example.org/bad</loc>
       <lastmod>not-a-date</lastmod>
       <changefreq>fortnightly</changefreq>
       <priority>2.5</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sm:sitemap><sm:loc>https://b.example.org/s1.xml</sm:loc>
    <sm:lastmod>2024-02-10</sm:lastmod></sm:sitemap>
  <sm:sitemap><sm:loc>https://b.example.org/s2.xml</sm:loc></sm:sitemap>
</sm:sitemapindex>"""

ROBOTS = """# hello
User-agent: *
Disallow: /private
Sitemap: https://a.example.org/sitemap.xml
sitemap: https://a.example.org/extra.xml   # trailing comment
Sitemap:
"""


def _caps(spark, rows):
    return spark.createDataFrame(rows, "host string, payload string, url_type string")


def test_parse_urlset(spark):
    caps = _caps(spark, [("a.example.org", URLSET, "sitemap.xml")])
    rows = {r["loc"]: r for r in sm.parse_sitemaps(caps).collect()}
    # entry with no <loc> is dropped, others survive
    assert set(rows) == {
        "https://a.example.org/p?x=1&y=2",  # entity-decoded + trimmed
        "https://a.example.org/only-loc",
        "https://a.example.org/bad",
    }
    full = rows["https://a.example.org/p?x=1&y=2"]
    assert full["kind"] == "url"
    assert full["lastmod"] == "2024-03-05T08:00:00+00:00"
    assert full["lastmod_date"] == datetime.date(2024, 3, 5)
    assert full["changefreq"] == "daily"  # lowercased
    assert full["priority"] == 0.8
    bare = rows["https://a.example.org/only-loc"]
    assert bare["lastmod"] is None and bare["changefreq"] is None
    assert bare["priority"] == 0.5  # protocol default
    bad = rows["https://a.example.org/bad"]
    assert bad["lastmod"] == "not-a-date" and bad["lastmod_date"] is None
    assert bad["changefreq"] is None  # invalid value
    assert bad["priority"] == 1.0  # clamped


def test_parse_namespaced_index(spark):
    caps = _caps(spark, [("b.example.org", INDEX, "sitemap.xml")])
    rows = sorted(sm.parse_sitemaps(caps).collect(), key=lambda r: r["loc"])
    assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
    assert rows[0]["loc"] == "https://b.example.org/s1.xml"
    assert rows[0]["lastmod_date"] == datetime.date(2024, 2, 10)
    assert rows[1]["lastmod"] is None


def test_robots_sitemap_directives(spark):
    caps = _caps(
        spark,
        [
            ("a.example.org", ROBOTS, "robots.txt"),
            ("a.example.org", URLSET, "sitemap.xml"),  # wrong type: ignored
        ],
    )
    got = {
        r["sitemap_url"] for r in sm.robots_sitemap_directives(caps).collect()
    }
    # case-insensitive key, comment stripped, empty value dropped
    assert got == {
        "https://a.example.org/sitemap.xml",
        "https://a.example.org/extra.xml",
    }


def test_frontier_scores(spark):
    caps = _caps(spark, [("a.example.org", URLSET, "sitemap.xml")])
    entries = sm.parse_sitemaps(caps)
    out = {
        r["url"]: r["crawl_priority"]
        for r in sm.sitemap_frontier(entries, as_of_date="2024-03-05").collect()
    }
    # full entry: 0.5*0.8 + 0.3*0.8(daily) + 0.2*1.0 (age 0 → decay 1)
    assert abs(out["https://a.example.org/p?x=1&y=2"] - 0.84) < 1e-9
    # defaults-only entry: 0.5*0.5 + 0.3*0.5 + 0.2*0.5 = 0.5
    assert abs(out["https://a.example.org/only-loc"] - 0.5) < 1e-9
    # clamped priority, no parseable date: 0.5*1.0 + 0.3*0.5 + 0.2*0.5 = 0.75
    assert abs(out["https://a.example.org/bad"] - 0.75) < 1e-9


def test_frontier_scores_freshness_decay(spark):
    entries = spark.createDataFrame(
        [
            ("h", "url", "https://h/x", "2024-01-01", datetime.date(2024, 1, 1), None, 0.5),
            ("h", "url", "https://h/y", "2024-01-31", datetime.date(2024, 1, 31), None, 0.5),
        ],
        "host string, kind string, loc string, lastmod string, "
        "lastmod_date date, changefreq string, priority double",
    )
    out = {
        r["url"]: r["crawl_priority"]
        for r in sm.sitemap_frontier(
            entries, as_of_date="2024-01-31", freshness_half_life_days=30.0
        ).collect()
    }
    # 30 days old = exactly one half-life: fresher page leads by 0.2*(1-0.5)
    assert abs((out["https://h/y"] - out["https://h/x"]) - 0.1) < 1e-6


def test_no_python_udf_in_plan(spark):
    caps = _caps(spark, [("a.example.org", URLSET, "sitemap.xml")])
    plan = sm.sitemap_frontier(
        sm.parse_sitemaps(caps), as_of_date="2024-03-05"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
