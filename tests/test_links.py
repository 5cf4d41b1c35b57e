"""HTML link-extraction conformance: golden counts/values ported from the
reference's ``HTMLAnalyserTest.java:60-124`` over reconstructions of its
fixtures ``links_extract.html`` / ``links_extract_illegals.html``
(warc-indexer/src/test/resources/).  Divergences from the jsoup-based
reference are documented in ``operators/links.py``.
"""

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators.links import extract_html_links

# Reconstruction of warc-indexer/src/test/resources/links_extract.html
LINKS_EXTRACT_HTML = """
<html>
<head><title>Page for link extraction checking</title></head>
<body background="mybackground.jpg"> <!-- HTML 4 style -->
<h1>See HTMLAnalyserTest for test code</h1>
<p><ul>
<li><a href="#internal">Internal</a></li>
<li><a href="http://example.org/sub1.html">External</a></li>
<li><a href="http://www.example.org/sub1.html">External with WWW prefix</a></li>
<li><a href="http://example.org/sub2.html#anchor">External with anchor</a></li>
<li><a href="http://example.org/sub1.html">External duplicate</a></li>
<li><a href="http://example.org/forgot to escape spaces.html">External with spaces</a></li>
<li><a href="">Empty link</a></li>
</ul></p>
<p><img src="http://example.org/fooA.png" srcset="http://example.org/foo1.png 1.5x, http://example.org/foo2.png 2x" /></p>
<p><img src="fooB.png" srcset="foo3.png 720w, http://example.org/foo4.png 1080w" /></p>
<p><img src="http://example.org/fooD.png" srcset="http://example.org/foo5.png" /></p>
<picture>
<source media="(min-width:650px)" srcset="http://example.org/fooC1.png">
<source media="(min-width:465px)" srcset="http://example.org/fooC2.png">
<img src="http://example.org/fooC0.png" alt="Flowers" style="width:auto;">
</picture>
</body>
</html>
"""

# Reconstruction of warc-indexer/src/test/resources/links_extract_illegals.html
LINKS_ILLEGALS_HTML = """
<html>
<head><title>Illegal links for testing host extraction resilience</title></head>
<body>
<h1>See HTMLAnalyserTest for test code</h1>
<ul>
<li><a href="http://valid.example.com">Valid</a></li>
<li><a href="http://æblegrød.dk">Non-ascii letters</a></li>
<li><a href="http://example.com&arguments">Missing slash</a></li>
<li><a href="not a link at all">Not n URL</a></li>
<li><a href="uuid:123456-1234-1234-12345678">UUID</a></li>
<li><a href="">Empty link</a></li>
</ul>
</body>
</html>
"""


def _extract(spark, base_url, html):
    df = spark.createDataFrame([(base_url, html)], "url string, payload string")
    return extract_html_links(df).first()


def test_links_extraction_goldens(spark):
    """HTMLAnalyserTest.testLinksExtraction: 6 links, 1 canonical host
    (www stripped), domain/suffix, SURT levels, 12 image links."""
    row = _extract(spark, "file:///tmp/links_extract.html", LINKS_EXTRACT_HTML)
    assert len(row.links) == 6
    assert row.links_hosts == ["example.org"]
    assert row.links_domains == ["example.org"]
    assert row.links_public_suffixes == ["org"]
    assert row.links_hosts_surts == ["(org,", "(org,example,"]
    assert len(row.links_images) == 12
    # src AND srcset entries are both present, relative ones resolved
    assert "http://example.org/foo2.png" in row.links_images
    assert "file:///tmp/foo3.png" in row.links_images
    assert "file:///tmp/mybackground.jpg" in row.links_images


def test_illegal_host_handling(spark):
    """HTMLAnalyserTest.testIllegalHostHandling/testIllegalDomainHandling:
    6 links survive; only RFC-952-valid hosts (subject-uri host + the one
    valid absolute link); domains likewise."""
    row = _extract(spark, "http://test.example.net/illegals.html", LINKS_ILLEGALS_HTML)
    assert len(row.links) == 6
    assert row.links_hosts == ["test.example.net", "valid.example.com"]
    # registered domain, not the full host ("valid." is host-only)
    assert set(row.links_domains) == {"example.com", "example.net"}


def test_empty_and_null_payload(spark):
    df = spark.createDataFrame(
        [("http://a.org/", None), ("http://a.org/", "<p>no links</p>")],
        "url string, payload string",
    )
    rows = extract_html_links(df).collect()
    for r in rows:
        assert r.links == [] and r.links_images == []


def test_normalise_links_mode(spark):
    html = '<a href="http://www.Example.org/a//b">x</a>'
    df = spark.createDataFrame([("http://e.org/", html)], "url string, payload string")
    row = extract_html_links(df, normalise_links=True).first()
    assert row.links == ["http://example.org/a//b"]  # www+case stripped; path kept verbatim


def test_single_arrow_pass(spark):
    df = spark.createDataFrame([("http://a.org/", "<a href='x'>y</a>")],
                               "url string, payload string")
    plan = extract_html_links(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_outlink_edges_shape(spark):
    from webarchive_discovery_spark.operators.links import outlink_edges

    df = spark.createDataFrame(
        [("http://a.org/p", '<a href="/x">1</a><a href="http://b.net/y">2</a>')],
        "url string, payload string",
    )
    edges = {(r.src_url, r.dst_url) for r in outlink_edges(df).collect()}
    assert edges == {
        ("http://a.org/p", "http://a.org/x"),
        ("http://a.org/p", "http://b.net/y"),
    }


def test_elements_used_golden(spark):
    """DISTINCT_ELEMENTS semantics (HtmlFeatureParser.java:213-236): every
    distinct written tag name, lowercased, sorted for determinism."""
    row = _extract(spark, "http://example.org/test.html", LINKS_EXTRACT_HTML)
    assert row.elements_used == [
        "a", "body", "h1", "head", "html", "img", "li", "p",
        "picture", "source", "title", "ul",
    ]


def test_license_and_rel_name_attrs(spark):
    """license_url (HtmlFeatureParser.java:238-249): raw unresolved hrefs of
    a/link/area[rel=license] in document order; other rel values ignored;
    link/@rel= and meta/@name= entries land in elements_used."""
    html = (
        '<html><body>'
        '<a rel="license" href="http://creativecommons.org/licenses/by/4.0/">CC</a>'
        '<a rel="nofollow" href="http://spam.example/x">no</a>'
        '<link rel="license" href="/l2">'
        '<area rel="license" href="l3.html">'
        '<meta name="Keywords" content="k">'
        "</body></html>"
    )
    row = _extract(spark, "http://e.org/p", html)
    assert row.license_url == [
        "http://creativecommons.org/licenses/by/4.0/", "/l2", "l3.html",
    ]
    assert "link/@rel=license" in row.elements_used
    assert "meta/@name=keywords" in row.elements_used
    assert "area" in row.elements_used and "meta" in row.elements_used


def test_elements_used_script_body_excluded(spark):
    """script/style bodies are dropped but their open tags counted; the
    reference's ELEMENT_NAME filter exists to weed JS false positives — we
    avoid them instead (documented divergence)."""
    html = "<div><script>if (3<a) foo('<b>');</script><style>p{}</style></div>"
    row = _extract(spark, "http://e.org/", html)
    assert row.elements_used == ["div", "script", "style"]


def test_adversarial_markup_bounded(spark):
    """Inputs engineered to make the lazy-pair regexes quadratic (the attack
    the reference's 30 s parser thread-timeout absorbs) must come back as a
    links_parse_error row in bounded wall-clock — never a stalled executor
    core.  A big-but-benign single-line page still parses normally."""
    import time

    bad_no_gt = "<a href=x " * 100_000          # ~1 MB, not a single '>'
    bad_brackets = "<" * 1_000_000              # deep-nested brackets
    bad_comments = "<!-- > " * 150_000          # '>' present, '-->' never
    benign_10mb = ('<a href="http://ok.example.org/a">x</a>' + "y" * 60) * 100_000
    df = spark.createDataFrame(
        [("http://h/1", bad_no_gt), ("http://h/2", bad_brackets),
         ("http://h/3", bad_comments), ("http://h/4", benign_10mb)],
        "url string, payload string",
    )
    t0 = time.monotonic()
    rows = {r["url"]: r for r in extract_html_links(df).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"adversarial batch took {elapsed:.1f}s"
    for u in ("http://h/1", "http://h/2", "http://h/3"):
        assert rows[u]["links_parse_error"], u
        assert rows[u]["links"] == []
    ok = rows["http://h/4"]
    assert ok["links_parse_error"] is None
    assert ok["links"] == ["http://ok.example.org/a"]
