"""Tika-lite HTML metadata extraction (TikaPayloadAnalyser field mapping,
HtmlFeatureParser first-paragraph, 512 KiB text cap)."""

from webarchive_discovery_spark.operators.metadata import (
    TEXT_CAP,
    extract_html_metadata,
)

HTML = """
<html>
<head>
  <meta charset="UTF-8">
  <title>  The   Title &amp; More </title>
  <meta name="description" content="A &quot;useful&quot; page">
  <meta name="keywords" content="web, archive , discovery">
  <meta name="author" content="Jane Doe">
  <meta name="generator" content="WordPress 6.0">
  <script>var x = "<p>not a paragraph</p>";</script>
</head>
<body>
  <p>   </p>
  <p>First real <b>paragraph</b> text.</p>
  <p>Second paragraph.</p>
  Body tail text.
</body>
</html>
"""


def test_metadata_fields(spark):
    df = spark.createDataFrame([(HTML,)], "payload string")
    r = extract_html_metadata(df).first()
    assert r.title == "The Title & More"
    assert r.description == 'A "useful" page'
    assert r.keywords == ["web", "archive", "discovery"]
    assert r.author == "Jane Doe"
    assert r.generator == "WordPress 6.0"
    assert r.content_encoding == "utf-8"
    assert r.first_paragraph == "First real paragraph text."
    assert "First real paragraph text." in r.text
    assert "not a paragraph" not in r.text  # script stripped
    assert "The Title" not in r.text        # head stripped from body text
    assert r.content_text_length == len(r.text)
    assert r.meta_parse_error is None


def test_http_equiv_charset(spark):
    html = ('<head><meta http-equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1"></head><body>x</body>')
    df = spark.createDataFrame([(html,)], "payload string")
    assert extract_html_metadata(df).first().content_encoding == "iso-8859-1"


def test_text_cap_and_null(spark):
    big = "<body>" + ("word " * (TEXT_CAP // 4)) + "</body>"
    df = spark.createDataFrame([(big,), (None,)], "payload string")
    rows = extract_html_metadata(df).collect()
    capped = [r for r in rows if r.text is not None][0]
    assert capped.content_text_length <= TEXT_CAP
    nulled = [r for r in rows if r.text is None][0]
    assert nulled.content_text_length is None


def test_single_arrow_pass(spark):
    df = spark.createDataFrame([("<title>t</title>",)], "payload string")
    plan = extract_html_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_xml_root_ns(spark):
    """XMLAnalyser semantics (XMLRootNamespaceParser.java:80-89): uri#local
    lowercased, only for namespaced roots of XML-typed records."""
    from webarchive_discovery_spark.operators.metadata import extract_xml_root_ns

    rows = [
        ("application/xml",
         '<?xml version="1.0"?><RSS xmlns="http://Purl.org/rss/1.0/"><x/></RSS>'),
        ("text/xml; charset=utf-8",
         '<svg:SVG xmlns:svg="http://www.w3.org/2000/svg"/>'),
        ("application/xml", "<plain><noNamespace/></plain>"),
        ("application/xml", "<broken <<"),
        ("text/html", '<root xmlns="http://never.parsed/"/>'),  # mime-gated out
    ]
    df = spark.createDataFrame(rows, "content_type string, payload string")
    out = extract_xml_root_ns(df, mime_col="content_type").collect()
    assert out[0].xml_root_ns == "http://purl.org/rss/1.0/#rss"
    assert out[1].xml_root_ns == "http://www.w3.org/2000/svg#svg"
    assert out[2].xml_root_ns is None
    assert out[3].xml_root_ns is None
    assert out[4].xml_root_ns is None


def test_adversarial_markup_bounded(spark):
    """Pathological markup is refused by the scan-cost guard and lands in
    parse_error in bounded time; a benign oversized page still parses."""
    import time

    from webarchive_discovery_spark.operators.metadata import extract_html_metadata

    bad = "<title>" * 120_000                  # unterminated titles, ~1 MB
    benign = "<html><head><title>T.</title></head><body><p>Hello world.</p>" \
             + "z" * 2_000_000 + "</body></html>"
    df = spark.createDataFrame(
        [(1, bad), (2, benign)], "id long, payload string"
    )
    t0 = time.monotonic()
    rows = {r["id"]: r for r in extract_html_metadata(df).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"adversarial batch took {elapsed:.1f}s"
    assert rows[1]["meta_parse_error"] and "MarkupGuard" in rows[1]["meta_parse_error"]
    assert rows[1]["title"] is None
    assert rows[2]["meta_parse_error"] is None
    assert rows[2]["title"] == "T."
    assert rows[2]["first_paragraph"] == "Hello world."


def test_boilerplate_extraction(spark):
    """Main-content extraction: link-dense and short blocks drop, article
    blocks survive, per-record failures (pathological markup) land in
    boilerplate_parse_error, null payloads stay null."""
    from webarchive_discovery_spark.operators.boilerplate import extract_main_content

    page = (
        '<html><body>'
        '<nav><a href="/1">One</a> <a href="/2">Two</a> <a href="/3">Three</a></nav>'
        '<p>This is the real article content with plenty of meaningful words '
        'carrying the substance of the page onward.</p>'
        '<ul><li><a href="/x">x</a></li><li><a href="/y">y</a></li></ul>'
        '<footer>tiny footer</footer></body></html>'
    )
    df = spark.createDataFrame(
        [(1, page), (2, None), (3, "<title>" * 120_000)],
        "id long, payload string",
    )
    rows = {r["id"]: r for r in extract_main_content(df).collect()}
    assert rows[1]["main_text"].startswith("This is the real article content")
    assert rows[1]["blocks_kept"] == 1
    assert rows[1]["boilerplate_parse_error"] is None
    assert rows[2]["main_text"] is None and rows[2]["blocks_total"] is None
    assert rows[3]["boilerplate_parse_error"] and "MarkupGuard" in rows[3]["boilerplate_parse_error"]


# ---------------------------------------------------------------------------
# schema.org structured data (JSON-LD + microdata)
# ---------------------------------------------------------------------------

def test_structured_data_nested_types_and_errors():
    from webarchive_discovery_spark.operators.metadata import (
        _structured_data_one)

    html = (
        '<script type="application/ld+json">{"@type":"Article","author":'
        '{"@type":"Person"},"about":[{"@type":"Thing"}]}</script>'
        '<script type="application/ld+json">[{"@type":["A","B"]}]</script>'
        '<script type="application/ld+json">not json</script>'
        '<div itemtype="https://schema.org/Product"></div>'
        "<span itemtype='http://schema.org/Offer/'></span>"
    )
    r = _structured_data_one(html)
    assert r["ld_types"] == "A;Article;B;Person;Thing"
    assert (r["n_ld_blocks"], r["n_ld_errors"]) == (3, 1)
    assert r["microdata_types"] == "Offer;Product"


def test_structured_data_empty():
    from webarchive_discovery_spark.operators.metadata import (
        _structured_data_one)

    r = _structured_data_one("<html><body>plain</body></html>")
    assert r == {"ld_types": None, "n_ld_blocks": 0, "n_ld_errors": 0,
                 "microdata_types": None}
