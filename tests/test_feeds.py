"""RSS/Atom feed extraction tier."""

from webarchive_discovery_spark.functions.feeds import feed_extract
from webarchive_discovery_spark.operators.metadata import _docformat_one


def test_rss_cdata_and_entities():
    doc = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
           b"<title><![CDATA[My Blog & Co]]></title>"
           b"<item><title>First &amp; post</title></item>"
           b"<item><title>  Second\n  post </title></item>"
           b"</channel></rss>")
    r = feed_extract(doc)
    assert r["parse_error"] is None
    assert r["feed_format"] == "rss"
    assert r["title"] == "My Blog & Co"
    assert r["n_items"] == 2
    assert r["text"] == "First & post\nSecond post"


def test_atom_entries():
    doc = (b'<feed xmlns="http://www.w3.org/2005/Atom">'
           b"<title>A-Feed</title>"
           b"<entry><title>E1</title></entry>"
           b"<entry><title>E2</title></entry>"
           b"<entry><title>E3</title></entry></feed>")
    r = feed_extract(doc)
    assert (r["feed_format"], r["title"], r["n_items"]) == ("atom", "A-Feed", 3)
    assert r["text"] == "E1\nE2\nE3"


def test_feed_channel_title_not_confused_with_item_title():
    # item title appears FIRST in an entry before any channel title close:
    # the channel title must come from OUTSIDE the first item block
    doc = (b"<rss><channel><title>Chan</title>"
           b"<item><title>It</title></item></channel></rss>")
    assert feed_extract(doc)["title"] == "Chan"


def test_feed_malformed_total_and_dispatch():
    assert feed_extract(None)["parse_error"] == "null payload"
    assert feed_extract(b"<html></html>")["parse_error"] is not None
    rec = _docformat_one(
        b"<rss><channel><title>T</title><item><title>P</title></item>"
        b"</channel></rss>", "application/rss+xml")
    assert (rec["doc_format"], rec["doc_title"], rec["doc_pages"],
            rec["doc_text"]) == ("rss", "T", 1, "P")


def test_feed_empty_channel():
    r = feed_extract(b"<rss><channel><title>Empty</title></channel></rss>")
    assert (r["title"], r["n_items"], r["text"]) == ("Empty", 0, None)


def test_feed_scan_cost_guard():
    # 50k unclosed <item> openers in ~8 MB would make the lazy block regex
    # quadratic; the guard rejects it in one linear pass instead
    import time

    evil = (b"<rss><channel><title>T</title>"
            + b"<item><title>x</title>" * 50_000
            + b" " * 4_000_000)
    t0 = time.time()
    r = feed_extract(evil)
    assert time.time() - t0 < 5
    assert r["parse_error"] == "scan-cost budget exceeded (unclosed entries)"
