"""RSS 2.0 / Atom 1.0 feed extraction (the Tika feed-parser tier).

Feeds are among the most common XML payloads in a web crawl; the reference
surfaces them through Tika's FeedParser (``TikaPayloadAnalyser.java:
165-414`` — title + entry text into the Solr document).  Pure-regex
bounded parser in the house style: format sniff from the root element,
channel/feed title, entry titles in document order, entry count.  Total:
malformed input lands in ``parse_error``, never raises.
"""

from __future__ import annotations

import re
from html import unescape as _xml_unescape

__all__ = ["feed_extract"]

_MAX_INPUT = 8 << 20
_RSS_ROOT = re.compile(r"<rss[\s>]", re.I)
_ATOM_ROOT = re.compile(r"<feed[\s>]", re.I)
_ITEM = re.compile(r"<(item|entry)[\s>].*?</\1>", re.S | re.I)
_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _title_text(block: str) -> str | None:
    m = _TITLE.search(block)
    if m is None:
        return None
    raw = m.group(1)
    cm = _CDATA.search(raw)
    if cm:
        raw = cm.group(1)
    return " ".join(_xml_unescape(raw).split()) or None


def feed_extract(data: bytes | None, max_items: int = 10_000) -> dict:
    """Extract ``{feed_format, title, n_items, text, parse_error}`` from an
    RSS/Atom payload: ``feed_format`` from the root element, ``title``
    from the channel/feed title (the first ``<title>`` in document
    order), ``text`` = entry titles newline-joined."""
    out = {"feed_format": None, "title": None, "n_items": None,
           "text": None, "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        doc = bytes(data[:_MAX_INPUT]).decode("utf-8", "replace")
        # predictive scan-cost guard (same contract as markup_scan_guard):
        # every unclosed <item>/<entry> makes the lazy block regex scan to
        # EOF, so openers x length bounds the worst case.  Benign feeds are
        # orders of magnitude under; adversarial ones become parse_error.
        low = doc.lower()
        openers = low.count("<item") + low.count("<entry")
        closers = low.count("</item>") + low.count("</entry>")
        if (openers - closers) * len(doc) > 64_000_000:
            out["parse_error"] = "scan-cost budget exceeded (unclosed entries)"
            return out
        head = doc[:4096]
        if _RSS_ROOT.search(head):
            out["feed_format"] = "rss"
        elif _ATOM_ROOT.search(head):
            out["feed_format"] = "atom"
        else:
            out["parse_error"] = "no <rss> or <feed> root element"
            return out
        blocks = _ITEM.finditer(doc)
        titles = []
        n = 0
        for m in blocks:
            n += 1
            if n > max_items:
                break
            t = _title_text(m.group(0))
            if t:
                titles.append(t)
        out["n_items"] = min(n, max_items)
        # the channel/feed title is the first <title> OUTSIDE any entry —
        # which in both formats is the first <title> in document order
        out["title"] = _title_text(doc[: (_ITEM.search(doc).start()
                                          if n else len(doc))])
        out["text"] = "\n".join(titles) or None
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out
