"""HTML link / feature extraction over payload columns.

Spark re-expression of the reference's most-used payload analyser:
``warc-indexer/src/main/java/uk/bl/wa/parsers/HtmlFeatureParser.java:154-299``
(a[href] links, img src/srcset + picture source srcset + HTML-4 background
image links) combined with the field fan-out of
``warc-indexer/src/main/java/uk/bl/wa/analyser/payload/HTMLAnalyser.java:110-217``
(links, links_images, links_hosts, links_hosts_surts, links_domains,
links_public_suffixes).  Conformance counts ported from
``HTMLAnalyserTest.java:60-124`` into ``tests/test_links.py``.

Design notes (Spark-first, not a jsoup port):

- ONE vectorized Arrow UDF per row batch computes every output field —
  a single ``ArrowEvalPython`` node in the plan, embarrassingly parallel,
  no shuffle.  The parse is a bounded regex pass (comments/script/style
  stripped first), not a DOM build: tolerant of broken markup, linear in
  payload size, and orders of magnitude cheaper than a full parser at
  100 TB.  Known divergence from jsoup: pathological JavaScript containing
  literal ``<a href=`` inside string constants may yield extra links.
- Link values follow the reference default ``links.normalise = false``
  (``HtmlFeatureParser.DEFAULT_LINKS_NORMALISE``): raw absolute URLs after
  base resolution.  Hosts ARE canonicalised (``WARCIndexer.CANONICALISE_HOST
  = true`` path in ``HTMLAnalyser.java:170-181``).
- The reference emits unordered ``Set`` values; we emit SORTED arrays so
  results are parallelism-independent (determinism rule of this engine).
- Empty / unresolvable references are dropped, matching Solr's discard of
  empty field values; an empty ``href=""`` resolves to the base URL itself
  (jsoup ``abs:href`` behavior).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..functions import normalisation as N
from ..functions import surt as S
from ..functions.markup import PARSE_TIMEOUT_S, Deadline, markup_scan_guard

__all__ = ["extract_html_links", "outlink_edges", "LINKS_STRUCT", "LINKS_MAX_CHARS"]

#: input bound per record — the reference analyses at most ~1 MB payloads
#: (reference.conf:46-55 image cap / payload cache tiers); beyond this the
#: tail is ignored rather than parsed
LINKS_MAX_CHARS = 1 << 20

_COMMENTS = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_ATTR = r"""\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))"""
_A_HREF = re.compile(r"<a\b[^>]*?\bhref" + _ATTR, re.I | re.S)
_IMG_SRC = re.compile(r"<img\b[^>]*?\bsrc" + _ATTR, re.I | re.S)
_IMG_SRCSET = re.compile(r"<(?:img|source)\b[^>]*?\bsrcset" + _ATTR, re.I | re.S)
_BACKGROUND = re.compile(r"<(?:body|table|td)\b[^>]*?\bbackground" + _ATTR, re.I | re.S)
# HtmlFeatureParser.java:213-236 distinct elements; tag-name grammar per the
# reference's ELEMENT_NAME = [a-zA-Z0-9]+ (open tags only — a regex pass sees
# exactly what was written, so jsoup's implicit html/head/body do not appear)
_TAG = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)")
_LINK_OR_META = re.compile(r"<(link|meta)\b([^>]*)>", re.I | re.S)
_REL_ATTR = re.compile(r"\brel" + _ATTR, re.I | re.S)
_NAME_ATTR = re.compile(r"\bname" + _ATTR, re.I | re.S)
_HREF_ATTR = re.compile(r"\bhref" + _ATTR, re.I | re.S)
# license links per HtmlFeatureParser.java:238-249 (a/link/area[rel=license])
_LICENSE_EL = re.compile(r"<(?:a|link|area)\b[^>]*?\brel" + _ATTR + r"[^>]*>", re.I | re.S)

LINKS_STRUCT = StructType(
    [
        StructField("links", ArrayType(StringType())),
        StructField("links_images", ArrayType(StringType())),
        StructField("links_hosts", ArrayType(StringType())),
        StructField("links_hosts_surts", ArrayType(StringType())),
        StructField("links_domains", ArrayType(StringType())),
        StructField("links_public_suffixes", ArrayType(StringType())),
        StructField("elements_used", ArrayType(StringType())),
        StructField("license_url", ArrayType(StringType())),
        # non-null when the record was refused (pathological markup / parse
        # deadline / unexpected parse failure) — the analog of the
        # reference's parse-timeout + addParseException discipline
        # (HTMLAnalyser.java:121-127): the row survives, the task never stalls
        StructField("links_parse_error", StringType()),
    ]
)

_ARRAY_FIELDS = [f.name for f in LINKS_STRUCT.fields if f.name != "links_parse_error"]


def _attr_values(pattern: re.Pattern, html: str) -> list[str]:
    return [next(g for g in m.groups() if g is not None) for m in pattern.finditer(html)]


def _srcset_urls(srcset: str) -> list[str]:
    """First token of each comma-separated srcset entry
    (``HtmlFeatureParser.normaliseSrcsetLinks``)."""
    out = []
    for entry in srcset.split(","):
        entry = entry.strip()
        if entry:
            out.append(entry.split()[0])
    return out


def _first_attr(pattern: re.Pattern, tag: str) -> str | None:
    m = pattern.search(tag)
    if m is None:
        return None
    return next(g for g in m.groups() if g is not None)


@lru_cache(maxsize=65536)
def _host_suffixes(h: str) -> tuple[str | None, str | None]:
    """(private, public) suffix of a host — one memoized entry per host:
    link hosts are heavy-tailed across a batch, and the PSL longest-match
    walk would otherwise run twice per link occurrence."""
    return S.extract_private_suffix(h), S.extract_public_suffix(h)


def _resolve(base: str, ref: str) -> str | None:
    try:
        resolved = urljoin(base, ref)
    except Exception:
        return None
    return resolved or None


def _extract_one(base_url: str, html: str, normalise_links: bool,
                 deadline: Deadline) -> dict:
    markup_scan_guard(html)  # predictive bound on every regex pass below
    cleaned = _SCRIPT_STYLE.sub(" ", _COMMENTS.sub(" ", html))
    deadline.check()
    links: set[str] = set()
    for href in _attr_values(_A_HREF, cleaned):
        r = _resolve(base_url, href)
        if r:
            if normalise_links:
                try:
                    r = N.canonicalise_url(r)
                except Exception:
                    continue
            links.add(r)
    images: set[str] = set()
    raw_imgs = _attr_values(_IMG_SRC, cleaned) + _attr_values(_BACKGROUND, cleaned)
    for srcset in _attr_values(_IMG_SRCSET, cleaned):
        raw_imgs.extend(_srcset_urls(srcset))
    for src in raw_imgs:
        r = _resolve(base_url, src)
        if r:
            if normalise_links:
                try:
                    r = N.canonicalise_url(r)
                except Exception:
                    continue
            images.add(r)
    deadline.check()

    hosts: set[str] = set()
    domains: set[str] = set()
    suffixes: set[str] = set()
    for link in links:
        h = S.extract_host(link)
        if h == S.MALFORMED_HOST:
            continue
        try:
            hosts.add(N.canonicalise_host(h))
        except Exception:
            hosts.add(h)
        d, p = _host_suffixes(h)
        if d:
            domains.add(d)
        if p:
            suffixes.add(p)
    host_surts: set[str] = set()
    for h in hosts:
        host_surts.update(S.host_surts(h))

    # distinct elements (HtmlFeatureParser.java:213-236): tag names from a
    # scan with comments + script/style BODIES removed but their open tags
    # kept (jsoup keeps script/style elements in the DOM; its tokenizer's
    # JS false positives — the reason for the reference's ELEMENT_NAME
    # filter — are avoided rather than reproduced), lowercased, left-100;
    # plus link/@rel= and meta/@name= attribute entries (empty value when
    # the attribute is absent, matching jsoup attr()'s empty-string return)
    deadline.check()
    tag_scan = _SCRIPT_STYLE.sub(
        lambda m: m.group(0).split(">", 1)[0] + ">", _COMMENTS.sub(" ", html)
    )
    deadline.check()
    elements: set[str] = {m.group(1).lower()[:100] for m in _TAG.finditer(tag_scan)}
    for m in _LINK_OR_META.finditer(tag_scan):
        kind, attrs = m.group(1).lower(), m.group(2)
        if kind == "link":
            elements.add("link/@rel=" + (_first_attr(_REL_ATTR, attrs) or "").lower())
        else:
            elements.add("meta/@name=" + (_first_attr(_NAME_ATTR, attrs) or "").lower())

    # license links (HtmlFeatureParser.java:238-249): raw unresolved hrefs of
    # a/link/area[rel=license], document order, duplicates preserved
    licenses: list[str] = []
    for m in _LICENSE_EL.finditer(cleaned):
        rel = next(g for g in m.groups() if g is not None)
        if rel.strip().lower() == "license":
            href = _first_attr(_HREF_ATTR, m.group(0))
            if href:
                licenses.append(href)

    return {
        "links": sorted(links),
        "links_images": sorted(images),
        "links_hosts": sorted(hosts),
        "links_hosts_surts": sorted(host_surts),
        "links_domains": sorted(domains),
        "links_public_suffixes": sorted(suffixes),
        "elements_used": sorted(elements),
        "license_url": licenses,
        "links_parse_error": None,
    }


def extract_html_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "payload",
    normalise_links: bool = False,
    max_chars: int = LINKS_MAX_CHARS,
    timeout_s: float = PARSE_TIMEOUT_S,
) -> DataFrame:
    """Append the six multi-valued link fields to ``df`` — one Arrow batch
    pass, no shuffle; see module docstring for semantics and divergences.
    Per-record failure recovery: pathological markup (scan-cost guard),
    deadline expiry, or any parse exception yields empty fields plus a
    ``links_parse_error`` message — one bad record never stalls or fails
    the task (the reference's 30 s parser-timeout contract)."""

    @F.pandas_udf(LINKS_STRUCT)
    def kernel(urls: pd.Series, htmls: pd.Series) -> pd.DataFrame:
        rows = []
        for u, h in zip(urls, htmls):
            if h is None:
                rows.append({**{n: [] for n in _ARRAY_FIELDS}, "links_parse_error": None})
                continue
            try:
                rows.append(
                    _extract_one(u or "", h[:max_chars], normalise_links,
                                 Deadline(timeout_s))
                )
            except Exception as exc:  # per-record recovery
                rows.append({
                    **{n: [] for n in _ARRAY_FIELDS},
                    "links_parse_error": f"{type(exc).__name__}: {exc}"[:500],
                })
        return pd.DataFrame(rows, columns=[f.name for f in LINKS_STRUCT.fields])

    out = df.withColumn("_links", kernel(F.col(url_col), F.col(html_col)))
    for f in LINKS_STRUCT.fields:
        out = out.withColumn(f.name, F.col(f"_links.{f.name}"))
    return out.drop("_links")


def outlink_edges(
    df: DataFrame, url_col: str = "url", html_col: str = "payload"
) -> DataFrame:
    """``(src_url, dst_url)`` edge list derived from page payloads — the
    shape ``plans.crawl.run_crawl`` takes as its ``link_graph`` input, so a
    crawl can expand its frontier from fetched HTML instead of a pre-built
    graph (the reference derives its link graph the same way:
    ``OutlinkExtractorMapper.java:57-87`` over ``HtmlFeatureParser`` output)."""
    ex = extract_html_links(df, url_col, html_col)
    return ex.select(
        F.col(url_col).alias("src_url"), F.explode("links").alias("dst_url")
    )
