"""Bounded HTML metadata + text extraction ("Tika-lite").

Covers the common fields the reference gets from Tika / the HTML parser:
title, meta description/keywords/author/generator, content encoding
(charset), first paragraph, and the extracted text —
``TikaPayloadAnalyser.java:165-414`` (field mapping, 512 KiB text cap via
``SolrRecordFactory``), ``HtmlFeatureParser.java:252-263``
(FIRST_PARAGRAPH), ``HTMLAnalyser.java:121-127`` (parse timeout
discipline).

Spark shape: ONE Arrow struct UDF per batch (same idiom as
``operators/links.py``) — a linear bounded regex pass, no DOM build.  The
reference's 30 s/300 s ``TimeLimiter`` guards a DOM parser that can blow up
super-linearly; here the same contract (no record can stall the job) is
enforced three ways: the ``max_chars`` input bound, the predictive
``markup_scan_guard`` (rejects inputs engineered to make the lazy-pair
regexes quadratic — see ``functions/markup.py``), and a per-record
wall-clock :class:`Deadline` checked between passes; all three surface as a
``parse_error`` row via per-record exception recovery.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.markup import PARSE_TIMEOUT_S, Deadline, markup_scan_guard

__all__ = ["extract_html_metadata", "extract_document_metadata",
           "preflight_pdfa",
           "METADATA_STRUCT", "DOCFORMAT_STRUCT", "TEXT_CAP"]

TEXT_CAP = 512 * 1024  # SolrRecordFactory.DEFAULT_CONTENT_MAX_LENGTH

_COMMENTS = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_TITLE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.S | re.I)
_META = re.compile(r"<meta\b[^>]*>", re.I | re.S)
_ATTR = re.compile(
    r"""([a-zA-Z-]+)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.S
)
_P = re.compile(r"<p\b[^>]*>(.*?)(?:</p\s*>|<p\b)", re.S | re.I)
_TAG = re.compile(r"<[^>]+>")
_CHARSET_IN_CT = re.compile(r"charset=([A-Za-z0-9_\-]+)", re.I)
_WS = re.compile(r"\s+")

METADATA_STRUCT = StructType(
    [
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("keywords", ArrayType(StringType())),
        StructField("author", StringType()),
        StructField("generator", StringType()),
        StructField("content_encoding", StringType()),
        StructField("first_paragraph", StringType()),
        StructField("text", StringType()),
        StructField("content_text_length", IntegerType()),
        StructField("parse_error", StringType()),
    ]
)


def _clean_text(fragment: str) -> str:
    return _WS.sub(" ", html_mod.unescape(_TAG.sub(" ", fragment))).strip()


def _meta_attrs(tag: str) -> dict[str, str]:
    return {
        m.group(1).lower(): next(g for g in m.groups()[1:] if g is not None)
        for m in _ATTR.finditer(tag)
    }


def _extract_one(html: str, max_chars: int, deadline: Deadline) -> dict:
    out = {f.name: None for f in METADATA_STRUCT.fields}
    bounded = html[:max_chars]
    markup_scan_guard(bounded)  # predictive bound on every regex pass below
    cleaned = _SCRIPT_STYLE.sub(" ", _COMMENTS.sub(" ", bounded))
    deadline.check()

    m = _TITLE.search(cleaned)
    if m:
        out["title"] = _clean_text(m.group(1)) or None

    for tag in _META.finditer(cleaned):
        attrs = _meta_attrs(tag.group(0))
        name = attrs.get("name", "").lower()
        content = attrs.get("content")
        if name == "description" and content:
            out["description"] = _clean_text(content)
        elif name == "keywords" and content:
            out["keywords"] = [k.strip() for k in content.split(",") if k.strip()]
        elif name == "author" and content:
            out["author"] = _clean_text(content)
        elif name == "generator" and content:
            out["generator"] = _clean_text(content)
        if "charset" in attrs and out["content_encoding"] is None:
            out["content_encoding"] = attrs["charset"].lower()
        elif (
            attrs.get("http-equiv", "").lower() == "content-type"
            and content and out["content_encoding"] is None
        ):
            cm = _CHARSET_IN_CT.search(content)
            if cm:
                out["content_encoding"] = cm.group(1).lower()

    deadline.check()
    # first paragraph with non-empty text (HtmlFeatureParser.java:252-263)
    for pm in _P.finditer(cleaned):
        pt = _clean_text(pm.group(1))
        if pt:
            out["first_paragraph"] = pt
            break

    deadline.check()
    body = re.sub(r"<head\b.*?</head\s*>", " ", cleaned, flags=re.S | re.I)
    text = _clean_text(body)[:TEXT_CAP]
    out["text"] = text
    out["content_text_length"] = len(text)
    return out


def extract_html_metadata(
    df: DataFrame,
    html_col: str = "payload",
    max_chars: int = TEXT_CAP * 2,
    timeout_s: float = PARSE_TIMEOUT_S,
) -> DataFrame:
    """Append title/description/keywords/author/generator/content_encoding/
    first_paragraph/text/content_text_length — one Arrow pass, no shuffle;
    per-record failures — including pathological markup refused by the
    scan-cost guard and parse-deadline expiry — land in ``parse_error``
    instead of failing or stalling the task (the reference's
    ``addParseException`` + 30 s parser-timeout discipline)."""

    @F.pandas_udf(METADATA_STRUCT)
    def kernel(htmls: pd.Series) -> pd.DataFrame:
        rows = []
        for h in htmls:
            if h is None:
                rows.append({f.name: None for f in METADATA_STRUCT.fields})
                continue
            try:
                rows.append(_extract_one(h, max_chars, Deadline(timeout_s)))
            except Exception as exc:  # per-record recovery
                rec = {f.name: None for f in METADATA_STRUCT.fields}
                rec["parse_error"] = f"{type(exc).__name__}: {exc}"[:500]
                rows.append(rec)
        return pd.DataFrame(rows, columns=[f.name for f in METADATA_STRUCT.fields])

    out = df.withColumn("_meta", kernel(F.col(html_col)))
    for f in METADATA_STRUCT.fields:
        name = "meta_parse_error" if f.name == "parse_error" else f.name
        out = out.withColumn(name, F.col(f"_meta.{f.name}"))
    return out.drop("_meta")


@F.pandas_udf(StringType())
def _xml_root_ns_kernel(payloads: pd.Series) -> pd.Series:
    """Root-element namespace of an XML payload as ``<ns-uri>#<localname>``,
    both lowercased; null when the root carries no namespace or the document
    is unparseable (``XMLRootNamespaceParser.java:80-89`` via Tika's
    XmlRootExtractor).  Because the element inspected is the root, its
    namespace can only be declared on itself — a first-start-event parse is
    exact, not an approximation."""
    import io
    import xml.etree.ElementTree as ET

    out = []
    for p in payloads:
        ns = None
        if p:
            try:
                for _, el in ET.iterparse(io.BytesIO(p.encode("utf-8", "replace")),
                                          events=("start",)):
                    tag = el.tag
                    if isinstance(tag, str) and tag.startswith("{"):
                        uri, local = tag[1:].split("}", 1)
                        if uri.strip():
                            ns = uri.lower() + "#" + local.lower()
                    break
            except Exception:
                ns = None
        out.append(ns)
    return pd.Series(out, dtype=object)


def extract_xml_root_ns(
    df: DataFrame,
    payload_col: str = "payload",
    mime_col: str = "content_type",
    out_col: str = "xml_root_ns",
) -> DataFrame:
    """Fill ``xml_root_ns`` for XML records only
    (``XMLAnalyser.shouldProcess``: application/xml | text/xml).  The mime
    gate nulls the kernel INPUT (a UDF inside ``when()`` would still run on
    every row), so non-XML rows cost one null check in the batch loop, not a
    parse."""
    is_xml = (F.col(mime_col).startswith("application/xml")
              | F.col(mime_col).startswith("text/xml"))
    return df.withColumn(
        out_col,
        _xml_root_ns_kernel(F.when(is_xml, F.col(payload_col))),
    )


# ---------------------------------------------------------------------------
# Deep-format document extraction (the Tika tier: PDF / DOCX / JPEG EXIF)
# ---------------------------------------------------------------------------

DOCFORMAT_STRUCT = StructType(
    [
        StructField("doc_format", StringType()),
        StructField("doc_text", StringType()),
        StructField("doc_text_length", IntegerType()),
        StructField("doc_pages", IntegerType()),
        StructField("doc_paragraphs", IntegerType()),
        StructField("doc_title", StringType()),
        StructField("doc_author", StringType()),
        StructField("doc_producer", StringType()),
        StructField("exif_make", StringType()),
        StructField("exif_model", StringType()),
        StructField("exif_software", StringType()),
        StructField("exif_datetime", StringType()),
        StructField("exif_datetime_original", StringType()),
        StructField("exif_orientation", IntegerType()),
        StructField("parse_error", StringType()),
    ]
)

_DOC_COLS = [f.name for f in DOCFORMAT_STRUCT.fields]


def _docformat_one(payload, mime: str | None) -> dict:
    from ..functions import docformats as DF
    from ..functions import officeformats as OF

    rec: dict = {c: None for c in _DOC_COLS}
    m = (mime or "").lower()
    if m.startswith("application/pdf"):
        r = DF.pdf_extract(payload)
        rec.update(doc_format="pdf", doc_text=r["text"], doc_pages=r["n_pages"],
                   doc_title=r["title"], doc_author=r["author"],
                   doc_producer=r["producer"], parse_error=r["parse_error"])
    elif "officedocument.spreadsheetml" in m:
        r = OF.xlsx_extract(payload)
        rec.update(doc_format="xlsx", doc_text=r["text"],
                   doc_pages=r["n_sheets"], doc_paragraphs=r["n_cells"],
                   doc_title=r["title"], doc_author=r["author"],
                   parse_error=r["parse_error"])
    elif "officedocument.presentationml" in m:
        r = OF.pptx_extract(payload)
        rec.update(doc_format="pptx", doc_text=r["text"],
                   doc_pages=r["n_slides"], doc_title=r["title"],
                   doc_author=r["author"], parse_error=r["parse_error"])
    elif "officedocument.wordprocessingml" in m or m.startswith(
            "application/vnd.openxmlformats"):
        r = DF.docx_extract(payload)
        rec.update(doc_format="docx", doc_text=r["text"],
                   doc_paragraphs=r["n_paragraphs"], doc_title=r["title"],
                   doc_author=r["author"], parse_error=r["parse_error"])
    elif m.startswith("application/vnd.oasis.opendocument.text"):
        r = OF.odt_extract(payload)
        rec.update(doc_format="odt", doc_text=r["text"],
                   doc_paragraphs=r["n_paragraphs"], doc_title=r["title"],
                   doc_author=r["author"], parse_error=r["parse_error"])
    elif m.startswith(("application/rtf", "text/rtf")):
        r = OF.rtf_extract(payload)
        rec.update(doc_format="rtf", doc_text=r["text"],
                   doc_paragraphs=r["n_paragraphs"], doc_title=r["title"],
                   doc_author=r["author"], parse_error=r["parse_error"])
    elif m.startswith(("application/rss+xml", "application/atom+xml")):
        from ..functions.feeds import feed_extract

        r = feed_extract(payload)
        rec.update(doc_format=r["feed_format"] or "feed",
                   doc_text=r["text"], doc_pages=r["n_items"],
                   doc_title=r["title"], parse_error=r["parse_error"])
    elif m.startswith("application/epub"):
        r = OF.epub_extract(payload)
        rec.update(doc_format="epub", doc_text=r["text"],
                   doc_pages=r["n_spine"], doc_title=r["title"],
                   doc_author=r["author"], doc_producer=r["language"],
                   parse_error=r["parse_error"])
    elif m.startswith(("application/msword", "application/vnd.ms-excel",
                       "application/vnd.ms-powerpoint",
                       "application/x-ole-storage",
                       "application/x-tika-msoffice")):
        from ..functions.docbinary import (
            doc_text_from_streams, ppt_text, xls_text)
        from ..functions.ole2 import ole2_extract

        r = ole2_extract(payload, content_for=(
            "WordDocument", "0Table", "1Table", "Workbook", "Book",
            "PowerPoint Document"))
        sb = r.get("stream_bytes") or {}
        # real content when the container holds a parseable Word/Excel/
        # PowerPoint document; stream listing otherwise (honest degrade)
        text = doc_text_from_streams(sb)
        if text is None and "Workbook" in sb:
            text = xls_text(sb["Workbook"])
        if text is None and "Book" in sb:
            text = xls_text(sb["Book"])
        if text is None and "PowerPoint Document" in sb:
            text = ppt_text(sb["PowerPoint Document"])
        if text is None:
            text = "\n".join(r["streams"] or []) or None
        rec.update(doc_format="ole2", doc_text=text,
                   doc_paragraphs=r["n_streams"], doc_title=r["title"],
                   doc_author=r["author"], doc_producer=r["app_name"],
                   parse_error=r["parse_error"])
    elif m.startswith(("application/zip", "application/x-zip")):
        r = OF.zip_extract(payload)
        rec.update(doc_format="zip", doc_text=r["text"],
                   doc_paragraphs=r["n_entries"],
                   parse_error=r["parse_error"])
    elif m.startswith("image/jpeg") or m.startswith("image/jpg"):
        r = DF.exif_extract(payload)
        rec.update(doc_format="jpeg_exif", exif_make=r["make"],
                   exif_model=r["model"], exif_software=r["software"],
                   exif_datetime=r["datetime"],
                   exif_datetime_original=r["datetime_original"],
                   exif_orientation=r["orientation"],
                   parse_error=r["parse_error"])
    else:
        rec["doc_format"] = "unsupported"
    if rec.get("doc_text") is not None:
        rec["doc_text_length"] = len(rec["doc_text"])
    return rec


def extract_document_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    mime_col: str = "content_type",
) -> DataFrame:
    """Deep-format extraction for the formats the reference routes through
    Tika (``TikaPayloadAnalyser.java:165-414``): real minimal parsers for
    PDF text/info, DOCX/XLSX/PPTX/ODT/RTF text + core properties, ZIP
    entry listings, and JPEG EXIF — pure-stdlib kernels
    (``functions/docformats.py``, ``functions/officeformats.py``),
    MIME-dispatched inside ONE Arrow struct UDF (one Python stage, no
    shuffle, no per-format pass).
    Unhandled MIME types get ``doc_format='unsupported'`` with every field
    null; per-record failures land in ``doc_parse_error`` (the
    ``addParseException`` recovery contract)."""

    @F.pandas_udf(DOCFORMAT_STRUCT)
    def kernel(payloads: pd.Series, mimes: pd.Series) -> pd.DataFrame:
        rows = []
        for p, m in zip(payloads, mimes):
            try:
                rows.append(_docformat_one(p, m))
            except Exception as exc:  # per-record recovery
                rec = {c: None for c in _DOC_COLS}
                rec["parse_error"] = f"{type(exc).__name__}: {exc}"[:500]
                rows.append(rec)
        return pd.DataFrame(rows, columns=_DOC_COLS)

    out = df.withColumn("_doc", kernel(F.col(payload_col), F.col(mime_col)))
    for c in _DOC_COLS:
        name = "doc_parse_error" if c == "parse_error" else c
        out = out.withColumn(name, F.col(f"_doc.{c}"))
    return out.drop("_doc")


# ---------------------------------------------------------------------------
# schema.org structured data (JSON-LD + microdata) from HTML
# ---------------------------------------------------------------------------

_LDJSON = re.compile(
    r'<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)'
    r"</script>", re.S | re.I)
_ITEMTYPE = re.compile(r'\bitemtype\s*=\s*["\']([^"\']+)["\']', re.I)


def _structured_data_one(html: str) -> dict:
    """JSON-LD ``@type`` values (nested objects walked; per-block errors
    tolerated) and microdata ``itemtype`` URL leaf names, each
    deduplicated + sorted + ``;``-joined."""
    import json as _json

    ld_types: set[str] = set()
    n_blocks = 0
    n_bad = 0
    for m in _LDJSON.finditer(html):
        n_blocks += 1

        def walk(node) -> None:
            if isinstance(node, dict):
                t = node.get("@type")
                if isinstance(t, str):
                    ld_types.add(t)
                elif isinstance(t, list):
                    ld_types.update(x for x in t if isinstance(x, str))
                for v in node.values():
                    walk(v)
            elif isinstance(node, list):
                for v in node:
                    walk(v)

        try:
            walk(_json.loads(m.group(1)))
        except Exception:
            n_bad += 1
    micro = {u.rstrip("/").rsplit("/", 1)[-1]
             for u in _ITEMTYPE.findall(html)}
    return {
        "ld_types": ";".join(sorted(ld_types)) or None,
        "n_ld_blocks": n_blocks,
        "n_ld_errors": n_bad,
        "microdata_types": ";".join(sorted(micro)) or None,
    }


def extract_structured_data(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """schema.org structured data out of HTML payloads: JSON-LD
    ``<script type="application/ld+json">`` blocks (every nested
    ``@type``, malformed blocks counted not fatal) and microdata
    ``itemtype`` leaf names — the entity layer a search/analytics index
    builds facets on.  ONE Arrow-batched struct kernel, same shape as the
    other analysers; reference scope: the HTML analyser's element surface
    (``HTMLAnalyser.java``) — structured data is the training-pipeline
    addition."""
    from pyspark.sql.types import IntegerType

    struct = StructType([
        StructField("ld_types", StringType()),
        StructField("n_ld_blocks", IntegerType()),
        StructField("n_ld_errors", IntegerType()),
        StructField("microdata_types", StringType()),
    ])

    @F.pandas_udf(struct)
    def kernel(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            try:
                html = (bytes(p)[: 8 << 20].decode("utf-8", "replace")
                        if p is not None else "")
                rows.append(_structured_data_one(html))
            except Exception:
                rows.append({"ld_types": None, "n_ld_blocks": None,
                             "n_ld_errors": None, "microdata_types": None})
        return pd.DataFrame(
            rows, columns=["ld_types", "n_ld_blocks", "n_ld_errors",
                           "microdata_types"])

    out = df.withColumn("_sd", kernel(F.col(payload_col)))
    for c in ("ld_types", "n_ld_blocks", "n_ld_errors", "microdata_types"):
        out = out.withColumn(c, F.col(f"_sd.{c}"))
    return out.drop("_sd")


def preflight_pdfa(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """PDF/A-1b preflight-lite over raw PDF payloads: adds the reference's
    two Solr fields — ``pdf_pdfa_is_valid`` (string ``"true"``/``"false"``)
    and ``pdf_pdfa_errors`` (unique, sorted ``"code : details"`` strings) —
    ``PDFAnalyser.java:82-122`` / ``SolrFields.java:96-97``.  ONE
    Arrow-batched struct UDF (``functions/preflight.py``), no per-row
    Python; the reference's 30 s ``TimeLimiter`` guard is unnecessary here
    because the kernel is a bounded linear scan."""
    from ..functions.preflight import preflight_udf

    kernel = preflight_udf()
    out = df.withColumn("_pf", kernel(F.col(payload_col)))
    return (
        out.withColumn("pdf_pdfa_is_valid", F.col("_pf.pdf_pdfa_is_valid"))
        .withColumn("pdf_pdfa_errors", F.col("_pf.pdf_pdfa_errors"))
        .drop("_pf")
    )
