"""MIME / content-type normalization as JVM-side column expressions.

Reference: ``WARCPayloadAnalysers.java:131-231`` — the served/Tika content
type is reduced to a coarse ``content_type_norm`` class (image, audio, video,
html, pdf, word, excel, powerpoint, text, xml, js, other) used for faceting
and, in our engine, the content-type-affinity term of crawl priority.
A ``when``-ladder keeps the whole mapping inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["content_type_norm", "content_affinity", "parse_extension"]

_LADDER: list[tuple[str, str]] = [
    (r"^image", "image"),
    (r"^(audio|application/ogg$)", "audio"),
    (r"^video", "video"),
    (r"(^text/html|^application/xhtml)", "html"),
    (r"^application/pdf", "pdf"),
    (r"(^application/msword|officedocument\.wordprocessingml|^application/rtf)", "word"),
    (r"(^application/vnd\.ms-excel|officedocument\.spreadsheetml)", "excel"),
    (r"(^application/vnd\.ms-powerpoint|officedocument\.presentationml)", "powerpoint"),
    (r"(^text/xml|^application/xml|\+xml$)", "xml"),
    (r"(javascript|^application/json)", "js"),
    (r"^text", "text"),
]


def content_type_norm(ct: Column) -> Column:
    """Coarse content class from a MIME string (when-ladder, codegen-friendly)."""
    lowered = F.lower(F.coalesce(ct, F.lit("")))
    expr = F.lit("other")
    for pattern, label in reversed(_LADDER):
        expr = F.when(lowered.rlike(pattern), F.lit(label)).otherwise(expr)
    return expr


def content_affinity(ct_norm: Column, preferred: dict[str, float] | None = None) -> Column:
    """Content-type affinity term of the crawl priority (north rule): the
    crawl cares most about image+caption pages."""
    prefs = preferred or {"image": 0.5, "html": 0.25, "text": 0.1}
    expr = F.lit(0.0)
    for label, score in prefs.items():
        expr = F.when(ct_norm == label, F.lit(score)).otherwise(expr)
    return expr


def parse_extension(url_path: Column) -> Column:
    """File extension of the resource name, lower-cased; null when none
    (``WARCIndexer.parseExtension``, ``WARCIndexer.java:748-773``)."""
    name = F.element_at(F.split(url_path, "/"), -1)
    ext = F.when(
        name.contains(".") & ~name.endswith("."),
        F.lower(F.element_at(F.split(name, r"\."), -1)),
    )
    return F.when(ext.rlike("^[a-z0-9]{1,8}$"), ext)
