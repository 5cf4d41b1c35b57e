"""WET output: WARC 'conversion' records carrying extracted plain text.

The ecosystem companion to the engine's WARC source: WET files (the
Common Crawl distribution format for extracted text — WARC/1.0 records of
``WARC-Type: conversion`` with a ``text/plain`` block) are what most
LLM-data pipelines actually ingest.  The engine reads archives
(``sources/warc.py``), extracts text (``operators/metadata.py`` /
``boilerplate.py``); this operator serializes the result back out as
spec-shaped WET records — pure codegen string assembly (one projection, no
UDF), written via ``sinks.write_text_lines``.

Record shape (ISO WARC/1.1 §6.8 conversion records, as emitted by the
public wet-extractor tooling):

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: <url>
    WARC-Date: <iso8601>
    WARC-Record-ID: <urn:uuid:...>
    WARC-Refers-To: <source record id>
    Content-Type: text/plain
    Content-Length: <byte length of the text block>
    <blank>
    <text>
    <blank><blank>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wet_record_lines", "write_wet"]

_CRLF = "\r\n"


def wet_record_lines(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    id_col: str = "warc_record_id",
    refers_to_col: str | None = None,
    text_col: str = "text",
    out_col: str = "wet_record",
) -> DataFrame:
    """Append one fully-framed WET conversion record string per row.
    ``Content-Length`` is the UTF-8 OCTET length of the text block (the
    WARC framing contract — multi-byte text must count bytes, not chars).
    Null-text rows yield a zero-length block."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    refers = (
        F.concat(F.lit("WARC-Refers-To: "), F.col(refers_to_col), F.lit(_CRLF))
        if refers_to_col
        else F.lit("")
    )
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF),
        F.lit("WARC-Date: "), F.col(date_col), F.lit(_CRLF),
        F.lit("WARC-Record-ID: "), F.col(id_col), F.lit(_CRLF),
        refers,
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "), F.octet_length(text).cast("string"),
        F.lit(_CRLF + _CRLF),
        text,
        F.lit(_CRLF + _CRLF),
    )
    return captures.withColumn(out_col, rec)


def write_wet(
    captures: DataFrame,
    path: str,
    gzip_output: bool = True,
    mode: str = "overwrite",
    **cols,
) -> None:
    """Serialize + write WET part files (gzip by default, matching the
    distribution convention)."""
    from .sinks import write_text_lines

    lines = wet_record_lines(captures, **cols)
    write_text_lines(lines, "wet_record", path, gzip_output=gzip_output, mode=mode)
