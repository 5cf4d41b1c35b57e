"""PDF/A-1b preflight-lite validation.

Reference analog: ``PDFAnalyser.java:82-122`` — for every
``application/pdf`` payload it runs ``ApachePreflightParser`` (Apache
PDFBox Preflight, ``ApachePreflightParser.java:88-160``) and stores
``pdf_pdfa_is_valid`` (the string ``"true"``/``"false"``) plus the UNIQUE
set of ``"<errorCode> : <details>"`` strings as ``pdf_pdfa_errors``
(``SolrFields.java:96-97``; duplicate occurrences of the same error are
collapsed, their count discarded — ``PDFAnalyser.java:105-118``).

PDFBox Preflight implements the full ISO 19005-1 rule base over a parsed
object graph; that scope is declared out of reach here (COVERAGE.md), so
this tier is an honest PREFLIGHT-LITE: a single bounded pass over the raw
bytes checking the PDF/A-1b rules that are decidable without a full
object-graph build.  Error codes follow Preflight's public category
numbering (1 = syntax, 6 = actions, 7 = metadata) with lite-specific minor
codes — they are NOT claimed to be bit-identical to PDFBox's constants.

Checks (each yields one unique error string, reference-shaped
``"code : details"``):

- ``1.0.1`` missing/malformed ``%PDF-M.N`` header
- ``1.0.2`` missing ``%%EOF`` end-of-file marker
- ``1.1.1`` PDF version above 1.4 (PDF/A-1 is frozen at PDF 1.4)
- ``1.4.1`` trailer has no file ``/ID``
- ``1.4.2`` ``/Encrypt`` dictionary present (encryption forbidden)
- ``1.4.7`` ``/EmbeddedFiles`` present (embedded files forbidden)
- ``6.1.1`` ``/AA`` additional-actions dictionary present
- ``6.2.3`` ``/JavaScript`` / ``/JS`` action present
- ``6.2.4`` ``/Launch`` action present
- ``7.1``   no XMP metadata stream (``<x:xmpmeta``)
- ``7.11``  no PDF/A ``/OutputIntent`` (``/GTS_PDFA1``)

A payload that is not a PDF at all (no header AND no ``%%EOF``) mirrors
Preflight's ``SyntaxValidationException`` path: invalid with the syntax
errors collected so far (``ApachePreflightParser.java:118-127``).

Spark shape: pure-Python kernel over bytes → ONE Arrow-batched struct UDF
(``preflight_udf``); no per-row Python, no object-graph allocation.
"""

from __future__ import annotations

import re

import pandas as pd

__all__ = ["preflight_validate", "preflight_udf", "PREFLIGHT_STRUCT"]

_HEADER = re.compile(rb"^%PDF-(\d+)\.(\d+)")
_NAME = {
    "encrypt": re.compile(rb"/Encrypt(?![A-Za-z])"),
    "embedded": re.compile(rb"/EmbeddedFiles(?![A-Za-z])"),
    "aa": re.compile(rb"/AA(?![A-Za-z])"),
    "js": re.compile(rb"/(?:JavaScript|JS)(?![A-Za-z])"),
    "launch": re.compile(rb"/Launch(?![A-Za-z])"),
}


def preflight_validate(data: bytes | None) -> tuple[str, list[str]]:
    """(is_valid, sorted unique errors) for one PDF payload.

    ``is_valid`` is the string ``"true"``/``"false"`` exactly as the
    reference stores it (``PDFAnalyser.java:97-99`` copies Preflight's
    boolean metadata string into the Solr field verbatim)."""
    errors: set[str] = set()
    data = data or b""
    m = _HEADER.match(data)
    if m is None:
        errors.add("1.0.1 : Missing or malformed %PDF-M.N file header")
    else:
        major, minor = int(m.group(1)), int(m.group(2))
        if (major, minor) > (1, 4):
            errors.add(
                "1.1.1 : PDF/A-1 requires PDF version 1.4 or earlier, "
                f"found {major}.{minor}"
            )
    if b"%%EOF" not in data[-1024:]:
        errors.add("1.0.2 : Missing end-of-file marker %%EOF")
    if not re.search(rb"/ID(?![A-Za-z])", data):
        errors.add("1.4.1 : Trailer dictionary has no file /ID")
    if _NAME["encrypt"].search(data):
        errors.add("1.4.2 : Encryption dictionary is forbidden in PDF/A-1")
    if _NAME["embedded"].search(data):
        errors.add("1.4.7 : Embedded files are forbidden in PDF/A-1")
    if _NAME["aa"].search(data):
        errors.add("6.1.1 : Additional-actions dictionary is forbidden "
                   "in PDF/A-1")
    if _NAME["js"].search(data):
        errors.add("6.2.3 : JavaScript actions are forbidden in PDF/A-1")
    if _NAME["launch"].search(data):
        errors.add("6.2.4 : Launch actions are forbidden in PDF/A-1")
    if b"<x:xmpmeta" not in data:
        errors.add("7.1 : Document has no XMP metadata stream")
    if b"/GTS_PDFA1" not in data:
        errors.add("7.11 : PDF/A OutputIntent is missing")
    valid = "true" if not errors else "false"
    return valid, sorted(errors)


def PREFLIGHT_STRUCT():
    from pyspark.sql.types import (ArrayType, StringType, StructField,
                                   StructType)

    return StructType([
        StructField("pdf_pdfa_is_valid", StringType()),
        StructField("pdf_pdfa_errors", ArrayType(StringType())),
    ])


def preflight_udf():
    """Arrow-batched ``binary → struct`` UDF over the kernel."""
    from pyspark.sql import functions as F

    @F.pandas_udf(PREFLIGHT_STRUCT())
    def kernel(payloads: pd.Series) -> pd.DataFrame:
        # A null payload means the analyser was never dispatched for this
        # record (the reference's shouldProcess MIME gate —
        # PDFAnalyser.java:70-77) — both fields stay NULL, unlike an empty
        # PDF which is a real validation failure.
        rows = [
            preflight_validate(p) if p is not None else (None, None)
            for p in payloads
        ]
        return pd.DataFrame(
            rows, columns=["pdf_pdfa_is_valid", "pdf_pdfa_errors"]
        )

    return kernel
