"""PDF/A preflight-lite: per-rule goldens, the reference's field contract
(string validity flag + unique sorted error set), and the Spark shape."""

from pyspark.sql import functions as F

from webarchive_discovery_spark.functions.preflight import preflight_validate
from webarchive_discovery_spark.operators.metadata import preflight_pdfa


def _pdf(header=b"%PDF-1.4", meta=True, intent=True, extra=b"", eof=True):
    xmp = (
        b"2 0 obj << /Type /Metadata /Subtype /XML >> stream\n"
        b'<x:xmpmeta xmlns:x="adobe:ns:meta/"></x:xmpmeta>\n'
        b"endstream endobj\n"
        if meta else b""
    )
    oi = (b"/OutputIntents [ << /Type /OutputIntent /S /GTS_PDFA1 >> ] "
          if intent else b"")
    return (header + b"\n1 0 obj << /Type /Catalog /Metadata 2 0 R " + oi
            + b">> endobj\n" + xmp
            + b"trailer << /Root 1 0 R /ID [<41><41>] " + extra + b">>\n"
            + (b"%%EOF\n" if eof else b""))


def test_valid_pdfa_lite():
    assert preflight_validate(_pdf()) == ("true", [])


def test_version_above_14():
    valid, errs = preflight_validate(_pdf(header=b"%PDF-1.7"))
    assert valid == "false"
    assert errs == ["1.1.1 : PDF/A-1 requires PDF version 1.4 or earlier, "
                    "found 1.7"]


def test_forbidden_dictionaries():
    for extra, code in [
        (b"/Encrypt 9 0 R ", "1.4.2"),
        (b"/Names << /EmbeddedFiles 7 0 R >> ", "1.4.7"),
        (b"/AA << /O 8 0 R >> ", "6.1.1"),
        (b"/OpenAction << /S /JavaScript /JS (app.alert(1)) >> ", "6.2.3"),
        (b"/OpenAction << /S /Launch >> ", "6.2.4"),
    ]:
        valid, errs = preflight_validate(_pdf(extra=extra))
        assert valid == "false"
        assert len(errs) == 1 and errs[0].startswith(code + " : "), errs


def test_name_boundary_discipline():
    # /JSX, /AAPL, /Launcher are different PDF names, not the forbidden
    # ones; /ID must likewise not match /IDTree.
    valid, errs = preflight_validate(
        _pdf(extra=b"/JSX 1 /AAPL 2 /Launcher 3 "))
    assert (valid, errs) == ("true", [])


def test_syntax_tears():
    valid, errs = preflight_validate(_pdf(eof=False))
    assert (valid, errs) == (
        "false", ["1.0.2 : Missing end-of-file marker %%EOF"])
    valid, errs = preflight_validate(b"GIF89a not a pdf")
    assert valid == "false"
    assert "1.0.1 : Missing or malformed %PDF-M.N file header" in errs


def test_metadata_rules_accumulate_sorted():
    valid, errs = preflight_validate(_pdf(meta=False, intent=False))
    assert valid == "false"
    # Unique + sorted — the PDFAnalyser.java:105-118 dedup contract with
    # a deterministic order for the value oracle.
    assert errs == [
        "7.1 : Document has no XMP metadata stream",
        "7.11 : PDF/A OutputIntent is missing",
    ]


def test_spark_struct_shape(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_pdf())), (2, bytearray(_pdf(header=b"%PDF-1.9")))],
        "doc_id int, payload binary",
    )
    rows = {r["doc_id"]: r for r in preflight_pdfa(df, "payload").collect()}
    assert rows[1]["pdf_pdfa_is_valid"] == "true"
    assert rows[1]["pdf_pdfa_errors"] == []
    assert rows[2]["pdf_pdfa_is_valid"] == "false"
    assert rows[2]["pdf_pdfa_errors"] == [
        "1.1.1 : PDF/A-1 requires PDF version 1.4 or earlier, found 1.9"]


def test_capture_preflight_composition(spark, tmp_path):
    """with_preflight runs the validator over application/pdf records inside
    the capture projection (the extractApachePreflightErrors config gate):
    a PDF response fills pdf_pdfa_is_valid/pdf_pdfa_errors, non-PDF records
    stay null, and the flag demands the raw-bytes column."""
    import pytest

    from webarchive_discovery_spark.schema_capture import extract_capture
    from webarchive_discovery_spark.sources.warc import (
        read_binary_files,
        warc_records,
    )

    def http(body, ctype):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
                + b"\r\n\r\n" + body)

    def rec(uri, body):
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:1>\r\n"
            f"WARC-Date: 2024-01-02T03:04:05Z\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"

    warc = rec("http://a.org/doc.pdf",
               http(_pdf(header=b"%PDF-1.7"), b"application/pdf")) + rec(
        "http://a.org/page.html", http(b"<html>x</html>", b"text/html"))
    d = tmp_path / "w"
    d.mkdir()
    (d / "pf.warc").write_bytes(warc)

    records = warc_records(read_binary_files(spark, str(d)), keep_binary=True)
    caps = {r.url: r
            for r in extract_capture(records, with_preflight=True).collect()}
    doc = caps["http://a.org/doc.pdf"]
    assert doc.pdf_pdfa_is_valid == "false"
    assert doc.pdf_pdfa_errors == [
        "1.1.1 : PDF/A-1 requires PDF version 1.4 or earlier, found 1.7"]
    page = caps["http://a.org/page.html"]
    assert page.pdf_pdfa_is_valid is None and page.pdf_pdfa_errors is None

    no_bytes = warc_records(read_binary_files(spark, str(d)))
    with pytest.raises(ValueError, match="payload_bytes"):
        extract_capture(no_bytes.drop("payload_bytes"), with_preflight=True)
