"""Deep-format parsers (functions/docformats.py) + the MIME-dispatched
extraction operator — the engine's stand-in for the reference's Tika tier
(``TikaPayloadAnalyser.java:165-414``), built as real minimal parsers
against the public format specs instead of NULL-typed stubs."""

import io
import struct
import zipfile
import zlib

from pyspark.sql import functions as F

from webarchive_discovery_spark.functions.docformats import (
    docx_extract,
    exif_extract,
    pdf_extract,
)


def _mk_pdf(text1=b"(Hello \\(World\\)) Tj", flate_text=b"BT (deep) Tj ET",
            title=b"(\xfe\xff\x00T\x001)", pages=1):
    body = b"BT /F1 12 Tf 72 700 Td " + text1 + b" T* (line two) Tj ET"
    body2 = zlib.compress(flate_text)
    page_objs = b"".join(
        b"3 0 obj << /Type /Page /Parent 2 0 R >> endobj\n" for _ in range(pages)
    )
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 >> endobj\n" + page_objs
        + b"4 0 obj << /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n"
        + b"5 0 obj << /Length " + str(len(body2)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + body2
        + b"\nendstream\nendobj\n"
        + b"6 0 obj << /Title " + title + b" /Producer (wds) >> endobj\n"
        + b"trailer << /Info 6 0 R >>\n%%EOF\n"
    )


def _mk_docx(paras=("Para one &amp; text", "Para two"), title="Doc Title",
             creator="Alice"):
    buf = io.BytesIO()
    body = "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paras)
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml",
                   f"<w:document><w:body>{body}</w:body></w:document>")
        z.writestr("docProps/core.xml",
                   f"<cp:coreProperties><dc:title>{title}</dc:title>"
                   f"<dc:creator>{creator}</dc:creator></cp:coreProperties>")
    return buf.getvalue()


def _mk_jpeg(make=b"ACME\0", model=b"Cam-1\0", orientation=6,
             dto=b"2020:01:02 03:04:05\0", endian="<"):
    def entry(tag, typ, cnt, val):
        return struct.pack(endian + "HHI", tag, typ, cnt) + val

    ifd0_off, n0 = 8, 4
    val_base = ifd0_off + 2 + n0 * 12 + 4
    sub_off = val_base + len(make) + len(model)
    entries = [
        entry(0x010F, 2, len(make), struct.pack(endian + "I", val_base)),
        entry(0x0110, 2, len(model),
              struct.pack(endian + "I", val_base + len(make))),
        entry(0x0112, 3, 1, struct.pack(endian + "HH", orientation, 0)),
        entry(0x8769, 4, 1, struct.pack(endian + "I", sub_off)),
    ]
    ifd0 = struct.pack(endian + "H", n0) + b"".join(entries) + struct.pack(
        endian + "I", 0)
    sub_val = sub_off + 2 + 1 * 12 + 4
    sub = (struct.pack(endian + "H", 1)
           + entry(0x9003, 2, len(dto), struct.pack(endian + "I", sub_val))
           + struct.pack(endian + "I", 0))
    tiff = ((b"II" if endian == "<" else b"MM")
            + struct.pack(endian + "H", 42) + struct.pack(endian + "I", ifd0_off)
            + ifd0 + make + model + sub + dto)
    app1 = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
            + b"\xff\xda\x00\x02")


def test_pdf_text_flate_escapes_and_utf16_title():
    r = pdf_extract(_mk_pdf(pages=3))
    assert r["parse_error"] is None
    assert "Hello (World)" in r["text"] and "line two" in r["text"]
    assert "deep" in r["text"]  # FlateDecode stream decoded
    assert r["n_pages"] == 3
    assert r["title"] == "T1"  # UTF-16BE Info string
    assert r["producer"] == "wds"


def test_pdf_octal_and_hex_strings():
    pdf = _mk_pdf(text1=b"(A\\101\\12B) Tj", flate_text=b"BT <414243> Tj ET")
    r = pdf_extract(pdf)
    assert "AA\nB" in r["text"]  # \101 = 'A', \12 = LF
    assert "ABC" in r["text"]  # hex string in content


def test_pdf_rejects_non_pdf_and_truncated():
    assert pdf_extract(b"GIF89a...")["parse_error"].startswith("not a PDF")
    assert pdf_extract(None)["parse_error"] == "null payload"
    # corrupt flate stream: skipped, not fatal
    broken = _mk_pdf().replace(b"/Filter /FlateDecode", b"/Filter /FlateDecode")
    broken = broken.replace(zlib.compress(b"BT (deep) Tj ET"), b"\x00garbage")
    r = pdf_extract(broken)
    assert r["parse_error"] is None and "Hello" in r["text"]


def test_docx_text_title_creator_and_entities():
    r = docx_extract(_mk_docx())
    assert r["parse_error"] is None
    assert r["text"] == "Para one & text\nPara two"
    assert r["n_paragraphs"] == 2
    assert r["title"] == "Doc Title" and r["author"] == "Alice"


def test_docx_rejects_non_zip_and_wrong_zip():
    assert "BadZipFile" in docx_extract(b"not a zip")["parse_error"]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.txt", "hi")
    assert "not a DOCX" in docx_extract(buf.getvalue())["parse_error"]


def test_exif_both_endians_and_subifd():
    for endian in ("<", ">"):
        r = exif_extract(_mk_jpeg(endian=endian))
        assert r["parse_error"] is None, (endian, r)
        assert r["make"] == "ACME" and r["model"] == "Cam-1"
        assert r["orientation"] == 6
        assert r["datetime_original"] == "2020:01:02 03:04:05"


def test_exif_missing_segment_and_bad_input():
    plain = b"\xff\xd8\xff\xda\x00\x02"  # SOI straight to SOS
    assert exif_extract(plain)["parse_error"] == "no EXIF APP1 segment"
    assert exif_extract(b"PNG")["parse_error"].startswith("not a JPEG")


def test_operator_mime_dispatch_single_arrow_stage(spark):
    from webarchive_discovery_spark.operators.metadata import (
        extract_document_metadata,
    )

    rows = [
        (0, _mk_pdf(), "application/pdf"),
        (1, _mk_docx(), "application/vnd.openxmlformats-officedocument"
                        ".wordprocessingml.document"),
        (2, _mk_jpeg(), "image/jpeg"),
        (3, b"plain", "text/plain"),
        (4, b"broken", "application/pdf"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, content_type string")
    out = extract_document_metadata(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["doc_format"] == "pdf" and "Hello" in got[0]["doc_text"]
    assert got[0]["doc_text_length"] == len(got[0]["doc_text"])
    assert got[1]["doc_format"] == "docx" and got[1]["doc_paragraphs"] == 2
    assert got[2]["doc_format"] == "jpeg_exif" and got[2]["exif_make"] == "ACME"
    assert got[3]["doc_format"] == "unsupported"
    assert all(got[3][c] is None for c in ("doc_text", "doc_title", "exif_make"))
    assert got[4]["doc_format"] == "pdf"
    assert got[4]["doc_parse_error"].startswith("not a PDF")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
