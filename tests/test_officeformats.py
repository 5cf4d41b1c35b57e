"""Office long-tail parsers (``functions/officeformats.py``): XLSX, PPTX,
ODT, RTF — the formats the reference hands to Tika
(``TikaPayloadAnalyser.java:165-414``)."""

import io
import zipfile

from webarchive_discovery_spark.functions.officeformats import (
    odt_extract,
    pptx_extract,
    rtf_extract,
    xlsx_extract,
)


def _zip(files: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, c in files.items():
            z.writestr(n, c)
    return buf.getvalue()


def test_xlsx_shared_strings_rich_runs_types_and_core():
    data = _zip({
        "xl/sharedStrings.xml":
            "<sst><si><t>Hello</t></si>"
            "<si><r><t>Wor</t></r><r><t>ld</t></r></si></sst>",
        "xl/worksheets/sheet1.xml":
            '<worksheet><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c>'
            '<c r="B1"><v>42</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c>'
            '<c r="B2" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        "xl/worksheets/sheet2.xml":
            '<worksheet><sheetData><row><c t="inlineStr">'
            "<is><t>inline &amp; safe</t></is></c></row>"
            "</sheetData></worksheet>",
        "docProps/core.xml":
            "<cp><dc:title>Book T</dc:title><dc:creator>au</dc:creator></cp>",
    })
    r = xlsx_extract(data)
    assert r["parse_error"] is None
    assert r["text"] == "Hello\t42\nWorld\tTRUE\ninline & safe"
    assert (r["n_sheets"], r["n_cells"]) == (2, 5)
    assert (r["title"], r["author"]) == ("Book T", "au")


def test_xlsx_rejects_non_zip_and_wrong_zip():
    assert xlsx_extract(b"not a zip")["parse_error"] is not None
    r = xlsx_extract(_zip({"word/document.xml": "<w:document/>"}))
    assert "not an XLSX" in r["parse_error"]
    assert xlsx_extract(None)["parse_error"] == "null payload"


def test_pptx_numeric_slide_order_and_runs():
    data = _zip({
        "ppt/slides/slide10.xml":
            "<p:sld><a:p><a:r><a:t>Tenth</a:t></a:r></a:p></p:sld>",
        "ppt/slides/slide2.xml":
            "<p:sld><a:p><a:r><a:t>Two </a:t></a:r>"
            "<a:r><a:t>joined</a:t></a:r></a:p></p:sld>",
    })
    r = pptx_extract(data)
    # numeric order (2 before 10), not lexicographic (10 before 2)
    assert r["text"] == "Two joined\nTenth"
    assert r["n_slides"] == 2 and r["parse_error"] is None


def test_odt_paragraphs_headings_nested_spans_meta():
    data = _zip({
        "content.xml":
            '<office:body><text:h text:style-name="H1">Head</text:h>'
            "<text:p>Para <text:span>one</text:span></text:p>"
            "<text:p/></office:body>",
        "meta.xml":
            "<office:meta><dc:title>OT</dc:title>"
            "<meta:initial-creator>oc</meta:initial-creator></office:meta>",
    })
    r = odt_extract(data)
    assert r["text"] == "Head\nPara one"
    assert r["n_paragraphs"] == 2
    assert (r["title"], r["author"]) == ("OT", "oc")
    assert "not an ODT" in odt_extract(_zip({"x": "y"}))["parse_error"]


def test_rtf_control_words_escapes_unicode_and_info():
    rtf = (b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}"
           b"{\\colortbl;\\red0\\green0\\blue0;}"
           b"{\\info{\\title My Title}{\\author Who}}"
           b"{\\*\\generator WDS 1.0;}"
           b"First \\b bold\\b0  line\\par "
           b"Euro: \\u8364? and \\'e9acute\\par\\tab indented}")
    r = rtf_extract(rtf)
    assert r["parse_error"] is None
    assert r["text"] == "First bold line\nEuro: € and \xe9acute\n\tindented"
    assert r["n_paragraphs"] == 3
    assert (r["title"], r["author"]) == ("My Title", "Who")


def test_rtf_skips_tables_and_rejects_non_rtf():
    # fonttbl/colortbl/stylesheet/pict content must not leak into text
    rtf = (b"{\\rtf1{\\fonttbl{\\f0\\fswiss Helvetica;}}"
           b"{\\stylesheet{\\s0 Normal;}}"
           b"{\\pict\\wmetafile8 0102abcd}Visible only}")
    r = rtf_extract(rtf)
    assert r["text"] == "Visible only"
    assert "not RTF" in rtf_extract(b"plain text")["parse_error"]


def test_operator_dispatch_routes_all_office_mimes(spark):
    from webarchive_discovery_spark.operators.metadata import (
        extract_document_metadata,
    )

    rows = [
        ("x", _zip({"xl/worksheets/sheet1.xml":
                    "<worksheet><sheetData><row><c><v>7</v></c></row>"
                    "</sheetData></worksheet>"}),
         "application/vnd.openxmlformats-officedocument"
         ".spreadsheetml.sheet"),
        ("p", _zip({"ppt/slides/slide1.xml":
                    "<p:sld><a:p><a:r><a:t>s</a:t></a:r></a:p></p:sld>"}),
         "application/vnd.openxmlformats-officedocument"
         ".presentationml.presentation"),
        ("o", _zip({"content.xml": "<b><text:p>t</text:p></b>"}),
         "application/vnd.oasis.opendocument.text"),
        ("r", b"{\\rtf1 hi}", "application/rtf"),
        ("d", _zip({"word/document.xml":
                    "<w:document><w:body><w:p><w:r><w:t>w</w:t></w:r></w:p>"
                    "</w:body></w:document>"}),
         "application/vnd.openxmlformats-officedocument"
         ".wordprocessingml.document"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, payload binary, content_type string")
    got = {r["doc_id"]: (r["doc_format"], r["doc_text"])
           for r in extract_document_metadata(df).collect()}
    assert got == {
        "x": ("xlsx", "7"), "p": ("pptx", "s"), "o": ("odt", "t"),
        "r": ("rtf", "hi"), "d": ("docx", "w"),
    }


def test_zip_entry_listing():
    from webarchive_discovery_spark.functions.officeformats import zip_extract

    data = _zip({"a/b.txt": "hello", "c.bin": "x" * 100})
    r = zip_extract(data)
    assert r == {"text": "a/b.txt\nc.bin", "n_entries": 2,
                 "total_uncompressed": 105, "parse_error": None}
    assert zip_extract(b"PK\x03\x04 truncated")["parse_error"] is not None
