"""OLE2/CFBF + EPUB parsers and the new header-dims formats.

The CFBF fixtures are serialized by the in-repo minimal writer
(``functions/ole2.py:build_cfbf``) — the same hand-rolled-spec-fixture
strategy as the AVI/MP4 tiers: the writer's fixed sector layout is
asserted structurally here (magic, DIFAT, FAT self-marking) so a
symmetric writer/reader bug cannot hide behind a clean round trip.
"""

import io
import struct
import zipfile

import pytest

from webarchive_discovery_spark.functions.imaging import image_dims
from webarchive_discovery_spark.functions.ole2 import (
    build_cfbf,
    build_summary_information,
    ole2_extract,
)
from webarchive_discovery_spark.functions.officeformats import epub_extract


def _si(**kw):
    return build_summary_information(**kw)


def test_ole2_roundtrip_mini_and_fat_tiers():
    si = _si(title="T1", subject="S1", author="A1", app_name="Word",
             created_filetime=131_000_000_000_000_000,
             modified_filetime=131_000_001_000_000_000)
    img = build_cfbf({
        "\x05SummaryInformation": si,          # mini tier (< 4096)
        "WordDocument": b"x" * 9000,           # FAT tier (>= 4096)
        "1Table": b"t" * 100,                  # mini tier
    })
    r = ole2_extract(img)
    assert r["parse_error"] is None
    assert r["streams"] == ["\x05SummaryInformation", "WordDocument", "1Table"]
    assert r["n_streams"] == 3
    assert (r["title"], r["subject"], r["author"], r["app_name"]) == (
        "T1", "S1", "A1", "Word")
    assert r["created"] == "2016-02-15T08:53:20Z"
    assert r["modified"] == "2016-02-15T08:55:00Z"


def test_ole2_structural_layout():
    """Structural spec assertions independent of the reader: header fields,
    FAT self-marking, directory entry shape."""
    img = build_cfbf({"S": b"abc"})
    assert img[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    assert struct.unpack("<H", img[30:32])[0] == 9        # 512-byte sectors
    n_fat = struct.unpack("<I", img[44:48])[0]
    assert n_fat == 1
    fat_sector = struct.unpack("<I", img[76:80])[0]       # DIFAT[0]
    fat = struct.unpack_from("<128I", img, 512 + fat_sector * 512)
    assert fat[fat_sector] == 0xFFFFFFFD                  # FATSECT self-mark
    # directory sector 0: root entry name + type
    root = img[512:512 + 128]
    assert root[:20].decode("utf-16-le") == "Root Entry"
    assert root[66] == 5


def test_ole2_large_stream_content_and_empty():
    img = build_cfbf({"Big": bytes(range(256)) * 40, "Empty": b""})
    r = ole2_extract(img)
    assert r["parse_error"] is None
    assert r["streams"] == ["Big", "Empty"]
    assert r["title"] is None  # no SummaryInformation stream


def test_ole2_malformed_is_total():
    assert ole2_extract(None)["parse_error"] == "null payload"
    assert ole2_extract(b"not a cfbf")["parse_error"].startswith("ValueError")
    good = build_cfbf({"S": b"abc"})
    # corrupt the FAT so the directory chain dangles
    bad = bytearray(good)
    bad[44:48] = struct.pack("<I", 0)  # zero FAT sectors
    assert ole2_extract(bytes(bad))["parse_error"] is not None


def _epub(spine_docs, opf_extra=""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="OEBPS/content.opf"'
            ' media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>")
        manifest = "".join(
            f'<item id="c{i}" href="ch{i}.xhtml"/>'
            for i in range(len(spine_docs)))
        spine = "".join(
            f'<itemref idref="c{i}"/>' for i in range(len(spine_docs)))
        zf.writestr(
            "OEBPS/content.opf",
            "<package><metadata><dc:title>Book &amp; Title</dc:title>"
            "<dc:creator>Jane Writer</dc:creator>"
            f"<dc:language>en-GB</dc:language>{opf_extra}</metadata>"
            f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>")
        for i, doc in enumerate(spine_docs):
            zf.writestr(f"OEBPS/ch{i}.xhtml", doc)
    return buf.getvalue()


def test_epub_metadata_and_spine_text():
    data = _epub([
        "<html><body><p>One fish.</p></body></html>",
        "<html><body><h1>Two</h1><p>fish &amp; chips.</p></body></html>",
    ])
    r = epub_extract(data)
    assert r["parse_error"] is None
    assert r["title"] == "Book & Title"
    assert r["author"] == "Jane Writer"
    assert r["language"] == "en-GB"
    assert r["n_spine"] == 2
    assert r["text"] == "One fish.\nTwo fish & chips."


def test_epub_malformed_is_total():
    assert epub_extract(None)["parse_error"] == "null payload"
    assert epub_extract(b"PK\x03\x04garbage")["parse_error"] is not None
    # a valid zip with no container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("x.txt", "hi")
    assert epub_extract(buf.getvalue())["parse_error"] is not None


@pytest.mark.parametrize("data,wh", [
    # VP8X: canvas 64x33 (width-1=63, height-1=32, 24-bit LE)
    (b"RIFF\x00\x00\x00\x00WEBPVP8X" + b"\x0a\x00\x00\x00" + b"\x00" * 4
     + b"\x3f\x00\x00" + b"\x20\x00\x00", (64, 33)),
    # VP8L: 14-bit w-1/h-1 packed after the 0x2f signature
    (b"RIFF\x00\x00\x00\x00WEBPVP8L" + b"\x08\x00\x00\x00" + b"\x2f"
     + bytes([0x3F, 0x80, 0x00, 0x00]) + b"\x00" * 3, (64, 3)),
    # VP8 lossy: start code 9d 01 2a then u16le dims
    (b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x0a\x00\x00\x00" + b"\x00" * 3
     + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240), (320, 240)),
])
def test_webp_dims(data, wh):
    assert image_dims(data) == wh


def test_ico_and_tiff_dims():
    ico = b"\x00\x00\x01\x00\x01\x00" + bytes([48, 0]) + b"\x00" * 8
    assert image_dims(ico) == (48, 256)
    # little-endian TIFF with SHORT width 17, LONG height 9
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHIHH", 256, 3, 1, 17, 0)
    ifd += struct.pack("<HHII", 257, 4, 1, 9)
    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd
    assert image_dims(tiff) == (17, 9)


def test_vp8l_packing_derivation():
    """The VP8L bit packing decoded against an independent derivation:
    w-1 = 14 bits little-endian starting at bit 0 of byte 21; h-1 = next
    14 bits."""
    for w, h in [(1, 1), (16384, 16384), (800, 600), (2, 1024)]:
        bits = (w - 1) | ((h - 1) << 14)
        packed = bytes([0x2F]) + struct.pack("<I", bits)
        data = (b"RIFF\x00\x00\x00\x00WEBPVP8L"
                + struct.pack("<I", len(packed)) + packed)
        assert image_dims(data) == (w, h)


# ---------------------------------------------------------------------------
# Word 97 / Excel 97 binary CONTENT extraction (functions/docbinary.py)
# ---------------------------------------------------------------------------

def test_doc_piece_table_roundtrip_and_layout():
    from webarchive_discovery_spark.functions.docbinary import (
        build_doc, doc_text)

    w, t = build_doc([("Hello.\r", True), ("Wörld — ünïcode.\r", False),
                      ("cell\x07mark", True)])
    assert doc_text(w, t) == "Hello.\nWörld — ünïcode.\ncell\tmark"
    # structural [MS-DOC] assertions independent of the reader
    assert struct.unpack_from("<H", w, 0)[0] == 0xA5EC      # wIdent
    assert struct.unpack_from("<H", w, 0x0A)[0] & 0x0200    # fWhichTblStm
    fc_clx, lcb_clx = struct.unpack_from("<II", w, 0x01A2)
    assert t[fc_clx] == 0x01                                 # leading Prc
    # compressed piece's fc has bit 30 set and doubles the byte offset
    clx = t[fc_clx:fc_clx + lcb_clx]
    pos = 3 + struct.unpack_from("<H", clx, 1)[0]            # skip Prc
    assert clx[pos] == 0x02
    plc = clx[pos + 5:]
    n = (len(plc) - 4) // 12
    first_fc = struct.unpack_from("<I", plc, 4 * (n + 1) + 2)[0]
    assert first_fc & 0x40000000
    assert (first_fc & 0x3FFFFFFF) >> 1 == 0x800


def test_doc_table_stream_flag_selection():
    from webarchive_discovery_spark.functions.docbinary import (
        build_doc, doc_text_from_streams)

    w, t = build_doc([("X\r", True)])
    assert doc_text_from_streams({"WordDocument": w, "1Table": t}) == "X\n"
    # flag says 1Table; only 0Table present → honest None
    assert doc_text_from_streams({"WordDocument": w, "0Table": t}) is None


def test_xls_biff8_roundtrip_sst_dedup_and_unicode():
    from webarchive_discovery_spark.functions.docbinary import (
        build_xls, xls_cells, xls_text)

    xls = build_xls([["a", "a", "ü€"], [1.5, 7]])
    assert xls_text(xls) == "a\ta\tü€\n1.5\t7"
    # SST deduplicates: 3 refs, 2 unique
    assert struct.unpack_from(
        "<II", xls, xls.index(b"\xfc\x00") + 4) == (3, 2)
    assert xls_cells(b"garbage") is None


def test_ole2_dispatch_prefers_real_content():
    from webarchive_discovery_spark.functions.docbinary import (
        build_doc, build_xls)
    from webarchive_discovery_spark.functions.ole2 import build_cfbf
    from webarchive_discovery_spark.operators.metadata import _docformat_one

    w, t = build_doc([("Real text.\r", True)])
    doc = build_cfbf({"WordDocument": w, "1Table": t})
    rec = _docformat_one(doc, "application/msword")
    assert rec["doc_text"] == "Real text.\n"

    xls = build_cfbf({"Workbook": build_xls([["v", 2]])})
    rec = _docformat_one(xls, "application/vnd.ms-excel")
    assert rec["doc_text"] == "v\t2"

    # non-Word payload in a WordDocument stream → stream-listing fallback
    junk = build_cfbf({"WordDocument": b"W" * 100})
    rec = _docformat_one(junk, "application/msword")
    assert rec["doc_text"] == "WordDocument"


def test_ppt_record_walk_roundtrip_and_layout():
    from webarchive_discovery_spark.functions.docbinary import (
        build_ppt, ppt_text)

    p = build_ppt([["Title", "Sübtitle — ü"], ["Body\rline"]])
    assert ppt_text(p) == "Title\nSübtitle — ü\nBody\nline"
    # structural [MS-PPT] assertions: Document container (0x03E8, recVer F)
    ver_inst, rtype, rlen = struct.unpack_from("<HHI", p, 0)
    assert (ver_inst & 0x0F, rtype) == (0x0F, 0x03E8)
    assert rlen == len(p) - 8
    # first child: SlideListWithText container holding a TextBytesAtom
    ver_inst, rtype, _ = struct.unpack_from("<HHI", p, 8)
    assert (ver_inst & 0x0F, rtype) == (0x0F, 0x0FF0)
    _, atype, alen = struct.unpack_from("<HHI", p, 16)
    assert atype == 0x0FA8  # ascii slide title → TextBytesAtom
    assert p[24:24 + alen] == b"Title"
    assert ppt_text(b"") is None


def test_ppt_dispatch():
    from webarchive_discovery_spark.functions.docbinary import build_ppt
    from webarchive_discovery_spark.functions.ole2 import build_cfbf
    from webarchive_discovery_spark.operators.metadata import _docformat_one

    img = build_cfbf({"PowerPoint Document": build_ppt([["Deck text"]])})
    rec = _docformat_one(img, "application/vnd.ms-powerpoint")
    assert rec["doc_text"] == "Deck text"
