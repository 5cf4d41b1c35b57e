"""DROID/PRONOM signature identification.

Ports the reference's ``DroidDetectorTest.java:70-75`` real-file goldens
(cc.png -> image/png, cc0.mp3 -> audio/mpeg) and exercises the PRONOM
pattern compiler, priority resolution, ZIP container refinement, and the
Arrow-batched Spark surface.
"""

import gzip
import io
import os
import struct
import zipfile

import pytest

from webarchive_discovery_spark.functions.droid import (
    CONTAINER_SIGS,
    PRONOM_REGISTRY,
    _zip_entry_names,
    compile_pronom,
    identify_bytes,
    identify_formats,
)

_REF = "/root/reference/warc-indexer/src/test/resources"
_REF_TIKA = "/root/reference/digipres-tika/src/test/resources"


def _zip(files, first_stored=None):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        if first_stored is not None:
            zf.writestr(zipfile.ZipInfo(first_stored[0]), first_stored[1],
                        compress_type=zipfile.ZIP_STORED)
        for n, c in files.items():
            zf.writestr(zipfile.ZipInfo(n), c,
                        compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Pattern compiler
# ---------------------------------------------------------------------------

class TestCompiler:
    def test_hex_literals(self):
        rx = compile_pronom("FFD8FF", "BOF")
        assert rx.search(b"\xff\xd8\xff\xe0")
        assert not rx.search(b"\x00\xff\xd8\xff")

    def test_any_byte(self):
        rx = compile_pronom("41??43", "BOF")
        assert rx.search(b"AxC")
        assert not rx.search(b"AxD")

    def test_fixed_gap(self):
        rx = compile_pronom("41{3}42", "BOF")
        assert rx.search(b"AxyzB")
        assert not rx.search(b"AxyB")

    def test_bounded_gap(self):
        rx = compile_pronom("41{1-3}42", "BOF")
        assert rx.search(b"AxB") and rx.search(b"AxyzB")
        assert not rx.search(b"AB") and not rx.search(b"AwxyzB")

    def test_open_gap(self):
        rx = compile_pronom("41{2-*}42", "BOF")
        assert rx.search(b"AxyB") and rx.search(b"Ax" + b"y" * 50 + b"B")
        assert not rx.search(b"AxB")

    def test_unbounded_star(self):
        rx = compile_pronom("41*42", "VAR")
        assert rx.search(b"A" + b"\x00" * 100 + b"B")

    def test_byte_range(self):
        rx = compile_pronom("FF[E0:EF]", "BOF")
        assert rx.search(b"\xff\xe5") and not rx.search(b"\xff\xd8")

    def test_negated_byte(self):
        rx = compile_pronom("[!0A]", "BOF")
        assert rx.search(b"\x0b") and not rx.search(b"\x0a")

    def test_negated_range(self):
        rx = compile_pronom("[!41:5A]", "BOF")
        assert rx.search(b"a") and not rx.search(b"Q")

    def test_alternatives(self):
        rx = compile_pronom("(4141|42)43", "BOF")
        assert rx.search(b"AAC") and rx.search(b"BC")
        assert not rx.search(b"AC")

    def test_bof_max_offset(self):
        rx = compile_pronom("3C3F786D6C", "BOF", max_offset=3)
        assert rx.search(b"\xef\xbb\xbf<?xml")
        assert not rx.search(b"    <?xml")

    def test_eof_anchor(self):
        rx = compile_pronom("FFD9", "EOF")
        assert rx.search(b"data\xff\xd9")
        assert not rx.search(b"\xff\xd9data")

    def test_eof_max_offset(self):
        rx = compile_pronom("2525454F46", "EOF", max_offset=8)
        assert rx.search(b"x%%EOF\n")
        assert not rx.search(b"x%%EOF" + b"\n" * 20)

    def test_odd_hex_rejected(self):
        with pytest.raises(ValueError):
            compile_pronom("FFD", "BOF")

    def test_registry_compiles(self):
        for sig in PRONOM_REGISTRY:
            c = sig.compiled()
            assert c["weight"] > 0, sig.puid


# ---------------------------------------------------------------------------
# Reference-file parity (DroidDetectorTest.java port + extensions)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path,mime,puid", [
    (f"{_REF}/cc.png", "image/png", "fmt/11"),
    (f"{_REF}/cc0.mp3", "audio/mpeg", "fmt/134"),
    (f"{_REF}/16px-photo.jpg", "image/jpeg", "fmt/43"),
    (f"{_REF_TIKA}/simple.pdf", "application/pdf", "fmt/18"),
    (f"{_REF}/IAH-20080430204825-00000-blackbook-truncated.warc",
     "application/warc", "fmt/289"),
    (f"{_REF}/IAH-20080430204825-00000-blackbook-truncated.arc",
     "application/x-internet-archive", "fmt/410"),
    (f"{_REF}/IAH-urls-wget.warc.gz", "application/gzip", "x-fmt/266"),
])
def test_reference_file_parity(path, mime, puid):
    if not os.path.exists(path):
        pytest.skip(f"reference fixture missing: {path}")
    with open(path, "rb") as fh:
        d = identify_bytes(fh.read())
    assert d["mime"] == mime and d["puid"] == puid, (path, d)


# ---------------------------------------------------------------------------
# Priority + specificity resolution
# ---------------------------------------------------------------------------

class TestResolution:
    def test_jfif_beats_raw_jpeg(self):
        data = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00" + b"\x00" * 9
                + b"\xff\xd9")
        assert identify_bytes(data)["puid"] == "fmt/43"

    def test_exif_beats_raw_jpeg(self):
        data = (b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00II*\x00" + b"\x00" * 8
                + b"\xff\xd9")
        assert identify_bytes(data)["puid"] == "x-fmt/390"

    def test_raw_jpeg_fallback(self):
        data = b"\xff\xd8\xff\xdb\x00\x05abc\xff\xd9"
        assert identify_bytes(data)["puid"] == "fmt/41"

    def test_gif_versions(self):
        assert identify_bytes(b"GIF87adata\x00;")["puid"] == "fmt/3"
        assert identify_bytes(b"GIF89adata\x00;")["puid"] == "fmt/4"

    def test_pdf_versions(self):
        for minor, puid in [(0, "fmt/14"), (4, "fmt/18"), (7, "fmt/276")]:
            data = b"%%PDF-1.%d\ncontent\n%%%%EOF\n" % minor
            assert identify_bytes(data)["puid"] == puid

    def test_xml_beats_floating_html(self):
        # an XML doc that *contains* <html must resolve as XML (anchored
        # BOF sequence outweighs the floating HTML alternative)
        data = b'<?xml version="1.0"?><html xmlns="x"/>'
        assert identify_bytes(data)["puid"] == "fmt/101"

    def test_html(self):
        assert identify_bytes(b"<!DOCTYPE html><p>x</p>")["puid"] == "fmt/96"

    def test_unknown(self):
        d = identify_bytes(b"\x00\x01\x02nothing matches here")
        assert d == {"puid": None, "format_name": None, "mime": None,
                     "method": None}

    def test_mp4_vs_quicktime(self):
        mp4 = struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00isom"
        mov = struct.pack(">I", 16) + b"ftypqt  \x00\x00\x02\x00qt  "
        assert identify_bytes(mp4)["puid"] == "fmt/199"
        assert identify_bytes(mov)["puid"] == "x-fmt/384"

    def test_riff_split(self):
        wav = b"RIFF\x24\x00\x00\x00WAVEfmt "
        avi = b"RIFF\x24\x00\x00\x00AVI LIST"
        assert identify_bytes(wav)["puid"] == "fmt/6"
        assert identify_bytes(avi)["puid"] == "fmt/5"

    def test_tiff_both_endians(self):
        assert identify_bytes(b"II*\x00" + b"\x08\x00\x00\x00")["puid"] == "fmt/353"
        assert identify_bytes(b"MM\x00*" + b"\x00\x00\x00\x08")["puid"] == "fmt/353"

    def test_bmp_v3(self):
        hdr = (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
               + struct.pack("<I", 40))  # BITMAPINFOHEADER size 40
        assert identify_bytes(hdr)["puid"] == "fmt/116"
        # a BM prefix without the v3 info-header size is not fmt/116
        assert identify_bytes(b"BM" + b"\x00" * 16)["puid"] is None


# ---------------------------------------------------------------------------
# ZIP container signatures
# ---------------------------------------------------------------------------

class TestContainer:
    def test_ooxml_triggers(self):
        cases = {
            "word/document.xml": "fmt/412",
            "xl/workbook.xml": "fmt/214",
            "ppt/presentation.xml": "fmt/215",
        }
        for trigger, puid in cases.items():
            d = identify_bytes(_zip({trigger: b"<x/>", "other.xml": b"<y/>"}))
            assert (d["puid"], d["method"]) == (puid, "container")

    def test_odf_mimetype_probe(self):
        d = identify_bytes(_zip(
            {"content.xml": b"<o/>"},
            first_stored=("mimetype",
                          b"application/vnd.oasis.opendocument.text")))
        assert (d["puid"], d["method"]) == ("fmt/291", "container")

    def test_odf_mimetype_must_be_stored_first(self):
        # mimetype deflated mid-archive is NOT the ODF container shape
        d = identify_bytes(_zip({
            "content.xml": b"<o/>",
            "mimetype": b"application/vnd.oasis.opendocument.text"}))
        assert d["puid"] == "x-fmt/263"

    def test_plain_zip(self):
        d = identify_bytes(_zip({"a.txt": b"hello"}))
        assert (d["puid"], d["method"]) == ("x-fmt/263", "binary")

    def test_zip_with_trailing_comment(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(zipfile.ZipInfo("word/document.xml"), b"<w/>")
            zf.comment = b"trailing archive comment"
        d = identify_bytes(buf.getvalue())
        assert (d["puid"], d["method"]) == ("fmt/412", "container")

    def test_central_directory_outside_tail_degrades_to_zip(self):
        # CD beyond the tail window: the binary ZIP match must stand.
        data = _zip({"word/document.xml": b"<w/>",
                     "pad.bin": os.urandom(200_000)})
        d = identify_bytes(data, tail_bytes=64)
        assert d["puid"] == "x-fmt/263"

    def test_entry_names_tail_only(self):
        data = _zip({"word/document.xml": b"<w/>", "a/b.txt": b"x"})
        tail = data[-512:] if len(data) > 512 else data
        names = _zip_entry_names(tail, len(data))
        assert "word/document.xml" in names and "a/b.txt" in names


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

class TestSpark:
    def test_identify_formats_matches_local(self, spark):
        payloads = [
            _zip({"word/document.xml": b"<w/>"}),
            b"GIF89ax\x00;",
            gzip.compress(b"x", mtime=0),
            b"\x00unknown",
            None,
            b"",
        ]
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(payloads)], "id long, payload binary")
        rows = {r["id"]: r for r in
                identify_formats(df, "payload").select(
                    "id", "droid.*").collect()}
        for i, p in enumerate(payloads):
            want = identify_bytes(p)
            got = rows[i]
            assert (got["puid"], got["mime"], got["method"]) == (
                want["puid"], want["mime"], want["method"]), i

    def test_single_arrow_pass(self, spark):
        df = spark.createDataFrame([(1, b"GIF89a\x00;")],
                                   "id long, payload binary")
        plan = identify_formats(df, "payload")._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan

    def test_container_sig_registry_consistent(self):
        for trigger, puid, name, mime in CONTAINER_SIGS:
            assert puid and name and mime and trigger


class TestNewTierSignatures:
    """WebP/ICO/OLE2/FLAC/Ogg BOF signatures + the EPUB container
    refinement added alongside the r5 parser tiers."""

    def test_webp(self):
        d = b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 16
        r = identify_bytes(d)
        assert (r["puid"], r["mime"]) == ("fmt/566", "image/webp")

    def test_ico(self):
        d = b"\x00\x00\x01\x00\x01\x00" + bytes([16, 16]) + b"\x00" * 16
        assert identify_bytes(d)["puid"] == "x-fmt/418"

    def test_ole2(self):
        from webarchive_discovery_spark.functions.ole2 import build_cfbf
        r = identify_bytes(build_cfbf({"WordDocument": b"w" * 100}))
        assert (r["puid"], r["mime"]) == (
            "fmt/111", "application/x-ole-storage")

    def test_flac_and_ogg(self):
        from webarchive_discovery_spark.functions.audio import (
            encode_flac_stub)
        assert identify_bytes(encode_flac_stub())["puid"] == "fmt/279"
        assert identify_bytes(b"OggS\x00" + b"\x00" * 32)["puid"] == "fmt/203"

    def test_epub_container_refinement(self):
        d = _zip({"META-INF/container.xml": "<container/>"},
                 first_stored=("mimetype", "application/epub+zip"))
        r = identify_bytes(d)
        assert (r["puid"], r["mime"]) == ("fmt/483", "application/epub+zip")
