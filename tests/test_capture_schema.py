"""Capture document model: schema completeness, extraction projection, and
the ARC / chunked-transfer / content-encoding record paths feeding it."""

import gzip

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.schema_capture import (
    CAPTURE_SCHEMA,
    CONTENT_MAX_LENGTH,
    URL_MAX_LENGTH,
    extract_capture,
)
from webarchive_discovery_spark.sources.warc import read_binary_files, warc_records


def _http(body: bytes, status: bytes = b"200 OK", extra: bytes = b"") -> bytes:
    return b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n" + extra + b"\r\n" + body


def _warc_record(uri: str, http: bytes, rtype: str = "response", date: str = "2024-03-05T06:07:08Z") -> bytes:
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)) & 0xFFFF}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


def _arc_file() -> bytes:
    """Minimal ARC v1: filedesc block + two response records
    (framing per ArchiveFileRecordReader.java:66-195)."""
    ver = b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"
    out = b"filedesc://test.arc 0.0.0.0 20080430204825 text/plain " + str(len(ver)).encode() + b"\n" + ver + b"\n"
    for i, (url, body) in enumerate(
        [("http://www.archive.org/robots.txt", b"User-agent: *\n"),
         ("http://www.archive.org/index.html", b"<html>arc</html>")]
    ):
        http = _http(body)
        out += f"{url} 1.2.3.4 2008043020482{5 + i} text/html {len(http)}\n".encode() + http + b"\n"
    return out


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("archives")
    redirect = _warc_record(
        "http://example.org/old",
        _http(b"", status=b"301 Moved", extra=b"Location: /new/place\r\n"),
    )
    chunked_body = b"7\r\n<html>c\r\n8\r\nhunked!>\r\n0\r\n\r\n"
    chunked = _warc_record(
        "http://example.org/chunked",
        _http(chunked_body, extra=b"Transfer-Encoding: chunked\r\n"),
    )
    gz_payload = gzip.compress(b"<html>gzipped payload</html>")
    gzipped = _warc_record(
        "http://example.org/gz",
        _http(gz_payload, extra=b"Content-Encoding: gzip\r\n"),
    )
    plain = _warc_record("http://example.org/", _http(b"<html>hello</html>"))
    (d / "caps.warc").write_bytes(plain + redirect + chunked + gzipped)
    (d / "old.arc").write_bytes(_arc_file())
    (d / "old.arc.gz").write_bytes(gzip.compress(_arc_file()))
    return str(d)


@pytest.fixture(scope="module")
def records(spark, archive_dir):
    return warc_records(read_binary_files(spark, archive_dir, glob="*.{warc,arc,arc.gz}")).cache()


def test_arc_records_parsed(records):
    arc = records.filter(F.col("source_file").endswith("old.arc")).collect()
    resp = [r for r in arc if r.record_type == "response"]
    assert len(resp) == 2
    robots = next(r for r in resp if "robots" in r.target_uri)
    assert robots.http_status == "200"
    assert robots.warc_date == "2008-04-30T20:48:25Z"
    assert "User-agent" in robots.payload
    # filedesc version block surfaces as warcinfo, never a parse error
    assert any(r.record_type == "warcinfo" for r in arc)
    assert all(r.parse_error is None for r in arc)


def test_arc_gz_same_records(records):
    a = sorted(r.target_uri for r in records.filter(
        F.col("source_file").endswith("old.arc")).collect())
    b = sorted(r.target_uri for r in records.filter(
        F.col("source_file").endswith("old.arc.gz")).collect())
    assert a == b and len(a) == 3


def test_chunked_transfer_dechunked(records):
    r = records.filter(F.col("target_uri") == "http://example.org/chunked").first()
    assert r.payload == "<html>chunked!>"
    assert r.parse_error is None


def test_content_encoding_gzip_decompressed(records):
    r = records.filter(F.col("target_uri") == "http://example.org/gz").first()
    assert r.payload == "<html>gzipped payload</html>"


def test_redirect_location_captured(records):
    r = records.filter(F.col("target_uri") == "http://example.org/old").first()
    assert r.http_status == "301"
    assert r.redirect_location == "/new/place"


def test_capture_schema_shape():
    names = [f.name for f in CAPTURE_SCHEMA.fields]
    assert len(names) == len(set(names)) >= 85  # SolrFields.java:33-155 catalog
    for required in ("id", "url", "url_norm", "host_surt", "content_type_norm",
                     "crawl_year", "wayback_date", "links_hosts_surts",
                     "image_dominant_colour", "sentiment_score", "access_terms"):
        assert required in names
    assert URL_MAX_LENGTH == 2000 and CONTENT_MAX_LENGTH == 512 * 1024


def test_extract_capture_fields(records):
    caps = extract_capture(records.filter(F.col("record_type") == "response"))
    assert [f.name for f in caps.schema.fields] == [f.name for f in CAPTURE_SCHEMA.fields]
    plain = caps.filter(F.col("url") == "http://example.org/").first()
    assert plain.id == "20240305060708/" + plain.id.split("/", 1)[1]
    assert plain.wayback_date == 20240305060708
    assert plain.crawl_year == 2024
    assert plain.host == "example.org"
    assert plain.host_surt == ["(org,", "(org,example,"]
    assert plain.domain == "example.org"
    assert plain.url_type == "slashpage"
    assert plain.content_type_norm == "html"
    assert plain.status_code == 200
    redirect = caps.filter(F.col("url") == "http://example.org/old").first()
    assert redirect.redirect_to_norm == "http://example.org/new/place"


def test_capture_url_truncation(spark):
    from webarchive_discovery_spark.sources.warc import WARC_RECORD_SCHEMA

    long_url = "http://example.org/" + "a" * 3000
    row = {f.name: None for f in WARC_RECORD_SCHEMA.fields}
    row.update(source_file="f", record_offset=0, record_type="response",
               warc_date="2024-01-01T00:00:00Z", target_uri=long_url,
               content_type="text/html", payload="x" * 10)
    df = spark.createDataFrame([tuple(row[f.name] for f in WARC_RECORD_SCHEMA.fields)],
                               WARC_RECORD_SCHEMA)
    cap = extract_capture(df).first()
    assert len(cap.url) == 2000  # FieldAdjuster URL truncation


def test_extract_capture_with_analysers(spark):
    """Full WARCIndexer.extract() analog: record scan → canonicalize +
    link analyser + Tika-lite → one capture projection."""
    from webarchive_discovery_spark.sources.warc import WARC_RECORD_SCHEMA

    html = ('<html><head><title>T1 &amp; Co</title>'
            '<meta name="author" content="Ann"></head>'
            '<body><a href="http://other.net/x">l</a><p>Para one.</p></body></html>')
    row = {f.name: None for f in WARC_RECORD_SCHEMA.fields}
    row.update(source_file="f", record_offset=0, record_type="response",
               warc_date="2024-01-01T00:00:00Z", target_uri="http://example.org/p",
               content_type="text/html", http_content_type="text/html",
               http_status="200", payload=html)
    df = spark.createDataFrame([tuple(row[f.name] for f in WARC_RECORD_SCHEMA.fields)],
                               WARC_RECORD_SCHEMA)
    cap = __import__("webarchive_discovery_spark.schema_capture", fromlist=["x"]) \
        .extract_capture(df, with_links=True, with_metadata=True).first()
    assert cap.title == "T1 & Co"
    assert cap.author == ["Ann"]
    assert cap.links == ["http://other.net/x"]
    assert cap.links_hosts == ["other.net"]
    assert cap.content == "l Para one."  # head stripped, tags stripped, anchor text kept
    assert cap.content_type_norm == "html"


def test_first_bytes_fields(spark):
    """FirstBytesAnalyser.java:84-98: content_ffb = hex of first 4 bytes,
    content_first_bytes = space-separated lowercase hex pairs of the first
    32 bytes; both omitted when fewer than 4 bytes are available; the head
    is measured in encoded bytes, not characters."""
    from webarchive_discovery_spark.sources.warc import WARC_RECORD_SCHEMA

    def _cap(payload):
        row = {f.name: None for f in WARC_RECORD_SCHEMA.fields}
        row.update(source_file="f", record_offset=0, record_type="response",
                   warc_date="2024-01-01T00:00:00Z", target_uri="http://e.org/",
                   content_type="text/html", payload=payload)
        df = spark.createDataFrame(
            [tuple(row[f.name] for f in WARC_RECORD_SCHEMA.fields)], WARC_RECORD_SCHEMA)
        return extract_capture(df).first()

    cap = _cap("GIF89a-and-then-some-more-content-beyond-32-bytes")
    assert cap.content_ffb == "47494638"  # G I F 8
    assert cap.content_first_bytes.split(" ")[:4] == ["47", "49", "46", "38"]
    assert len(cap.content_first_bytes.split(" ")) == 32  # capped at 32 bytes

    # multi-byte chars: head counts BYTES (2 chars = 4 bytes here)
    multi = _cap("éé")  # é = c3 a9 in UTF-8
    assert multi.content_ffb == "c3a9c3a9"

    short = _cap("abc")  # 3 bytes < 4 → reference skips the fields
    assert short.content_ffb is None and short.content_first_bytes is None


def test_first_bytes_binary_magic(spark, tmp_path):
    """content_ffb must come from RAW payload bytes: a JPEG head (ff d8 ff e0)
    survives even though the text column lossily decodes it to U+FFFD."""
    body = bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"\x00\x10JFIF\x00" + b"\x01" * 20
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n" + body)
    rec = _warc_record("http://img.example.org/x.jpg", http)
    d = tmp_path / "wm"
    d.mkdir()
    (d / "m.warc").write_bytes(rec)
    records = warc_records(read_binary_files(spark, str(d)))
    cap = extract_capture(records).first()
    assert cap.content_ffb == "ffd8ffe0"
    assert cap.content_first_bytes.startswith("ff d8 ff e0 00 10 4a 46 49 46")


def test_arc_malformed_header_resync(spark, tmp_path):
    """One ARC record with a space in its URL (malformed header) yields ONE
    parse_error row and the parser resyncs at the next valid header — the
    body is never re-parsed line-by-line as headers."""
    good1 = _http(b"<html>ok1</html>")
    bad_body = _http(b"line one\nline two\nline three\n")
    good2 = _http(b"<html>ok2</html>")
    arc = (
        b"filedesc://t.arc 0.0.0.0 20080430204825 text/plain 3\nv1\n\n"
        + b"http://a.org/ok1 1.2.3.4 20080430204825 text/html "
        + str(len(good1)).encode() + b"\n" + good1 + b"\n"
        # URL contains a space -> 6 fields -> framing lost
        + b"http://a.org/has space.html 1.2.3.4 20080430204826 text/html "
        + str(len(bad_body)).encode() + b"\n" + bad_body + b"\n"
        + b"http://a.org/ok2 1.2.3.4 20080430204827 text/html "
        + str(len(good2)).encode() + b"\n" + good2 + b"\n"
    )
    d = tmp_path / "arcs"
    d.mkdir()
    (d / "t.arc").write_bytes(arc)
    rows = warc_records(read_binary_files(spark, str(d))).collect()
    errs = [r for r in rows if r.parse_error is not None]
    ok = {r.target_uri for r in rows if r.parse_error is None}
    assert len(errs) == 1  # exactly one error row, not a flood
    assert "http://a.org/ok1" in ok and "http://a.org/ok2" in ok


def test_analysers_mime_gated(spark):
    """HTMLAnalyser.shouldProcess gate (HTMLAnalyser.java:94-100): the link
    and metadata kernels never see non-text payloads — no links/title
    fabricated from tag-like bytes inside a binary record."""
    from webarchive_discovery_spark.sources.warc import WARC_RECORD_SCHEMA

    def _row(ctype, payload):
        row = {f.name: None for f in WARC_RECORD_SCHEMA.fields}
        row.update(source_file="f", record_offset=0, record_type="response",
                   warc_date="2024-01-01T00:00:00Z", target_uri="http://e.org/p",
                   content_type=ctype, http_content_type=ctype, payload=payload)
        return tuple(row[f.name] for f in WARC_RECORD_SCHEMA.fields)

    html = '<html><title>T</title><a href="/x">l</a></html>'
    df = spark.createDataFrame(
        [_row("text/html", html), _row("application/octet-stream", html)],
        WARC_RECORD_SCHEMA)
    caps = {r.content_type: r for r in
            extract_capture(df, with_links=True, with_metadata=True).collect()}
    assert caps["text/html"].links == ["http://e.org/x"]
    assert caps["text/html"].title == "T"
    binary = caps["application/octet-stream"]
    assert binary.links == [] and binary.title is None and binary.content is None


def test_capture_image_analysis_composition(spark, tmp_path):
    """with_images runs the image analyser over image-MIME records inside
    the capture projection (the FaceDetectionAnalyser slot): a PNG response
    fills dims/dominant-colour/faces; text records stay null; and the flag
    demands the raw-bytes column."""
    import numpy as np
    import pytest

    from webarchive_discovery_spark.functions.imaging import encode_image
    from webarchive_discovery_spark.sources.warc import read_binary_files, warc_records

    img = np.zeros((20, 30, 3), np.uint8)
    img[:, :, 2] = 255
    img[5:13, 5:13] = (224, 160, 128)
    img[7, 7] = img[7, 10] = (90, 64, 51)   # eyes — the trained verifier
    img[10, 7:11] = (90, 64, 51)            # mouth — demands face structure
    png = encode_image(img, "png")

    def http(body, ctype):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body)

    def rec(uri, body):
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:1>\r\n"
            f"WARC-Date: 2024-01-02T03:04:05Z\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"

    warc = rec("http://a.org/pic.png", http(png, b"image/png")) + rec(
        "http://a.org/page.html", http(b"<html>x</html>", b"text/html")
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "img.warc").write_bytes(warc)

    records = warc_records(read_binary_files(spark, str(d)), keep_binary=True)
    caps = {r.url: r for r in extract_capture(records, with_images=True).collect()}
    pic = caps["http://a.org/pic.png"]
    assert (pic.image_width, pic.image_height, pic.image_size) == (30, 20, 600)
    assert pic.image_dominant_colour == "blue"
    assert pic.image_faces == ["human@xywh=5,5,8,8"]
    assert pic.image_faces_count == 1
    page = caps["http://a.org/page.html"]
    assert page.image_width is None and page.image_faces is None

    no_bytes = warc_records(read_binary_files(spark, str(d)))  # keep_binary off
    with pytest.raises(ValueError, match="payload_bytes"):
        extract_capture(no_bytes.drop("payload_bytes"), with_images=True)
