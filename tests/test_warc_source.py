"""WARC source plumbing: binaryFile scan, record iteration with per-record
error recovery, whole-file hashing."""

import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.sources.warc import (
    hash_files,
    read_binary_files,
    warc_records,
)


def _warc_record(uri: str, body: bytes, rtype: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{hash(uri) & 0xFFFF}>\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    plain = _warc_record("http://example.org/", b"<html>hello</html>") + _warc_record(
        "http://example.org/2", b"<html>two</html>"
    )
    (d / "a.warc").write_bytes(plain)
    (d / "b.warc.gz").write_bytes(gzip.compress(plain))
    (d / "broken.warc").write_bytes(b"NOT A WARC\r\n\r\n")
    (d / "empty.warc").write_bytes(b"")
    return str(d)


def test_binary_scan_skips_empty(spark, warc_dir):
    files = read_binary_files(spark, warc_dir, glob="*.warc*")
    paths = [r["path"] for r in files.select("path").collect()]
    assert len(paths) == 3  # empty file skipped
    assert not any(p.endswith("empty.warc") for p in paths)


def test_record_iteration_and_error_recovery(spark, warc_dir):
    recs = warc_records(read_binary_files(spark, warc_dir, glob="*.warc*"))
    rows = recs.collect()
    good = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(good) == 4  # 2 records × (plain + gzip)
    assert len(bad) == 1  # broken file → error row, not task failure
    r = good[0]
    assert r["record_type"] == "response"
    assert r["http_status"] == "200"
    assert "hello" in r["payload"] or "two" in r["payload"]
    assert r["target_uri"].startswith("http://example.org/")


def test_hash_files_matches_hashlib(spark, warc_dir, tmp_path):
    files = read_binary_files(spark, warc_dir, glob="a.warc")
    row = hash_files(files, bits=512).collect()[0]
    raw = open(row["path"].replace("file:", ""), "rb").read()
    assert row["digest"] == hashlib.sha512(raw).hexdigest()


def test_compression_matrix_sentinel(spark, tmp_path):
    """The reference's compression-matrix golden
    (``WARCIndexerTest.java:248-288``): every Content-Encoding in
    {none, gzip, br} inside every container in {.warc, .warc.gz} must
    surface the sentinel phrase in the parsed payload.  The brotli leg runs
    on the vendored RFC 7932 uncompressed-metablock codec
    (``functions/brotli_lite.py``); a native wheel is preferred when
    installed."""
    from webarchive_discovery_spark.functions import brotli_lite

    sentinel = "Jingle jangle morning rain"
    body = f"<html><body>{sentinel}</body></html>".encode()

    def record(uri, payload, encoding=None):
        enc_hdr = f"Content-Encoding: {encoding}\r\n" if encoding else ""
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n{enc_hdr}"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload
        headers = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)) & 0xFFFF}>\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return headers + http + b"\r\n\r\n"

    plain = (
        record("http://m.example.org/none", body)
        + record("http://m.example.org/gzip", gzip.compress(body, mtime=0), "gzip")
        + record("http://m.example.org/br",
                 brotli_lite.compress_uncompressed(body), "br")
    )
    d = tmp_path / "matrix"
    d.mkdir()
    (d / "m.warc").write_bytes(plain)
    (d / "m.warc.gz").write_bytes(gzip.compress(plain))

    recs = warc_records(read_binary_files(spark, str(d), glob="*.warc*"))
    rows = recs.collect()
    good = [r for r in rows if r["parse_error"] is None]
    assert len(good) == 6  # 3 encodings x 2 containers
    for r in good:
        assert sentinel in r["payload"], (r["target_uri"], r["payload"][:80])


_REF_COMPRESSION = "/root/reference/warc-indexer/src/test/resources/compression"


@pytest.mark.skipif(
    not os.path.isdir(_REF_COMPRESSION),
    reason="reference fixture tree not mounted",
)
def test_compression_matrix_reference_fixtures(spark):
    """Run the reference's actual compression fixtures
    (``WARCIndexerTest.java:248-288``) through the scan: all six
    {none,gzip,brotli} x {.warc,.warc.gz} files must surface
    "Extremely simple webpage".  The brotli files carry *real*
    encoder output (compressed metablocks + dictionary references), so
    this leg needs a native decoder tier — the ``brotli`` wheel or the
    ctypes ``libbrotlidec`` binding — and is skipped on hosts with
    neither."""
    from webarchive_discovery_spark.functions import brotli_native

    try:
        import brotli  # noqa: F401

        have_native = True
    except ImportError:
        have_native = brotli_native.available()
    if not have_native:
        pytest.skip("no native brotli decoder on this host")

    sentinel = "Extremely simple webpage"
    recs = warc_records(
        read_binary_files(spark, _REF_COMPRESSION, glob="*.warc*"))
    rows = [r for r in recs.collect() if r["record_type"] == "response"]
    by_uri_enc = {}
    for r in rows:
        assert r["parse_error"] is None
        assert sentinel in r["payload"], (r["target_uri"], r["payload"][:80])
        by_uri_enc[r["target_uri"]] = True
    # 6 files x 1 response each
    assert len(rows) == 6
