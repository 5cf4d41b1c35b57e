"""WARC source plumbing: binaryFile scan, record iteration with per-record
error recovery, whole-file hashing."""

import gzip
import hashlib

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
