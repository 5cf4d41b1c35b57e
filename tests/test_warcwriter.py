"""WARC writer (operators/warcwriter.py): framing, binary payload safety,
deterministic ids, and the full write→read round-trip through the engine's
own WARC parser."""

import glob
import gzip
import os

from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import warcwriter as W
from webarchive_discovery_spark.sources import warc as warcsrc

SCHEMA = (
    "url string, warc_date string, status_code int, "
    "content_type_served string, payload_bytes binary"
)


def _caps(spark):
    return spark.createDataFrame(
        [
            (
                "http://a.example.org/x",
                "2024-05-06T07:08:09Z",
                200,
                "text/html",
                "hullo — page".encode(),  # multi-byte
            ),
            (
                "http://a.example.org/img",
                "2024-05-06T07:08:10Z",
                200,
                "image/png",
                bytes([137, 80, 78, 71, 0, 255, 254, 10, 13, 26]),  # raw binary
            ),
            (
                "http://a.example.org/gone",
                "2024-05-06T07:08:11Z",
                404,
                None,
                None,  # null payload → zero-length body
            ),
        ],
        SCHEMA,
    )


def test_framing_and_octet_lengths(spark):
    rec = bytes(
        W.warc_response_records(_caps(spark)).filter(
            F.col("url") == "http://a.example.org/x"
        ).collect()[0]["warc_record"]
    )
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert head.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    # WARC Content-Length is the octet length of the remaining HTTP block
    warc_len = int(
        [l for l in head.split(b"\r\n") if l.startswith(b"Content-Length:")][0]
        .split(b":")[1]
    )
    assert rest == rec[len(head) + 4 :]
    assert warc_len == len(rest) - 4  # trailing CRLF CRLF excluded
    http_head, _, body = rest.partition(b"\r\n\r\n")
    assert http_head.startswith(b"HTTP/1.1 200 OK\r\n")
    http_len = int(
        [l for l in http_head.split(b"\r\n") if l.startswith(b"Content-Length:")][0]
        .split(b":")[1]
    )
    assert body[:-4] == "hullo — page".encode()
    assert http_len == len("hullo — page".encode())  # octets, not chars


def test_record_id_deterministic(spark):
    a = W.warc_response_records(_caps(spark)).select("warc_record").collect()
    b = W.warc_response_records(_caps(spark)).select("warc_record").collect()
    assert sorted(bytes(r[0]) for r in a) == sorted(bytes(r[0]) for r in b)


def test_null_payload_and_reason_ladder(spark):
    rec = bytes(
        W.warc_response_records(_caps(spark)).filter(
            F.col("status_code") == 404
        ).collect()[0]["warc_record"]
    )
    assert b"HTTP/1.1 404 Not Found\r\n" in rec
    assert b"Content-Type: application/octet-stream\r\n" in rec  # null served type
    assert b"Content-Length: 0\r\n\r\n\r\n\r\n" in rec  # empty body framing


def test_write_and_roundtrip_through_own_parser(spark, tmp_path):
    out_dir = str(tmp_path / "warcs")
    recs = W.warc_response_records(_caps(spark)).repartition(2)
    manifest = W.write_warc(recs, out_dir).collect()
    assert sum(m["n_records"] for m in manifest) == 3
    files = sorted(glob.glob(os.path.join(out_dir, "*.warc.gz")))
    assert files == sorted(m["file"] for m in manifest)
    # multi-member gzip: stdlib inflates all members
    raw = gzip.decompress(open(files[0], "rb").read())
    assert raw.startswith(b"WARC/1.0\r\n")

    parsed = warcsrc.warc_records(
        warcsrc.read_binary_files(spark, out_dir, glob="*.warc.gz"),
        keep_binary=True,
    )
    rows = {r["target_uri"]: r for r in parsed.collect()}
    assert not any(r["parse_error"] for r in rows.values()), [
        r["parse_error"] for r in rows.values()
    ]
    assert rows["http://a.example.org/x"]["http_status"] == "200"
    assert rows["http://a.example.org/x"]["payload"] == "hullo — page"
    assert bytes(rows["http://a.example.org/img"]["payload_bytes"]) == bytes(
        [137, 80, 78, 71, 0, 255, 254, 10, 13, 26]
    )
    assert rows["http://a.example.org/gone"]["http_status"] == "404"
    assert rows["http://a.example.org/gone"]["payload"] == ""


def test_no_python_udf_in_record_assembly(spark):
    plan = (
        W.warc_response_records(_caps(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_request_records_pair_with_responses(spark):
    df = W.warc_request_records(_caps(spark)).filter(
        F.col("url") == "http://a.example.org/x"
    )
    rec = bytes(df.collect()[0]["warc_request"])
    assert b"WARC-Type: request\r\n" in rec
    assert b"GET /x HTTP/1.1\r\nHost: a.example.org\r\n" in rec
    # Concurrent-To equals the RESPONSE's deterministic id
    resp = bytes(
        W.warc_response_records(_caps(spark)).filter(
            F.col("url") == "http://a.example.org/x"
        ).collect()[0]["warc_record"]
    )
    resp_id = [
        l for l in resp.split(b"\r\n") if l.startswith(b"WARC-Record-ID:")
    ][0].split(b": ")[1]
    conc = [
        l for l in rec.split(b"\r\n") if l.startswith(b"WARC-Concurrent-To:")
    ][0].split(b": ")[1]
    req_id = [
        l for l in rec.split(b"\r\n") if l.startswith(b"WARC-Record-ID:")
    ][0].split(b": ")[1]
    assert conc == resp_id and req_id != resp_id


def test_warcinfo_heads_each_file(spark, tmp_path):
    out_dir = str(tmp_path / "warcs2")
    recs = W.warc_response_records(_caps(spark)).coalesce(1)
    W.write_warc(
        recs, out_dir,
        info_fields={"software": "webarchive-discovery-spark", "format": "WARC/1.0"},
        info_date="2024-05-06T00:00:00Z",
    ).collect()
    parsed = warcsrc.warc_records(
        warcsrc.read_binary_files(spark, out_dir, glob="*.warc.gz")
    ).collect()
    assert not any(r["parse_error"] for r in parsed)
    kinds = sorted(r["record_type"] for r in parsed)
    assert kinds.count("warcinfo") == 1 and kinds.count("response") == 3
    info = [r for r in parsed if r["record_type"] == "warcinfo"][0]
    assert "software: webarchive-discovery-spark" in info["payload"]
    assert info["warc_date"] == "2024-05-06T00:00:00Z"


def test_revisit_records(spark):
    dups = spark.createDataFrame(
        [
            (
                "http://a.example.org/copy",
                "2024-05-07T00:00:00Z",
                "http://a.example.org/x",
                "2024-05-06T07:08:09Z",
                "sha1:ABCDEF",
            )
        ],
        "url string, warc_date string, refers_to_url string, "
        "refers_to_date string, payload_digest string",
    )
    rec = bytes(W.warc_revisit_records(dups).collect()[0]["warc_revisit"])
    assert b"WARC-Type: revisit\r\n" in rec
    assert b"identical-payload-digest" in rec
    assert b"WARC-Payload-Digest: sha1:ABCDEF\r\n" in rec
    assert b"Content-Length: 0\r\n\r\n\r\n\r\n" in rec
    # Refers-To reconstructs the ORIGINAL response's deterministic id
    resp = bytes(
        W.warc_response_records(_caps(spark)).filter(
            F.col("url") == "http://a.example.org/x"
        ).collect()[0]["warc_record"]
    )
    resp_id = [
        l for l in resp.split(b"\r\n") if l.startswith(b"WARC-Record-ID:")
    ][0].split(b": ")[1]
    refers = [
        l for l in rec.split(b"\r\n") if l.startswith(b"WARC-Refers-To:")
    ][0].split(b": ")[1]
    assert refers == resp_id
    # and the record round-trips through the parser
    parsed = warcsrc._parse_warc_stream("t", rec)
    rows = list(parsed)
    assert len(rows) == 1 and rows[0]["record_type"] == "revisit"
    assert rows[0].get("parse_error") is None


def test_atomic_commit_no_partial_files(spark, tmp_path):
    """Tasks write to an attempt-id temp name and os.replace onto the final
    name only when the gzip stream is complete: a failing attempt (or a
    speculative twin losing the race) can never leave a half-written or
    interleaved .warc.gz, and no temp litter survives either outcome."""
    recs = W.warc_response_records(_caps(spark)).repartition(2)
    out_ok = str(tmp_path / "ok")
    W.write_warc(recs, out_ok).collect()
    assert glob.glob(os.path.join(out_ok, "*.warc.gz"))
    assert not glob.glob(os.path.join(out_ok, ".*.tmp"))

    # a null record byte column makes the task raise MID-STREAM
    bad = recs.withColumn(
        "warc_record",
        F.when(F.monotonically_increasing_id() >= 0, F.lit(None).cast("binary")),
    )
    out_bad = str(tmp_path / "bad")
    try:
        W.write_warc(bad, out_bad).collect()
        raised = False
    except Exception:
        raised = True
    assert raised
    # the failed attempts committed nothing and cleaned up their temps
    assert not glob.glob(os.path.join(out_bad, "*.warc.gz"))
    assert not glob.glob(os.path.join(out_bad, ".*.tmp"))
