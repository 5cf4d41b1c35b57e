"""Sink semantics: JSONL/multi-file/text writers and the batched push sink
(batch boundaries, 3-strikes poison-batch drop)."""

import glob
import gzip
import json
import os

from webarchive_discovery_spark.operators.sinks import (
    batched_foreach_sink,
    write_jsonl,
    write_multi_file,
    write_text_lines,
)


def test_write_jsonl_gzip(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "concat('v', id) as v")
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out, gzip_output=True)
    files = glob.glob(out + "/*.json.gz")
    assert files
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(10))


def test_write_multi_file_partitions(spark, tmp_path):
    df = spark.range(20).selectExpr("id", "concat('src', id % 3) as source_file")
    out = str(tmp_path / "multi")
    write_multi_file(df, out, "source_file")
    assert sorted(os.listdir(out) + []).count("source_file=src0") == 1


def test_write_text_lines(spark, tmp_path):
    df = spark.range(5).selectExpr("concat('line-', id) as cdx")
    out = str(tmp_path / "text")
    write_text_lines(df, "cdx", out, gzip_output=False)
    lines = []
    for f in glob.glob(out + "/part-*"):
        lines += open(f).read().splitlines()
    assert sorted(lines) == [f"line-{i}" for i in range(5)]


def test_batched_sink_batching_and_poison_drop(spark, tmp_path):
    """DEFAULT 3-strikes semantics (WARCIndexerReducer.java:217-260): the
    poison batch is retried in-process exactly max_consecutive_failures
    times, then dropped; the task never aborts, so every other batch is sent
    exactly once."""
    log_dir = str(tmp_path / "sent")
    attempts_dir = str(tmp_path / "attempts")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(attempts_dir, exist_ok=True)

    def send(batch):
        if any(row["id"] == 7 for row in batch):
            n = len(os.listdir(attempts_dir))
            open(os.path.join(attempts_dir, f"a{n}"), "w").close()
            raise RuntimeError("endpoint rejects poison batch")
        with open(os.path.join(log_dir, f"b{os.getpid()}_{len(os.listdir(log_dir))}"), "w") as f:
            f.write("\n".join(str(row["id"]) for row in batch))

    df = spark.range(20).coalesce(1)
    batched_foreach_sink(df, send, batch_size=5)  # defaults: 3 strikes
    sent = []
    for f in glob.glob(log_dir + "/*"):
        sent += [int(x) for x in open(f).read().splitlines()]
    # the batch containing id=7 (5..9) was retried 3x then dropped; others sent
    assert len(os.listdir(attempts_dir)) == 3
    assert 7 not in sent
    assert sorted(sent) == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19]


def test_batched_sink_on_drop_and_recovery(spark, tmp_path):
    """After a drop the failure counter stays hot (reference behavior): the
    next failing batch drops immediately; a success resets the counter."""
    drops = str(tmp_path / "drops")
    os.makedirs(drops, exist_ok=True)

    def send(batch):
        if any(row["id"] in (2, 4) for row in batch):
            raise RuntimeError("reject")

    def on_drop(batch):
        with open(os.path.join(drops, f"d{len(os.listdir(drops))}"), "w") as f:
            f.write(",".join(str(r["id"]) for r in batch))

    df = spark.range(6).coalesce(1)  # batches: [0,1] [2,3] [4,5]
    batched_foreach_sink(df, send, batch_size=2, on_drop=on_drop)
    dropped = sorted(open(os.path.join(drops, d)).read() for d in os.listdir(drops))
    assert dropped == ["2,3", "4,5"]


def test_solr_doc_xml_escaping_and_arrays(spark):
    """Solr add-doc rendering (SingleFileDocumentConsumer.java:101-148 /
    ClientUtils.toXML): one <field> per value, one element per array entry,
    &<> escaped, null fields omitted."""
    from webarchive_discovery_spark.operators.sinks import solr_doc_xml

    df = spark.createDataFrame(
        [("a<b>&c", ["x", "y&z"], None)],
        "title string, links array<string>, author string",
    )
    line = df.select(solr_doc_xml(df).alias("x")).first().x
    assert line == (
        '<doc><field name="title">a&lt;b&gt;&amp;c</field>'
        '<field name="links">x</field><field name="links">y&amp;z</field>'
        "</doc>"
    )


def test_write_xml_add_wrapper(spark, tmp_path):
    """Every part file is a complete <add>…</add> document (the reference's
    1-file-per-WARC contract, SingleFileDocumentConsumer.java:138,148)."""
    from webarchive_discovery_spark.operators.sinks import write_xml

    df = spark.range(6).selectExpr("cast(id as string) as id").repartition(2)
    out = str(tmp_path / "xml")
    write_xml(df, out)
    files = glob.glob(out + "/part-*")
    assert len(files) == 2
    ids = []
    for f in files:
        lines = open(f).read().splitlines()
        assert lines[0] == "<add>" and lines[-1] == "</add>"
        ids += [l for l in lines[1:-1]]
    assert sorted(ids) == sorted(
        f'<doc><field name="id">{i}</field></doc>' for i in range(6)
    )


# ---------------------------------------------------------------------------
# Memento JSONL output (SolrRecord.toMemento + --jsonl reducer path)
# ---------------------------------------------------------------------------

def test_memento_jsonl_from_captures(spark, tmp_path):
    import glob
    import gzip
    import json

    from pyspark.sql import functions as F

    from webarchive_discovery_spark import schema_capture
    from webarchive_discovery_spark.operators import memento

    raw = spark.createDataFrame(
        [("f.warc", 0, "response", "<urn:uuid:1>", "2024-03-04T05:06:07Z",
          "http://www.Example.org/a/b.html", "application/http; msgtype=response",
          1024, "digest1", "200", "text/html", None, None, "hello body", None)],
        "source_file string, record_offset long, record_type string, "
        "warc_record_id string, warc_date string, target_uri string, "
        "content_type string, content_length long, payload_digest string, "
        "http_status string, http_content_type string, http_server string, "
        "redirect_location string, payload string, parse_error string",
    )
    caps = schema_capture.extract_capture(raw)
    out = str(tmp_path / "jsonl")
    memento.write_memento_jsonl(caps, out)
    lines = []
    for f in glob.glob(f"{out}/part-*.txt.gz"):
        with gzip.open(f, "rt") as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == 1
    doc = lines[0]
    # snake_case Memento property names; single-string host_surt takes the
    # FIRST multi-valued entry (getFieldAsString)
    assert doc["url"] == "http://www.Example.org/a/b.html"
    assert doc["url_norm"] == "http://example.org/a/b.html"
    assert doc["host_surt"] == "(org,"
    assert doc["crawl_date"] == "2024-03-04T05:06:07Z"
    assert doc["wayback_date"] == 20240304050607
    assert doc["content_type_norm"] == "html"
    assert doc["status_code"] == 200
    assert doc["record_type"] == "response"
    # null fields serialize as EXPLICIT null (reference Memento.toJSON uses
    # a plain Jackson ObjectMapper, Include.ALWAYS): every declared property
    # is present on every line, including the never-populated ones
    assert doc["image_faces"] is None
    assert doc["content_fuzzy_hash"] is None
    assert "category" in doc and doc["category"] is None
    assert "comments" in doc and doc["comments"] is None
    assert "image_colours" in doc and doc["image_colours"] is None


def test_memento_fuzzy_hash_reformat(spark):
    from webarchive_discovery_spark.operators import memento

    df = spark.createDataFrame(
        [("a", "SIG1", "SIG2", "b.html"), ("b", None, "SIG2", "c.html")],
        "id string, ssdeep_hash_bs_3 string, ssdeep_hash_bs_6 string, resourcename string",
    )
    got = {r.id: r.content_fuzzy_hash for r in memento.to_memento(df).collect()}
    assert got["a"] == "3:SIG1:SIG2:b.html"
    assert got["b"] is None  # both signatures required (reformatSsdeep)


def test_wet_roundtrip_through_warc_parser(spark, tmp_path):
    """WET serializer ↔ WARC parser round trip: records written by
    wet_record_lines/write_wet must parse back through the engine's own
    archive record reader with type 'conversion', byte-exact multi-byte
    text, and the stated Content-Length."""
    import glob
    import gzip

    from pyspark.sql import functions as F

    from webarchive_discovery_spark.operators.wet import wet_record_lines, write_wet
    from webarchive_discovery_spark.sources.warc import _parse_archive

    caps = spark.createDataFrame(
        [(i, f"http://h{i}.example.org/p/{i}", "2024-03-04T05:06:07Z",
          f"<urn:uuid:w{i}>", f"Resumé of page {i} — done.") for i in range(4)],
        "i long, url string, warc_date string, warc_record_id string, text string",
    )
    lines = wet_record_lines(caps)
    blob = "".join(r["wet_record"] for r in
                   lines.orderBy("i").select("wet_record").collect())
    rows = list(_parse_archive("roundtrip.wet", blob.encode("utf-8"), 65536, False))
    assert len(rows) == 4
    for i, r in enumerate(rows):
        assert r["record_type"] == "conversion"
        assert r["payload"] == f"Resumé of page {i} — done."
        assert r["content_length"] == len(r["payload"].encode("utf-8"))
        assert r["target_uri"] == f"http://h{i}.example.org/p/{i}"

    out = str(tmp_path / "wet")
    write_wet(caps, out)
    files = glob.glob(f"{out}/part-*.txt.gz")
    assert files
    joined = b"".join(gzip.open(f, "rb").read() for f in sorted(files))
    assert b"WARC-Type: conversion" in joined
