"""spark-submit CLI surface: index / cdx / crawl subcommands end-to-end
(WARCIndexerCommand / ArchiveCDXGenerator analogs; north-rule crawl job)."""

import glob
import gzip
import json

import pytest

from webarchive_discovery_spark.cli import main


def _http(body: bytes, status: bytes = b"200 OK", ctype: bytes = b"text/html") -> bytes:
    return (b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype + b"\r\n\r\n" + body)


def _warc_record(uri: str, http: bytes, rtype: str = "response") -> bytes:
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)) & 0xFFFF}>\r\n"
        f"WARC-Date: 2024-03-05T06:07:08Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype={rtype}\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_warcs")
    first = _warc_record("http://zeta.example.org/page", _http(b"<html><a href='/x'>l</a></html>"))
    # an interleaved request record: excluded from CDX lines, but its offset
    # still bounds the previous response's compressed_length
    req = _warc_record("http://zeta.example.org/page", b"GET /page HTTP/1.1\r\n\r\n",
                       rtype="request")
    recs = (
        first + req
        + _warc_record("http://alpha.example.org/", _http(b"<html>root</html>"))
        + _warc_record("http://alpha.example.org/dup", _http(b"x", status=b"404 NF"))
    )
    (d / "test.warc").write_bytes(recs)
    return str(d), len(first)


def test_cli_index_parquet(spark, warc_dir, tmp_path, capsys):
    out = str(tmp_path / "caps")
    assert main(["index", "-i", warc_dir[0], "-o", out, "--links",
                 "--institution", "UKWA", "-n", "Spring 2024", "-u", "c77"]) == 0
    caps = spark.read.parquet(out)
    rows = {r.url: r for r in caps.collect()}
    any_row = next(iter(rows.values()))
    assert any_row.institution == "UKWA"
    assert any_row.collection == ["Spring 2024"] and any_row.collection_id == "c77"
    # 404 dropped by the response-code filter (reference guard chain)
    assert set(rows) == {"http://zeta.example.org/page", "http://alpha.example.org/"}
    assert rows["http://zeta.example.org/page"].links == ["http://zeta.example.org/x"]
    assert rows["http://alpha.example.org/"].url_type == "slashpage"
    assert json.loads(capsys.readouterr().out)["job"] == "index"


def test_cli_index_slash_xml_gzip(warc_dir, tmp_path, capsys):
    out = str(tmp_path / "xml")
    assert main(["index", "-i", warc_dir[0], "-o", out, "-F", "xml", "-z",
                 "-r", "--no-text"]) == 0
    files = glob.glob(out + "/part-*.gz")
    assert files
    text = "".join(gzip.open(f, "rt").read() for f in files)
    assert "alpha.example.org" in text and "zeta" not in text  # -r: slash only
    assert '<field name="content">' not in text  # --no-text
    for f in files:
        lines = gzip.open(f, "rt").read().splitlines()
        if len(lines) > 2:
            assert lines[0] == "<add>" and lines[-1] == "</add>"


def test_cli_cdx(spark, warc_dir, tmp_path, capsys):
    path, first_len = warc_dir
    out = str(tmp_path / "cdx")
    assert main(["cdx", "-i", path, "-o", out, "-p", "1"]) == 0
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        lines += open(f).read().splitlines()
    # 404 is NOT junk-filtered in CDX (junk filter is mime/type-based); the
    # request record emits no line; sorted by SURT key: alpha before zeta
    assert len(lines) == 3
    assert lines == sorted(lines)
    first = lines[0].split(" ")
    assert len(first) == 11
    assert first[0].startswith("(org,example,alpha,")
    assert first[1] == "20240305060708"
    # compressed_length (field S, index 8) of the FIRST response spans only
    # to the excluded request record's offset, not across it
    zeta = [l.split(" ") for l in lines if l.startswith("(org,example,zeta,")]
    assert zeta and int(zeta[0][8]) == first_len


def test_cli_crawl_synthetic(spark, tmp_path, capsys):
    out = str(tmp_path / "log")
    assert main(["crawl", "--synthetic", "400", "--epochs", "2",
                 "--host-budget", "50", "-o", out]) == 0
    metrics = [json.loads(l) for l in capsys.readouterr().out.splitlines()
               if l.startswith("{")]
    assert len(metrics) == 2 and all(m["job"] == "crawl" for m in metrics)
    log = spark.read.parquet(out)
    assert log.count() > 0


def test_cli_index_memento_and_datasets(spark, warc_dir, tmp_path, capsys):
    out = str(tmp_path / "mem")
    ds = str(tmp_path / "ds")
    assert main(["index", "-i", warc_dir[0], "-o", out, "-F", "memento",
                 "-z", "--links", "--datasets", ds]) == 0
    lines = []
    for f in glob.glob(f"{out}/part-*.txt.gz"):
        with gzip.open(f, "rt") as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    # request + 404 records are dropped by the default chain (record-type,
    # response-code startswith "2")
    assert len(lines) == 2
    by_url = {d["url"]: d for d in lines}
    zeta = by_url["http://zeta.example.org/page"]
    assert zeta["record_type"] == "response"
    assert zeta["wayback_date"] == 20240305060708
    assert "links_hosts" in zeta and zeta["links_hosts"] == ["zeta.example.org"]
    # datasets directory layout: hosts + formats + hostLinks present
    host_parts = glob.glob(f"{ds}/dataset=hosts/year=2024/*.txt.gz")
    assert host_parts
    hosts = []
    for f in host_parts:
        with gzip.open(f, "rt") as fh:
            hosts += [l.rstrip("\n") for l in fh if l.strip()]
    assert sorted(hosts) == ["alpha.example.org\t1", "zeta.example.org\t1"]
    assert glob.glob(f"{ds}/dataset=hostLinks/year=2024/*.txt.gz")
