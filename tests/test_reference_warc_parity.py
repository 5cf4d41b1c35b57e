"""End-to-end parity against the reference's flagship WARC fixture
(``IAH-urls-wget.warc.gz``) and its exact goldens from
``WARCIndexerTest.java``:

- ``testFilterBehaviourWithConfig`` (:219-236): the archive reader must
  surface exactly **36 records**;
- ``testFields`` (:313-372): the response record with id
  ``20131021215312/jbKtN3dWzLJzaIQxTyPCiA==`` must carry the exact
  ``links_hosts_surts`` (7 SURTs), ``host_surt`` (2 SURTs),
  ``url_path`` ``/`` and ``status_code`` ``200``.

This is the real crawl of archive.org the reference tests against — not
a synthetic fixture — so it exercises gzip container framing, request/
response pairs, real HTML link extraction, SURT generation, and the
record-id scheme (waybackDate/base64(md5(url))) together."""

import os

import pytest
from pyspark.sql import functions as F

from webarchive_discovery_spark.schema_capture import extract_capture
from webarchive_discovery_spark.sources.warc import read_binary_files, warc_records

_DIR = "/root/reference/warc-indexer/src/test/resources"
_FIXTURE = f"{_DIR}/IAH-urls-wget.warc.gz"
_RECORD_ID = "20131021215312/jbKtN3dWzLJzaIQxTyPCiA=="
_BLACKBOOK = f"{_DIR}/IAH-20080430204825-00000-blackbook-truncated.arc.gz"


@pytest.mark.skipif(not os.path.isfile(_FIXTURE), reason="reference not mounted")
def test_iah_urls_wget_goldens(spark):
    recs = warc_records(
        read_binary_files(spark, _DIR, glob="IAH-urls-wget.warc.gz"))
    all_rows = recs.collect()
    assert len(all_rows) == 36  # WARCIndexerTest.java:236
    assert all(r["parse_error"] is None for r in all_rows)

    responses = recs.filter(F.col("record_type") == "response")
    caps = extract_capture(responses, with_links=True)
    rows = caps.filter(F.col("id") == _RECORD_ID).collect()
    assert len(rows) == 1, "test record not found (WARCIndexerTest.java:371)"
    r = rows[0]
    assert r["url_path"] == "/"
    assert r["status_code"] == 200
    assert sorted(r["host_surt"]) == ["(org,", "(org,archive,"]
    assert sorted(r["links_hosts_surts"]) == [
        "(org,",
        "(org,archive,",
        "(org,archive,blog,",
        "(org,archive,web,",
        "(org,archive,web,faq,",
        "(org,openlibrary,",
        "(org,sloan,",
    ]


@pytest.mark.skipif(not os.path.isfile(_BLACKBOOK), reason="reference not mounted")
def test_blackbook_cdx11_golden_lines(spark):
    """Byte-for-byte CDX-11 parity with the reference on its blackbook ARC
    fixture (``DereferencingArchiveToCDXRecordReaderTest.java:83-95``):
    the robots.txt and collection-rss.php lines must come out EXACTLY as
    the reference's record reader emits them — same massaged urlkey, 14-digit
    timestamp, ARC-header mime, status, sha1-base32 digest, compressed
    member length (offset differencing, file-size tail), compressed member
    offset, and filename.  This pins the whole chain: gzip member framing,
    ARC v1 parsing, payload digesting, URL canonicalization, and the CDX
    projection."""
    from webarchive_discovery_spark.functions import dates as date_fns
    from webarchive_discovery_spark.functions.udfs import (
        canonicalise_url_udf,
        sha1_base32_udf,
    )
    from webarchive_discovery_spark.operators import cdx

    files = read_binary_files(
        spark, _DIR, glob="IAH-20080430204825-00000-blackbook-truncated.arc.gz")
    sizes = files.select(F.col("path").alias("source_path"),
                         F.col("length").alias("file_size"))
    recs = warc_records(files).join(
        sizes, F.col("source_file") == F.col("source_path"))

    ev = recs.filter(F.col("target_uri").startswith("http")).select(
        F.regexp_replace(canonicalise_url_udf(F.col("target_uri")),
                         "^https?://", "").alias("urlkey"),
        date_fns.wayback_date(F.to_timestamp(F.col("warc_date"))).alias("timestamp"),
        F.col("target_uri").alias("url"),
        F.col("content_type").alias("mime"),
        F.col("http_status").cast("int").alias("status_code"),
        F.regexp_replace(sha1_base32_udf(F.col("payload_digest")),
                         "^sha1:", "").alias("digest"),
        F.lit("-").alias("redirect"),
        F.lit("-").alias("meta"),
        "record_offset",
        F.element_at(F.split(F.col("source_file"), "/"), -1).alias("source_file"),
        "file_size",
    )
    projected = cdx.cdx_project(ev, "urlkey", "source_file", "record_offset",
                                file_size_col="file_size")
    lines = {r["url"]: r["cdx_line"]
             for r in cdx.cdx11_line(projected).collect()}

    assert lines["http://www.archive.org/robots.txt"] == (
        "archive.org/robots.txt 20080430204825 http://www.archive.org/robots.txt"
        " text/plain 200 SUCGMUVXDKVB5CS2NL4R4JABNX7K466U - - 523 776"
        " IAH-20080430204825-00000-blackbook-truncated.arc.gz")
    assert lines["http://www.archive.org/services/collection-rss.php"] == (
        "archive.org/services/collection-rss.php 20080430204830"
        " http://www.archive.org/services/collection-rss.php text/xml 200"
        " JXXJNHJX4GEM44C4NOM3RJWKMKVBIGHF - - 6965 11441"
        " IAH-20080430204825-00000-blackbook-truncated.arc.gz")


_TRUNC = f"{_DIR}/truncated_datetime.warc"


@pytest.mark.skipif(not os.path.isfile(_TRUNC), reason="reference not mounted")
def test_truncated_datetime_record_id(spark):
    """``WARCIndexerTest.testTruncatedTime`` (:291-310): a WARC-Date
    truncated to minutes keeps its raw 12 digits in the record id
    (``201908150102/+BV/tmv/tASHANg2c3/2MA==``) while crawl_date and
    wayback_date are padded to the same full instant.  The fixture's
    ``WARC-Target-URI: <url>`` form also pins the angle-bracket
    sanitisation (``Normalisation.sanitiseWARCHeaderValue``)."""
    recs = warc_records(
        read_binary_files(spark, _DIR, glob="truncated_datetime.warc"))
    caps = extract_capture(recs.filter(F.col("record_type") == "response"))
    r = caps.collect()[0]
    assert r["id"] == "201908150102/+BV/tmv/tASHANg2c3/2MA=="
    assert r["url"] == "http://tokemon.sb.statsbiblioteket.dk/"
    crawl_digits = "".join(c for c in str(r["crawl_date"]) if c.isdigit())
    assert crawl_digits == str(r["wayback_date"]) == "20190815010200"


@pytest.mark.skipif(not os.path.isfile(_FIXTURE), reason="reference not mounted")
def test_filter_chain_golden_counts(spark):
    """The reference's filter-behaviour goldens on IAH-urls-wget
    (``WARCIndexerTest.java:115-194``, all via the 36-record fixture;
    expectedNullCount → indexed = 36 − nulls):

    - protocol [http,https] + status ["2"] (reference.conf defaults) → 7
    - protocol [https] only → 2
    - url_exclude robots.txt → 6
    - response_include [] (status filter disabled) → 16
    - response_include ["2","3"] → 16
    - exclusion list http://www.archive.org/images (SURT-prefix tier) → 4
    """
    from webarchive_discovery_spark.functions.udfs import canonicalise_url_udf
    from webarchive_discovery_spark.operators import record_filters as rf

    recs = warc_records(
        read_binary_files(spark, _DIR, glob="IAH-urls-wget.warc.gz")).select(
        "record_type",
        F.col("target_uri").alias("url"),
        F.col("http_status").cast("int").alias("status_code"),
    ).localCheckpoint()
    assert recs.count() == 36

    def chain(protocols=("http", "https"), exclude=None, statuses=("2",)):
        out = rf.record_type_filter(recs)
        out = rf.protocol_filter(out, "url", protocols)
        out = rf.url_exclude_filter(out, "url", exclude)
        return rf.response_code_filter(out, "status_code", statuses)

    assert chain().count() == 36 - 29                              # 7
    assert chain(protocols=("https",)).count() == 36 - 34          # 2
    assert chain(exclude=r".*robots\.txt.*").count() == 36 - 30    # 6
    assert chain(statuses=()).count() == 36 - 20                   # 16
    assert chain(statuses=("2", "3")).count() == 36 - 20           # 16

    # exclusion tier: canonical-prefix match on the exclusion file's entry
    # (exclusion_test.txt -> 32 nulls -> 4 indexed)
    excl_prefix = "http://archive.org/images"
    base = chain().withColumn("url_norm", canonicalise_url_udf(F.col("url")))
    kept = base.filter(~F.col("url_norm").startswith(excl_prefix))
    assert kept.count() == 36 - 32                                 # 4
