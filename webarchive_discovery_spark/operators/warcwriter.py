"""WARC writer: serialize capture rows back out as WARC/1.0 response records.

Round-trip counterpart of ``sources/warc.py`` (which only reads) and sibling
of the WET sink (``operators/wet.py``): where WET carries extracted text,
this emits full ``WARC-Type: response`` records with the stored HTTP
response block — the format a crawl pipeline persists for replay and
re-indexing (the reference consumes such files via
``ArchiveFileRecordReader``; Heritrix's writer produces them).

Framing (ISO 28500 WARC/1.x §4): version line, named headers, blank line,
Content-Length OCTETS of the payload block (here the HTTP response message:
status line + headers + CRLF + body), then CRLF CRLF.  The record is
assembled as a BINARY column — header text UTF-8-encoded and concatenated
with the raw payload bytes — so image/binary payloads frame byte-exactly
(string concat would mangle them).  Pure codegen (encode/concat/
octet_length), no UDF, no shuffle.

``WARC-Record-ID`` is deterministic: a urn:uuid derived from
``md5(url || date)`` (same determinism stance as the engine's reservoir
sampler and salted repartition — no executor RNG, so a re-run of the same
epoch writes byte-identical records).

``write_warc`` packages records as one gzip MEMBER PER RECORD concatenated
into per-partition ``.warc.gz`` files — the Common Crawl / IIPC convention
that makes records individually seekable; Python's ``gzip.decompress`` (and
the engine's own reader) inflate multi-member streams transparently.  Each
task writes only its own partition's file: embarrassingly parallel, no
driver collect.
"""

from __future__ import annotations

import gzip
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deterministic_record_id", "http_response_block",
           "warc_response_records", "warc_request_records",
           "warc_revisit_records", "write_warc"]

_CRLF = "\r\n"

_STATUS_REASONS = {
    200: "OK", 301: "Moved Permanently", 302: "Found", 304: "Not Modified",
    403: "Forbidden", 404: "Not Found", 500: "Internal Server Error",
    503: "Service Unavailable",
}


def deterministic_record_id(url: Column, date: Column) -> Column:
    """``<urn:uuid:...>`` shaped from ``md5(url || '\\n' || date)`` —
    RFC 4122 layout (8-4-4-4-12) without executor RNG, so identical input
    rows always serialize with identical ids (bit-exact re-runs)."""
    h = F.md5(F.concat(url, F.lit("\n"), date))
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
        F.lit(">"),
    )


def http_response_block(
    status: Column, content_type: Column, payload: Column
) -> Column:
    """BINARY HTTP/1.1 response message: status line + minimal headers +
    CRLF + raw body bytes.  ``Content-Length`` counts the BODY's octets."""
    reason = F.lit("OK")
    for code, text in _STATUS_REASONS.items():
        reason = F.when(status == code, F.lit(text)).otherwise(reason)
    head = F.concat(
        F.lit("HTTP/1.1 "), status.cast("string"), F.lit(" "), reason, F.lit(_CRLF),
        F.lit("Content-Type: "), F.coalesce(content_type, F.lit("application/octet-stream")),
        F.lit(_CRLF),
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(F.encode(head, "UTF-8"), payload)


def warc_response_records(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "status_code",
    content_type_col: str = "content_type_served",
    payload_col: str = "payload_bytes",
    ip_col: str | None = None,
    out_col: str = "warc_record",
) -> DataFrame:
    """Append one fully-framed binary WARC response record per row.
    Null payloads frame as zero-length bodies (a 304, say).  The WARC
    ``Content-Length`` is the octet length of the whole HTTP block."""
    url, date = F.col(url_col), F.col(date_col)
    payload = F.coalesce(F.col(payload_col), F.lit(b""))
    block = http_response_block(F.col(status_col), F.col(content_type_col), payload)
    ip = (
        F.concat(F.lit("WARC-IP-Address: "), F.col(ip_col), F.lit(_CRLF))
        if ip_col
        else F.lit("")
    )
    head = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Record-ID: "), deterministic_record_id(url, date), F.lit(_CRLF),
        ip,
        F.lit('Content-Type: application/http; msgtype=response' + _CRLF),
        F.lit("Content-Length: "), F.octet_length(block).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    rec = F.concat(F.encode(head, "UTF-8"), block, F.encode(F.lit(_CRLF + _CRLF), "UTF-8"))
    return captures.withColumn(out_col, rec)


def warc_request_records(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    user_agent: str = "webarchive-discovery-spark",
    out_col: str = "warc_request",
) -> DataFrame:
    """Append the paired ``WARC-Type: request`` record per row: the GET
    message a crawler would have sent, linked to its response via
    ``WARC-Concurrent-To`` (the same deterministic id
    :func:`warc_response_records` assigns — the pair needs no join).  The
    request's own id salts the hash input so it never collides with the
    response id."""
    url, date = F.col(url_col), F.col(date_col)
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))
    query = F.parse_url(url, F.lit("QUERY"))
    target = F.when(query.isNotNull(), F.concat(path, F.lit("?"), query)).otherwise(path)
    host = F.parse_url(url, F.lit("HOST"))
    block = F.encode(
        F.concat(
            F.lit("GET "), target, F.lit(" HTTP/1.1" + _CRLF),
            F.lit("Host: "), host, F.lit(_CRLF),
            F.lit(f"User-Agent: {user_agent}" + _CRLF + _CRLF),
        ),
        "UTF-8",
    )
    head = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: request" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Record-ID: "),
        deterministic_record_id(F.concat(F.lit("request:"), url), date),
        F.lit(_CRLF),
        F.lit("WARC-Concurrent-To: "), deterministic_record_id(url, date), F.lit(_CRLF),
        F.lit("Content-Type: application/http; msgtype=request" + _CRLF),
        F.lit("Content-Length: "), F.octet_length(block).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    rec = F.concat(F.encode(head, "UTF-8"), block, F.encode(F.lit(_CRLF + _CRLF), "UTF-8"))
    return captures.withColumn(out_col, rec)


def warc_revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    refers_to_url_col: str = "refers_to_url",
    refers_to_date_col: str = "refers_to_date",
    digest_col: str = "payload_digest",
    out_col: str = "warc_revisit",
) -> DataFrame:
    """``WARC-Type: revisit`` records (identical-payload-digest profile) —
    what a deduplicating crawl writes INSTEAD of a response when the payload
    digest matches an earlier capture (the write-side twin of the engine's
    ``reduplication.revisit_shortcircuit`` read path and the reference's MDX
    reduplication, ``MDXReduplicatingReducer.java:72-152``).  The body is
    empty (Content-Length: 0); ``WARC-Refers-To`` reconstructs the original
    record's deterministic id from its (url, date), so writer and
    reduplicator need no id exchange."""
    url, date = F.col(url_col), F.col(date_col)
    head = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: revisit" + _CRLF),
        F.lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
              "identical-payload-digest" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Record-ID: "),
        deterministic_record_id(F.concat(F.lit("revisit:"), url), date),
        F.lit(_CRLF),
        F.lit("WARC-Refers-To: "),
        deterministic_record_id(F.col(refers_to_url_col), F.col(refers_to_date_col)),
        F.lit(_CRLF),
        F.lit("WARC-Payload-Digest: "), F.col(digest_col), F.lit(_CRLF),
        F.lit("Content-Length: 0" + _CRLF + _CRLF + _CRLF + _CRLF),
    )
    return captures.withColumn(out_col, F.encode(head, "UTF-8"))


def _warcinfo_bytes(filename: str, fields: dict, date: str) -> bytes:
    """One ``WARC-Type: warcinfo`` record (application/warc-fields block)
    heading an output file; id derived from the filename — deterministic
    (the date is caller-supplied for the same reason)."""
    import hashlib

    body = "".join(f"{k}: {v}{_CRLF}" for k, v in fields.items()).encode()
    h = hashlib.md5(filename.encode()).hexdigest()
    rid = f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    head = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: warcinfo{_CRLF}"
        f"WARC-Date: {date}{_CRLF}"
        f"WARC-Record-ID: {rid}{_CRLF}"
        f"WARC-Filename: {filename}{_CRLF}"
        f"Content-Type: application/warc-fields{_CRLF}"
        f"Content-Length: {len(body)}{_CRLF}{_CRLF}"
    ).encode()
    return head + body + (_CRLF + _CRLF).encode()


def write_warc(
    records: DataFrame,
    path: str,
    record_col: str = "warc_record",
    prefix: str = "part",
    info_fields: dict | None = None,
    info_date: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Write per-partition ``<prefix>-<pid>.warc.gz`` files (one gzip member
    per record, concatenated — the seekable convention) and RETURN the
    manifest DataFrame ``(file, n_records, bytes)``; the caller triggers the
    write with any action on it.  Tasks write directly to ``path`` (local/
    shared FS — the same direct-write stance as the Solr batch sink); a
    cloud deployment swaps the ``open`` for its object-store client.

    ``info_fields`` (e.g. ``{"software": ..., "format": "WARC File Format
    1.0"}``) prepends a ``warcinfo`` record to every part file, per the WARC
    convention; pass the crawl date as ``info_date`` (deterministic — no
    wall clock in executors).

    Write protocol: each attempt writes ``.<final>.<taskAttemptId>.tmp`` and
    atomically renames onto the final name when its stream is complete, so
    a speculative twin or a re-executed stage never interleaves gzip
    members into a half-written ``.warc.gz`` — the last completed attempt
    wins with a whole, valid file (same commit shape as Hadoop's file
    output committer, collapsed to one rename)."""
    os.makedirs(path, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"{prefix}-{pid:05d}.warc.gz")
        tmpname = os.path.join(
            path, f".{prefix}-{pid:05d}.{ctx.taskAttemptId()}.tmp"
        )
        n = total = 0
        try:
            with open(tmpname, "wb") as fh:
                if info_fields is not None:
                    member = gzip.compress(
                        _warcinfo_bytes(os.path.basename(fname), info_fields, info_date),
                        mtime=0,
                    )
                    fh.write(member)
                    total += len(member)
                for pdf in batches:
                    for rec in pdf[record_col]:
                        member = gzip.compress(bytes(rec), mtime=0)  # deterministic
                        fh.write(member)
                        n += 1
                        total += len(member)
            if n == 0:
                os.remove(tmpname)
                return
            os.replace(tmpname, fname)  # atomic on POSIX: complete files only
        except BaseException:
            if os.path.exists(tmpname):
                os.remove(tmpname)
            raise
        yield pd.DataFrame({"file": [fname], "n_records": [n], "bytes": [total]})

    return records.select(record_col).mapInPandas(
        dump, "file string, n_records long, bytes long"
    )
