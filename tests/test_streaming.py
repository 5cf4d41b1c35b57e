"""Structured Streaming frontier ingest: watermarked canonical dedup and the
stateful per-host politeness token bucket, driven with availableNow triggers
over a file source."""

import json

import pytest

from webarchive_discovery_spark.streaming.frontier_stream import (
    canonicalized_stream,
    politeness_gate,
    read_url_stream,
    write_candidates,
)


@pytest.fixture()
def url_drop_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    rows = []
    for i in range(40):
        host = f"s{(i // 2) % 2}.example.org"
        rows.append(
            {
                "url": f"https://www.{host}/p/{i // 2}",  # each URL twice (dup)
                "discovered_at": "2024-01-01T00:00:%02d.000Z" % (i % 60),
                "hops": i % 3,
            }
        )
    (d / "drop1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def test_stream_canonicalize_dedup_and_gate(spark, url_drop_dir, tmp_path):
    stream = read_url_stream(spark, url_drop_dir)
    assert stream.isStreaming
    canon = canonicalized_stream(stream)
    gated = politeness_gate(canon, tokens_per_trigger=5)
    q = write_candidates(
        gated,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = out.collect()
    # canonical dedup happened (40 raw → fewer distinct url_norm events)
    assert 0 < len(rows) < 40
    assert all(r["url_norm"].startswith("http://s") for r in rows)
    # per-host budget: exactly 5 admitted per host in the single trigger
    admitted = out.filter("admitted").groupBy("host").count().collect()
    assert {r["host"] for r in admitted} == {"s0.example.org", "s1.example.org"}
    assert all(r["count"] == 5 for r in admitted)
