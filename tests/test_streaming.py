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


@pytest.fixture()
def doc_drop_dir(tmp_path):
    d = tmp_path / "docdrops"
    d.mkdir()
    rows = []
    for i in range(30):
        rows.append(
            {
                "doc_id": i,
                "text": f"document body number {i % 10}",  # each text thrice
                "host": f"h{i % 3}.example.org",
                "discovered_at": "2024-01-01T00:%02d:00.000Z" % (i % 30),
            }
        )
    (d / "d1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def _doc_stream(spark, path):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("host", StringType()),
        StructField("discovered_at", TimestampType()),
    ])
    return spark.readStream.schema(schema).json(path)


def test_stream_content_dedup_bounded_state(spark, doc_drop_dir, tmp_path):
    from webarchive_discovery_spark.streaming.dedup_stream import (
        content_dedup_stream)

    out = str(tmp_path / "out")
    q = (content_dedup_stream(_doc_stream(spark, doc_drop_dir),
                              watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # 10 distinct texts survive from 30 rows
    assert got.count() == 10
    assert got.select("digest").distinct().count() == 10


def test_stream_windowed_host_counts(spark, doc_drop_dir, tmp_path):
    from webarchive_discovery_spark.streaming.dedup_stream import (
        windowed_host_counts)

    out = str(tmp_path / "win")
    q = (windowed_host_counts(_doc_stream(spark, doc_drop_dir),
                              window="10 minutes", watermark="0 seconds")
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window_start.minute, r.host): r.n_fetched
           for r in spark.read.parquet(out).collect()}
    # rows land in minutes 0..29 → windows [0,10) [10,20) [20,30); append
    # mode emits a window only once the watermark passes its END, and the
    # final watermark is the max event time (29 min), so exactly the two
    # CLOSED windows emit — the still-open [20,30) stays in state.  That
    # exactly-once-on-close semantic is the point of the watermarked agg.
    assert got == {
        (0, "h0.example.org"): 4,   # i ∈ {0,3,6,9}
        (0, "h1.example.org"): 3,   # i ∈ {1,4,7}
        (0, "h2.example.org"): 3,   # i ∈ {2,5,8}
        (10, "h0.example.org"): 3,  # i ∈ {12,15,18}
        (10, "h1.example.org"): 4,  # i ∈ {10,13,16,19}
        (10, "h2.example.org"): 3,  # i ∈ {11,14,17}
    }


def test_stream_simhash_index_upsert(spark, doc_drop_dir, tmp_path):
    from webarchive_discovery_spark.streaming.dedup_stream import (
        upsert_simhash_index)

    idx = str(tmp_path / "idx")
    q = upsert_simhash_index(_doc_stream(spark, doc_drop_dir), idx,
                             str(tmp_path / "ck3"))
    q.awaitTermination(120)
    first = spark.read.parquet(idx)
    n = first.count()
    assert n == first.select("simhash").distinct().count()  # unique index
    # replaying the same data through a NEW query adds nothing novel
    q2 = upsert_simhash_index(_doc_stream(spark, doc_drop_dir), idx,
                              str(tmp_path / "ck4"))
    q2.awaitTermination(120)
    again = spark.read.parquet(idx)
    assert again.count() == n


def test_stream_image_text_pairs_with_feedback(spark, tmp_path):
    """Two-epoch streaming pair loop: epoch 1 pages want images that are not
    yet captured (wants recorded, no pairs); the capture index is then fed;
    epoch 2 pages referencing the same images pair immediately."""
    import json as _json

    from pyspark.sql import functions as F

    from webarchive_discovery_spark.streaming.dedup_stream import (
        image_text_pair_stream, upsert_capture_index)

    idx = str(tmp_path / "capidx")
    pairs = str(tmp_path / "pairs")
    wanted = str(tmp_path / "wanted")

    pages1 = tmp_path / "pages1"; pages1.mkdir()
    (pages1 / "a.json").write_text("\n".join(_json.dumps(r) for r in [
        {"url": "http://p.org/1.html",
         "payload": '<img src="http://c.net/a.jpg" alt="a fine cat">'},
    ]))
    pstream = (spark.readStream.schema("url string, payload string")
               .json(str(pages1)))
    q = image_text_pair_stream(pstream, idx, pairs, wanted,
                               str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert {r.img_url for r in spark.read.parquet(wanted).collect()} == {
        "http://c.net/a.jpg"}
    import os
    assert not os.path.exists(pairs) or not spark.read.parquet(pairs).count()

    # feed the capture index with the wanted image
    caps = tmp_path / "caps"; caps.mkdir()
    (caps / "c.json").write_text(_json.dumps(
        {"url": "http://c.net/a.jpg", "image_width": 128, "image_height": 96}))
    cstream = (spark.readStream
               .schema("url string, image_width long, image_height long")
               .json(str(caps)))
    upsert_capture_index(cstream, idx, str(tmp_path / "ck2")).awaitTermination(120)

    pages2 = tmp_path / "pages2"; pages2.mkdir()
    (pages2 / "b.json").write_text(_json.dumps(
        {"url": "http://p.org/2.html",
         "payload": '<img src="http://c.net/a.jpg" alt="same cat again">'}))
    p2 = (spark.readStream.schema("url string, payload string")
          .json(str(pages2)))
    q2 = image_text_pair_stream(p2, idx, pairs, wanted, str(tmp_path / "ck3"))
    q2.awaitTermination(120)
    got = spark.read.parquet(pairs).collect()
    assert [(r.page_url, r.img_url, r.alt_text, r.image_width) for r in got] == [
        ("http://p.org/2.html", "http://c.net/a.jpg", "same cat again", 128)]
