"""Structured Streaming dedup + rollup for continuous ingest.

The reference's dedup tier is batch-only (MDX merges,
``MDXReduplicatingReducer.java:72-152``); this module is the streaming
upgrade a continuous training-data pipeline needs: content dedup with
bounded state, per-host windowed fetch accounting with late-data handling,
and an incrementally-maintained SimHash near-dup index.

Scale notes:

- :func:`content_dedup_stream` uses ``dropDuplicatesWithinWatermark`` —
  unlike plain ``dropDuplicates`` on a stream (state grows forever), the
  digest state is dropped once the event-time watermark passes it, so state
  size is bounded by (ingest rate × watermark), not corpus size.  Exact
  dedup against the FULL history belongs to the batch seen-set anti-join
  (``dedup.exact_dedup`` / the Bloom tier) downstream, same split as the
  URL path.
- :func:`windowed_host_counts` is one watermarked window aggregate —
  streaming state = open windows per host, closed windows emit exactly
  once (append mode), late rows beyond the watermark are dropped with the
  standard Spark accounting.
- :func:`upsert_simhash_index` maintains the near-dup index with
  ``foreachBatch``: each micro-batch computes SimHash fingerprints
  (codegen, same kernel as batch ``dedup.simhash16``), anti-joins the
  existing index parquet on the fingerprint, and appends only novel
  fingerprints — the streaming form of build-once/probe-incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "content_dedup_stream",
    "windowed_host_counts",
    "upsert_simhash_index",
    "image_text_pair_stream",
    "upsert_capture_index",
]


def content_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "discovered_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact content dedup over a stream with bounded state: md5 digest +
    ``dropDuplicatesWithinWatermark`` — a duplicate arriving within the
    watermark of the first copy is dropped; the digest's state is freed
    once the watermark passes."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def windowed_host_counts(
    fetches: DataFrame,
    host_col: str = "host",
    ts_col: str = "discovered_at",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-host fetch counts per event-time window (the streaming analog of
    ``HostsReportReducer``): watermarked windowed aggregate, append-mode
    emission when windows close, late data beyond the watermark dropped."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        fetches.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(host_col).alias("host"))
        .agg(F.count(F.lit(1)).alias("n_fetched"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_fetched",
        )
    )


def upsert_simhash_index(
    docs: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Maintain a SimHash near-dup index incrementally: per micro-batch,
    fingerprint the new docs (batch kernel), LEFT ANTI join the existing
    index on the fingerprint, append only novel fingerprints.  Returns the
    started query.  Exactly-once per batch via the checkpointed batch id
    (re-delivered batches re-run the same anti-join against the already-
    appended index, so replays add no duplicate fingerprints only if the
    original attempt completed the append — the standard foreachBatch
    idempotence caveat; pair with batch compaction for strict semantics)."""
    from ..operators.dedup import simhash16

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh = simhash16(batch_df, text_col, id_col)
        # first-in-batch per fingerprint, deterministic exemplar
        fresh = sh.groupBy("simhash").agg(F.min(id_col).alias(id_col))
        try:
            existing = spark.read.parquet(index_path).select("simhash")
            fresh = fresh.join(existing, "simhash", "left_anti")
        except Exception:
            pass  # first batch: index does not exist yet
        fresh.select(id_col, "simhash").write.mode("append").parquet(index_path)

    writer = (
        docs.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def image_text_pair_stream(
    pages: DataFrame,
    capture_index_path: str,
    pairs_path: str,
    wanted_path: str,
    checkpoint: str,
    page_url_col: str = "url",
    html_col: str = "payload",
    trigger_available_now: bool = True,
):
    """Incremental LAION-style pair construction over a PAGE stream: per
    micro-batch, run the batch extraction kernel (one Arrow pass), LEFT
    join the candidates against the current capture index, append matched
    pairs to ``pairs_path`` and the still-uncaptured image URLs to
    ``wanted_path`` — the streaming frontier-feedback loop (the crawler
    drains ``wanted`` to schedule image fetches; fetched captures land in
    the index via :func:`upsert_capture_index`, and later pages referencing
    them pair immediately).  A page whose images were ALL unmatched is
    never lost — its wants re-enter the frontier rather than the pair set,
    the same split the batch path expresses with ``how='left'``."""
    from ..operators.imagetext import build_image_text_pairs

    def build(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            index = spark.read.parquet(capture_index_path)
        except Exception:
            index = None  # no captures yet: everything is wanted
        if index is not None:
            joined = build_image_text_pairs(
                batch_df, index, page_url_col=page_url_col, html_col=html_col,
                how="left",
            )
        else:
            joined = build_image_text_pairs(
                batch_df,
                batch_df.sparkSession.createDataFrame(
                    [], "url string, image_width long, image_height long"
                ),
                page_url_col=page_url_col, html_col=html_col, how="left",
            )
        joined = joined.localCheckpoint()  # one extraction pass for both sinks
        matched = joined.filter(F.col("image_width").isNotNull())
        matched.write.mode("append").parquet(pairs_path)
        wants = (
            joined.filter(F.col("image_width").isNull())
            .select("img_url").distinct()
        )
        wants.write.mode("append").parquet(wanted_path)

    writer = (
        pages.writeStream.foreachBatch(build)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_capture_index(
    images: DataFrame,
    index_path: str,
    checkpoint: str,
    url_col: str = "url",
    trigger_available_now: bool = True,
):
    """Maintain the image-capture index incrementally: per micro-batch keep
    the first capture per URL (deterministic min on the remaining columns'
    natural order is not needed — URL is the identity), anti-join the
    existing index, append only novel URLs.  Same idempotence profile as
    :func:`upsert_simhash_index`."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([url_col])
        try:
            existing = spark.read.parquet(index_path).select(url_col)
            fresh = fresh.join(existing, url_col, "left_anti")
        except Exception:
            pass  # first batch
        fresh.write.mode("append").parquet(index_path)

    writer = (
        images.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
