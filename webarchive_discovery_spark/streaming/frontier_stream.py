"""Structured Streaming frontier ingest.

The reference has NO streaming runtime (SURVEY.md §2.9) — its incremental
state lives in batch persist-logs and MDX merges.  This module is the
Spark-native upgrade: discovered URLs arrive as a stream (file source over
frontier delta drops; Kafka in production via ``format("kafka")`` — not
available in this sandbox), are canonicalized with the same Arrow UDF as the
batch path, deduplicated within a watermark window, and appended to the
crawl-candidate table.  A stateful per-host token bucket
(``applyInPandasWithState``) enforces politeness continuously instead of
per-epoch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.frontier import canonicalize_frontier

__all__ = ["read_url_stream", "canonicalized_stream", "politeness_gate", "write_candidates"]

URL_EVENT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("discovered_at", TimestampType()),
        StructField("hops", LongType()),
    ]
)


def read_url_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of discovered-URL drops (JSONL)."""
    return (
        spark.readStream.schema(URL_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def canonicalized_stream(urls: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Canonicalize + in-stream URL dedup: watermarked ``dropDuplicates`` on
    the canonical URL keeps state bounded (late duplicates beyond the
    watermark fall through to the batch seen-set anti-join downstream)."""
    canon = canonicalize_frontier(urls, "url")
    return canon.withWatermark("discovered_at", watermark).dropDuplicates(["url_norm"])


_GATE_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("url_norm", StringType()),
        StructField("url_key", StringType()),
        StructField("hops", LongType()),
        StructField("admitted", BooleanType()),
        StructField("host_tokens_left", LongType()),
    ]
)

_GATE_STATE = StructType([StructField("tokens", LongType())])


def politeness_gate(canon: DataFrame, tokens_per_trigger: int = 10) -> DataFrame:
    """Continuous per-host politeness: a token-bucket kept in Spark state
    (``applyInPandasWithState``), refilled each trigger — the streaming
    equivalent of the per-epoch host budget (``HostsReportReducer``
    accounting semantics)."""

    def gate(key, pdf_iter, state: GroupState):
        (host,) = key
        if state.exists:
            (tokens,) = state.get
        else:
            tokens = tokens_per_trigger
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["hops", "url_key"])  # deterministic admit order
            for row in pdf.itertuples(index=False):
                admitted = tokens > 0
                if admitted:
                    tokens -= 1
                out.append(
                    {
                        "host": host,
                        "url_norm": row.url_norm,
                        "url_key": row.url_key,
                        "hops": row.hops,
                        "admitted": admitted,
                        "host_tokens_left": tokens,
                    }
                )
        state.update((tokens + tokens_per_trigger,))  # refill for next trigger
        yield pd.DataFrame(out)

    return canon.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=_GATE_OUTPUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_candidates(df: DataFrame, path: str, checkpoint: str, trigger_available_now: bool = True):
    """Append admitted candidates to the crawl-candidate table."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
