"""Deterministic synthetic frontier fixtures (image+caption record store,
seed list, link graph, robots rules).

Schema per ``BASELINE.json.input_hint``:
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash long)`` — the record-store analog of the reference's WARC fixture
corpus (``warc-indexer/src/test/resources/wikipedia-mona-lisa/…``,
``16px-photo.jpg``, ``cc.png``).

Everything is keyed off ``(seed, row index)`` so that:

- generation is distributed (``spark.range(n)`` + ``mapInPandas``; no driver
  loop, no collect) and **independent of partitioning** — the same row index
  always yields the same record at any parallelism, and
- tests can re-derive the expected pixels for any ``image_id`` to assert the
  decoded-pixel PSNR invariant without shipping golden images.

Host popularity is Zipf-like so per-host skew is real in benchmarks (the
salting path gets exercised, cf. ``WARCIndexerMapper.java:222-230``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.imaging import average_hash, encode_image

__all__ = [
    "FRONTIER_SCHEMA",
    "expected_pixels",
    "gen_frontier_records",
    "gen_link_graph",
    "gen_robots_rules",
    "gen_seeds",
    "raw_url_for",
    "host_for",
]

FRONTIER_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

_FMTS = ["png", "jpeg", "bmp"]
_WORDS = (
    "mona lisa portrait archive crawl image caption web frontier record "
    "pixel colour museum painting photo snapshot capture harvest index"
).split()
_N_HOSTS = 64
_PATH_VARIANTS = 8


def host_for(k: int, n_hosts: int = _N_HOSTS) -> str:
    """Zipf-like host assignment: host 0 gets ~1/1, host i ~1/(i+1)."""
    # deterministic: use a hash-free arithmetic mix so SQL oracles can mirror it
    weights_pos = (k * 2654435761) % 1000003
    # map to a zipf-ish bucket: smaller buckets for higher ranks
    h = 0
    acc = 0
    total = sum(1.0 / (i + 1) for i in range(n_hosts))
    x = (weights_pos / 1000003.0) * total
    for i in range(n_hosts):
        acc += 1.0 / (i + 1)
        if x <= acc:
            h = i
            break
    else:
        h = n_hosts - 1
    return f"host{h:03d}.example.org"


def raw_url_for(k: int) -> str:
    """Raw (pre-canonicalization) URL for record ``k`` — cycles through
    messiness variants so the canonicalization kernel does real work."""
    host = host_for(k)
    path = f"/img/{k}.html"
    v = k % _PATH_VARIANTS
    if v == 0:
        return f"http://{host}{path}"
    if v == 1:
        return f"https://{host}{path}"
    if v == 2:
        return f"http://www.{host}{path}"
    if v == 3:
        return f"https://WWW.{host}{path}/"
    if v == 4:
        return f"http://{host}{path}?a=1&b=2"
    if v == 5:
        return f"http://{host}{path}?s=%2A"
    if v == 6:
        return f"https://{host}{path}?q=x y"
    return f"http://{host}:80{path}"


def _caption_for(rng: np.random.Generator) -> str:
    n = int(rng.integers(4, 12))
    return " ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n))


def expected_pixels(k: int, seed: int = 42) -> tuple[np.ndarray, str]:
    """Re-derive the source pixel array + fmt for record ``k``.

    Lossless records (png/bmp) are iid noise — round trips must be
    bit-exact regardless of content.  Lossy records (jpeg) are structured
    low-frequency fields (gradients + sinusoid + ±2 dither), the content
    class the PSNR≥40dB invariant is defined over: an iid-noise field has
    no spectral structure for ANY real JPEG codec to preserve at 40 dB
    (the in-repo codec measures 42-67 dB on the reference's photo corpus
    and ~36 dB on noise — as does libjpeg)."""
    rng = np.random.default_rng(seed * 1_000_003 + k)
    w = int(rng.integers(8, 33))
    h = int(rng.integers(8, 33))
    fmt = _FMTS[k % len(_FMTS)]
    if fmt == "jpeg":
        yy, xx = np.mgrid[0:h, 0:w]
        out = np.empty((h, w, 3), dtype=np.uint8)
        for c in range(3):
            gx, gy = rng.uniform(-3, 3, 2)
            amp = rng.uniform(10, 40)
            phase = rng.uniform(0, 6.28318)
            base = rng.uniform(60, 195)
            plane = (base + gx * xx + gy * yy
                     + amp * np.sin(xx / 5.0 + yy / 7.0 + phase))
            plane = plane + rng.integers(-2, 3, (h, w))
            out[:, :, c] = np.clip(plane, 0, 255).astype(np.uint8)
        return out, fmt
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return rgb, fmt


def _gen_batch(ks: np.ndarray, seed: int) -> pd.DataFrame:
    rows = []
    for k in ks:
        k = int(k)
        rgb, fmt = expected_pixels(k, seed)
        data = encode_image(rgb, fmt)
        rng = np.random.default_rng(seed * 7_000_003 + k)
        rows.append(
            {
                "image_id": f"img-{k:09d}",
                "bytes": data,
                "w": rgb.shape[1],
                "h": rgb.shape[0],
                "fmt": fmt,
                "caption": _caption_for(rng),
                "phash": average_hash(rgb),
            }
        )
    return pd.DataFrame(rows)


def gen_frontier_records(spark: SparkSession, n: int, seed: int = 42,
                         partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of the image+caption table."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].values, seed)

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, FRONTIER_SCHEMA)
    )


def gen_seeds(spark: SparkSession, n_records: int, n_seeds: int) -> DataFrame:
    """Seed list: every ``n_records//n_seeds``-th record's raw URL, hops=0."""
    step = max(1, n_records // n_seeds)

    @F.pandas_udf(StringType())
    def raw_url(ks: pd.Series) -> pd.Series:
        return ks.map(lambda k: raw_url_for(int(k)))

    return (
        spark.range(0, n_records, step)
        .select(
            raw_url(F.col("id")).alias("url"),
            F.lit(0).alias("hops"),
            F.col("id").alias("record_k"),
        )
    )


def gen_link_graph(spark: SparkSession, n_records: int, fanout: int = 3) -> DataFrame:
    """Deterministic outlink edges: record k links to (k*31+j*17+1) % n."""
    @F.pandas_udf(StringType())
    def src(ks: pd.Series) -> pd.Series:
        return ks.map(lambda k: raw_url_for(int(k)))

    @F.pandas_udf(StringType())
    def dst(ks: pd.Series) -> pd.Series:
        return ks.map(lambda k: raw_url_for(int(k)))

    edges = spark.range(0, n_records).select(
        F.col("id").alias("src_k"),
        F.explode(
            F.array(*[((F.col("id") * 31 + j * 17 + 1) % n_records) for j in range(fanout)])
        ).alias("dst_k"),
    )
    return edges.select(
        src(F.col("src_k")).alias("src_url"),
        dst(F.col("dst_k")).alias("dst_url"),
        F.col("src_k"),
        F.col("dst_k"),
    )


def gen_robots_rules(spark: SparkSession, n_hosts: int = _N_HOSTS) -> DataFrame:
    """Per-host allow/deny prefixes + crawl delays.  Every 5th host denies
    ``/img/`` entirely; every 3rd denies a narrow prefix; delays cycle."""
    rows = []
    for i in range(n_hosts):
        host = f"host{i:03d}.example.org"
        delay = [100, 250, 500, 1000][i % 4]
        if i % 5 == 0:
            rows.append((host, "deny", "/img/", delay))
        elif i % 3 == 0:
            rows.append((host, "deny", "/img/1", delay))
            rows.append((host, "allow", "/", delay))
        else:
            rows.append((host, "allow", "/", delay))
    # LocalRelation (session.values_df): rule-prep joins and broadcast
    # builds over this config dim run driver-local, no 32-task stages
    from ..session import values_df

    return values_df(
        spark, rows,
        "host string, rule_type string, path_prefix string, crawl_delay_ms int",
    )
