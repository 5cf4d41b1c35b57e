"""Partitioned Bloom filter for URL-seen membership.

North-rule component: URL-seen via a partitioned Bloom filter (FPR ≤ 1e-6 at
the 1e10-URL design point) maintained as broadcast shards alongside an exact
seen-set table.  The Bloom is a *prefilter*: a negative answer is definitive
("definitely new"), positives are confirmed against the exact seen-set with
an anti-join — so correctness never depends on the FPR, only shuffle volume
does.  This generalizes the reference's dedup-by-digest URL-seen semantics
(``MDXReduplicatingReducer.java:72-152``, ``PersistLogMapper.java:117-143``).

Sharding: shard id = ``url_hash mod num_shards``; each shard is a numpy bit
array built per Spark partition with ``applyInPandas`` partial builds that
are OR-merged driver-side (a few KB–MB each), then broadcast.  At the 1e10
design point with FPR 1e-6 the total is m = n·ln(1e-6)/ln(2)² ≈ 28.8 bits/URL
→ ~36 GB split over ~1024 shards of ~35 MB — each executor holds only the
shards it probes, and k = 20 probes stay in one or two cache lines per URL
because we derive all k indexes from one 64-bit hash (Kirsch–Mitzenmacher
double hashing).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = ["BloomParams", "PartitionedBloom", "build_bloom", "bloom_negative_filter"]


@dataclass(frozen=True)
class BloomParams:
    n_capacity: int
    fpr: float = 1e-6
    num_shards: int = 16

    @property
    def m_bits_per_shard(self) -> int:
        m_total = max(64, int(-self.n_capacity * math.log(self.fpr) / (math.log(2) ** 2)))
        per = (m_total + self.num_shards - 1) // self.num_shards
        return ((per + 63) // 64) * 64  # round to whole words

    @property
    def k_hashes(self) -> int:
        return max(1, round((self.m_bits_per_shard * self.num_shards / self.n_capacity) * math.log(2)))


def _probe_indexes(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher: index_i = (h1 + i*h2) mod m from one 64-bit hash."""
    h = h.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd-ish second hash
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


class PartitionedBloom:
    """num_shards × (m_bits/64) uint64 bit matrix with set/contains kernels."""

    def __init__(self, params: BloomParams, bits: np.ndarray | None = None):
        self.params = params
        words = params.m_bits_per_shard // 64
        self.bits = (
            bits
            if bits is not None
            else np.zeros((params.num_shards, words), dtype=np.uint64)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        p = self.params
        h = hashes.astype(np.uint64)
        shard = (h % np.uint64(p.num_shards)).astype(np.int64)
        idx = _probe_indexes(h, p.k_hashes, p.m_bits_per_shard)  # (k, n)
        word = idx >> 6
        mask = np.uint64(1) << (idx & 63).astype(np.uint64)
        for ki in range(p.k_hashes):
            np.bitwise_or.at(self.bits, (shard, word[ki]), mask[ki])

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        p = self.params
        h = hashes.astype(np.uint64)
        shard = (h % np.uint64(p.num_shards)).astype(np.int64)
        idx = _probe_indexes(h, p.k_hashes, p.m_bits_per_shard)
        word = idx >> 6
        mask = np.uint64(1) << (idx & 63).astype(np.uint64)
        out = np.ones(len(h), dtype=bool)
        for ki in range(p.k_hashes):
            out &= (self.bits[shard, word[ki]] & mask[ki]) != 0
        return out

    def merge(self, other: "PartitionedBloom") -> "PartitionedBloom":
        return PartitionedBloom(self.params, self.bits | other.bits)


def build_bloom(df: DataFrame, hash_col: str, params: BloomParams) -> PartitionedBloom:
    """Distributed build: each partition produces a partial bit matrix
    (RDD ``mapPartitions`` — imperative per-partition state is genuinely
    needed here), OR-reduced treewise to the driver."""
    words = params.m_bits_per_shard // 64
    shards = params.num_shards

    def partial(it):
        bloom = PartitionedBloom(params)
        for pdf in it:
            vals = pdf[hash_col].to_numpy(dtype=np.int64, na_value=0)
            bloom.add_hashes(vals)
        yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    partials = (
        df.select(hash_col)
        .mapInPandas(partial, "bits binary")
        .rdd.map(lambda r: np.frombuffer(r["bits"], dtype=np.uint64).reshape(shards, words))
        .treeReduce(lambda a, b: a | b)
    )
    return PartitionedBloom(params, partials)


def bloom_negative_filter(
    spark_df: DataFrame, hash_col: str, bloom: PartitionedBloom
) -> DataFrame:
    """Mark rows by Bloom membership: adds ``maybe_seen`` boolean.
    ``maybe_seen = false`` ⇒ definitely unseen (skip the exact anti-join)."""
    sc = spark_df.sparkSession.sparkContext
    b_bits = sc.broadcast(bloom.bits)
    params = bloom.params

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        local = PartitionedBloom(params, b_bits.value)
        return pd.Series(local.contains_hashes(h.to_numpy(dtype=np.int64)))

    return spark_df.withColumn("maybe_seen", probe(F.col(hash_col)))
