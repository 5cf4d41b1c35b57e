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

__all__ = [
    "BloomParams",
    "PartitionedBloom",
    "build_bloom",
    "bloom_negative_filter",
    "build_bloom_shards",
    "bloom_negative_filter_sharded",
    "CountingBloom",
]


@dataclass(frozen=True)
class BloomParams:
    n_capacity: int
    fpr: float = 1e-6
    num_shards: int = 16

    def __post_init__(self):
        # power-of-two so unsigned mod (PartitionedBloom, uint64) and signed
        # pmod (the sharded DataFrame ops) pick identical shards for negative
        # 64-bit hashes: both reduce to h & (num_shards-1)
        if self.num_shards & (self.num_shards - 1):
            raise ValueError(f"num_shards must be a power of two, got {self.num_shards}")

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
    """Broadcast-tier build: each partition produces a partial bit matrix
    (RDD ``mapPartitions`` — imperative per-partition state is genuinely
    needed here), OR-reduced treewise to the driver.  Right when the FULL
    matrix fits driver+executor memory (≲1e9 URLs); beyond that use
    :func:`build_bloom_shards` / :func:`bloom_negative_filter_sharded`,
    which never materialize more than one shard per task."""
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


def _shard_probe_masks(hashes: np.ndarray, params: BloomParams):
    """(word index, bit mask) per probe for hashes WITHIN one shard."""
    idx = _probe_indexes(hashes.astype(np.uint64), params.k_hashes, params.m_bits_per_shard)
    return idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64)


def build_bloom_shards(df: DataFrame, hash_col: str, params: BloomParams) -> DataFrame:
    """Fully-distributed build at the 1e10 design point: ONE shuffle on
    ``shard_id = hash mod num_shards``; each task builds its whole shard's
    bit array in isolation (no partial-merge, no driver materialization).
    Returns a DataFrame ``(shard_id int, bits binary)`` — the durable form
    (write it to parquet next to the seen-set snapshot for resume).  Peak
    per-task memory = one shard = ``m_bits_per_shard/8`` bytes (~35 MB at
    the design point with 1024 shards)."""
    words = params.m_bits_per_shard // 64

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(words, dtype=np.uint64)
        h = pdf[hash_col].to_numpy(dtype=np.int64, na_value=0)
        word, mask = _shard_probe_masks(h, params)
        for ki in range(params.k_hashes):
            np.bitwise_or.at(bits, word[ki], mask[ki])
        return pd.DataFrame({"shard_id": [int(key[0])], "bits": [bits.tobytes()]})

    # explicit shard-keyed repartition: the shuffled bytes are tiny (8 B/key)
    # but each group runs a REAL per-shard build kernel — AQE would coalesce
    # the exchange by byte size and serialize every shard onto one task
    # (guide §2.5: exploding/compute-heavy groups; user repartitions are
    # never coalesced, and the groupBy reuses this exchange)
    return (
        df.select(hash_col)
        .withColumn("_shard", F.pmod(F.col(hash_col), F.lit(params.num_shards)).cast("int"))
        .repartition(
            min(params.num_shards, df.sparkSession.sparkContext.defaultParallelism),
            "_shard",
        )
        .groupBy("_shard")
        .applyInPandas(build, "shard_id int, bits binary")
    )


def bloom_negative_filter_sharded(
    spark_df: DataFrame, hash_col: str, shards: DataFrame, params: BloomParams
) -> DataFrame:
    """Sharded probe: cogroup rows with their shard's bit array on
    ``shard_id`` — each task holds exactly ONE shard plus its rows (never a
    bits-per-row join, never the full matrix).  Adds ``maybe_seen``;
    ``false`` ⇒ definitely unseen.  Rows whose shard has no entry (nothing
    ever added) are definitely unseen."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(spark_df.schema.fields + [StructField("maybe_seen", BooleanType())])
    cols = list(spark_df.columns)

    def probe(key, rows: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if rows.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if shard.empty:
            rows = rows[cols].copy()
            rows["maybe_seen"] = False
            return rows
        bits = np.frombuffer(bytes(shard["bits"].iloc[0]), dtype=np.uint64)
        h = rows[hash_col].to_numpy(dtype=np.int64, na_value=0)
        word, mask = _shard_probe_masks(h, params)
        seen = np.ones(len(h), dtype=bool)
        for ki in range(params.k_hashes):
            seen &= (bits[word[ki]] & mask[ki]) != 0
        rows = rows[cols].copy()
        rows["maybe_seen"] = seen
        return rows

    # shard-keyed repartition ahead of the cogroup — same AQE-coalescing
    # guard as the sharded build (the probe kernel is the compute, not the
    # shuffled bytes)
    n_parts = min(
        params.num_shards, spark_df.sparkSession.sparkContext.defaultParallelism
    )
    left = spark_df.withColumn(
        "_shard", F.pmod(F.col(hash_col), F.lit(params.num_shards)).cast("int")
    ).repartition(n_parts, "_shard").groupBy("_shard")
    right = shards.repartition(n_parts, "shard_id").groupBy("shard_id")
    return left.cogroup(right).applyInPandas(probe, out_schema)


class CountingBloom:
    """Counting variant of :class:`PartitionedBloom` — supports REMOVAL, the
    half of the north-rule's "counting-Bloom/cuckoo hybrid" a recrawl
    pipeline needs: when a seen-set entry expires (content older than the
    recrawl interval), its URL is removed so the frontier revisits it.

    Same shard layout and Kirsch–Mitzenmacher probes as the bit Bloom;
    cells are uint8 counters with SATURATION semantics: a cell that reaches
    255 is never incremented or decremented again (the standard safe rule —
    decrementing a saturated cell could drive it to zero while other members
    still probe it, creating false negatives, which would break the
    prefilter's "negative is definitive" contract).  Memory is 8× the bit
    Bloom (one byte per bit-cell); pack to 4-bit counters for 4× if the
    design point demands it.  ``to_bloom()`` exports the current membership
    as a broadcastable bit Bloom for the probe side, so the counting tier
    lives only where state is mutated (the seen-set maintainer), never on
    the hot probe path."""

    SATURATED = np.uint8(255)

    def __init__(self, params: BloomParams, counts: np.ndarray | None = None):
        self.params = params
        self.counts = (
            counts
            if counts is not None
            else np.zeros((params.num_shards, params.m_bits_per_shard), dtype=np.uint8)
        )

    def _cells(self, hashes: np.ndarray):
        p = self.params
        h = hashes.astype(np.uint64)
        shard = (h % np.uint64(p.num_shards)).astype(np.int64)
        idx = _probe_indexes(h, p.k_hashes, p.m_bits_per_shard)  # (k, n)
        return shard, idx

    def _unique_cells(self, shard: np.ndarray, idx_k: np.ndarray):
        """(shard_idx, cell_idx, multiplicity) with duplicate cells in the
        batch collapsed — saturation arithmetic needs exact per-cell deltas,
        and ``np.add.at`` on raw uint8 would wrap past 255."""
        m = self.params.m_bits_per_shard
        lin = shard * np.int64(m) + idx_k
        uniq, cnt = np.unique(lin, return_counts=True)
        return uniq // m, uniq % m, cnt

    def add_hashes(self, hashes: np.ndarray) -> None:
        shard, idx = self._cells(hashes)
        for ki in range(self.params.k_hashes):
            us, ui, cnt = self._unique_cells(shard, idx[ki])
            cur = self.counts[us, ui]
            new = np.minimum(cur.astype(np.int64) + cnt, 255).astype(np.uint8)
            new[cur == self.SATURATED] = self.SATURATED
            self.counts[us, ui] = new

    def remove_hashes(self, hashes: np.ndarray) -> None:
        """Remove previously-added members.  Removing a hash that was never
        added is UNDEFINED (as in every counting Bloom) — the seen-set
        maintainer only feeds confirmed members here.  Saturated cells are
        never decremented (their true count is unknown)."""
        shard, idx = self._cells(hashes)
        for ki in range(self.params.k_hashes):
            us, ui, cnt = self._unique_cells(shard, idx[ki])
            cur = self.counts[us, ui]
            new = np.maximum(cur.astype(np.int64) - cnt, 0).astype(np.uint8)
            keep = cur == self.SATURATED
            new[keep] = self.SATURATED
            self.counts[us, ui] = new

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        shard, idx = self._cells(hashes)
        out = np.ones(len(hashes), dtype=bool)
        for ki in range(self.params.k_hashes):
            out &= self.counts[shard, idx[ki]] > 0
        return out

    def to_bloom(self) -> PartitionedBloom:
        """Export membership (count > 0) as the broadcastable bit Bloom."""
        p = self.params
        words = p.m_bits_per_shard // 64
        bits = np.zeros((p.num_shards, words), dtype=np.uint64)
        shard_i, cell_i = np.nonzero(self.counts)
        # bitwise_or.at, NOT fancy |= — duplicate (shard, word) pairs would
        # otherwise keep only the last bit per word
        np.bitwise_or.at(
            bits,
            (shard_i, cell_i >> 6),
            np.uint64(1) << (cell_i & 63).astype(np.uint64),
        )
        return PartitionedBloom(p, bits)

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        """Saturating elementwise sum (partial builds from Spark partitions)."""
        s = self.counts.astype(np.uint16) + other.counts.astype(np.uint16)
        # a saturated input stays saturated (its true count is unknown)
        sat = (self.counts == self.SATURATED) | (other.counts == self.SATURATED)
        out = np.minimum(s, 255).astype(np.uint8)
        out[sat] = self.SATURATED
        return CountingBloom(self.params, out)
