"""Partitioned Bloom filter: zero false negatives (hard guarantee) and a
small-scale FPR audit of the parameter math (the 1e10/1e-6 design point is
parameterized through the same formulas)."""

import numpy as np
import pytest

from webarchive_discovery_spark.operators.bloom import (
    BloomParams,
    PartitionedBloom,
    bloom_negative_filter,
    build_bloom,
)


def test_no_false_negatives_and_fpr():
    params = BloomParams(n_capacity=20_000, fpr=1e-4, num_shards=8)
    bloom = PartitionedBloom(params)
    rng = np.random.default_rng(3)
    members = rng.integers(-(2**62), 2**62, 20_000, dtype=np.int64)
    bloom.add_hashes(members)
    assert bloom.contains_hashes(members).all()  # no false negatives, ever

    probes = rng.integers(-(2**62), 2**62, 200_000, dtype=np.int64)
    probes = np.setdiff1d(probes, members)
    fp = bloom.contains_hashes(probes).mean()
    # allow 5x the design FPR as audit slack at this small m
    assert fp <= 5 * params.fpr, f"observed FPR {fp}"


def test_merge_is_union():
    params = BloomParams(n_capacity=1000, fpr=1e-3, num_shards=4)
    a, b = PartitionedBloom(params), PartitionedBloom(params)
    xs = np.arange(100, dtype=np.int64)
    ys = np.arange(100, 200, dtype=np.int64)
    a.add_hashes(xs)
    b.add_hashes(ys)
    m = a.merge(b)
    assert m.contains_hashes(xs).all() and m.contains_hashes(ys).all()


def test_distributed_build_and_probe(spark):
    params = BloomParams(n_capacity=10_000, fpr=1e-4, num_shards=8)
    df = spark.range(0, 5000).selectExpr("xxhash64(id) as url_hash")
    bloom = build_bloom(df, "url_hash", params)
    probed = bloom_negative_filter(df, "url_hash", bloom)
    # every member must probe positive regardless of partitioning
    assert probed.filter("NOT maybe_seen").count() == 0
    other = spark.range(100_000, 140_000).selectExpr("xxhash64(id) as url_hash")
    fp = bloom_negative_filter(other, "url_hash", bloom).filter("maybe_seen").count()
    assert fp / 40_000 <= 5 * params.fpr


def test_design_point_parameters():
    # the north-rule design point: FPR 1e-6 at 1e10 URLs — verify the math
    # without allocating: ~28.8 bits/URL, k≈20
    p = BloomParams(n_capacity=10_000_000_000, fpr=1e-6, num_shards=1024)
    total_bits = p.m_bits_per_shard * p.num_shards
    assert 28 <= total_bits / p.n_capacity <= 30
    assert 18 <= p.k_hashes <= 22
    # per-shard memory ~35 MB → executor-friendly broadcast granularity
    assert p.m_bits_per_shard / 8 / 1024 / 1024 < 64


def test_sharded_build_matches_broadcast(spark):
    """The distributed shard build/probe must agree bit-for-bit with the
    broadcast-tier PartitionedBloom on the same hashes."""
    from webarchive_discovery_spark.operators.bloom import (
        BloomParams,
        bloom_negative_filter_sharded,
        build_bloom,
        build_bloom_shards,
    )

    params = BloomParams(n_capacity=5000, fpr=1e-4, num_shards=8)
    seen = spark.range(2000).selectExpr("xxhash64(cast(id as string)) as url_hash")
    probe = spark.range(1500, 4000).selectExpr(
        "id", "xxhash64(cast(id as string)) as url_hash"
    )

    broadcast_bloom = build_bloom(seen, "url_hash", params)
    shards = build_bloom_shards(seen, "url_hash", params)
    assert shards.count() <= 8

    from webarchive_discovery_spark.operators.bloom import bloom_negative_filter

    a = {r["id"]: r["maybe_seen"] for r in
         bloom_negative_filter(probe, "url_hash", broadcast_bloom).collect()}
    b = {r["id"]: r["maybe_seen"] for r in
         bloom_negative_filter_sharded(probe, "url_hash", shards, params).collect()}
    assert a == b
    # negatives are definitive: every truly-seen id must be maybe_seen
    assert all(b[i] for i in range(1500, 2000))


def test_sharded_probe_empty_shard_is_unseen(spark):
    from webarchive_discovery_spark.operators.bloom import (
        BloomParams,
        bloom_negative_filter_sharded,
        build_bloom_shards,
    )

    params = BloomParams(n_capacity=100, fpr=1e-3, num_shards=4)
    seen = spark.createDataFrame([(4,)], "url_hash long")  # only shard 0 populated
    shards = build_bloom_shards(seen, "url_hash", params)
    probe = spark.createDataFrame([(5,), (4,)], "url_hash long")  # shards 1 and 0
    got = {r["url_hash"]: r["maybe_seen"] for r in
           bloom_negative_filter_sharded(probe, "url_hash", shards, params).collect()}
    assert got[4] is True and got[5] is False


def test_counting_bloom_remove_and_export():
    """CountingBloom (deletion tier of the north-rule's counting/cuckoo
    hybrid): removed members become negative again, kept members NEVER do
    (no false negatives — the prefilter contract); to_bloom() exports
    bit-identical membership to a fresh bit-Bloom build."""
    import numpy as np

    from webarchive_discovery_spark.operators.bloom import (
        BloomParams, CountingBloom, PartitionedBloom,
    )

    p = BloomParams(n_capacity=5000, fpr=1e-4, num_shards=4)
    cb = CountingBloom(p)
    rng = np.random.default_rng(7)
    a = rng.integers(-2**62, 2**62, 3000, dtype=np.int64)
    fresh = rng.integers(-2**62, 2**62, 3000, dtype=np.int64)
    cb.add_hashes(a)
    assert cb.contains_hashes(a).all()
    cb.remove_hashes(a[:1500])
    assert cb.contains_hashes(a[1500:]).all()  # no false negatives, ever
    assert cb.contains_hashes(a[:1500]).mean() < 0.01  # removal works
    assert cb.contains_hashes(fresh).mean() < 0.01     # FPR holds

    bm = cb.to_bloom()
    assert (bm.contains_hashes(a[1500:]) == cb.contains_hashes(a[1500:])).all()
    assert (bm.contains_hashes(fresh) == cb.contains_hashes(fresh)).all()

    # no-removal parity: counting build exports the exact bit Bloom
    pb = PartitionedBloom(p)
    pb.add_hashes(a)
    cb2 = CountingBloom(p)
    cb2.add_hashes(a)
    assert (cb2.to_bloom().bits == pb.bits).all()


def test_counting_bloom_saturation_safety():
    """A saturated cell is never incremented or decremented again —
    removing through a saturated cell must not create false negatives."""
    import numpy as np

    from webarchive_discovery_spark.operators.bloom import BloomParams, CountingBloom

    p = BloomParams(n_capacity=64, fpr=1e-3, num_shards=2)
    cb = CountingBloom(p)
    dup = np.repeat(np.int64(12345), 1000)
    for _ in range(3):
        cb.add_hashes(dup)
    assert cb.counts.max() == 255
    cb.remove_hashes(dup)
    assert cb.contains_hashes(np.array([12345], dtype=np.int64)).all()
    merged = cb.merge(cb)  # saturating elementwise sum
    assert merged.counts.max() == 255
