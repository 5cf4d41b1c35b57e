"""SemDeDup (similarity.semantic_dedup): keep rule, group structure,
threshold behavior, and plan shape."""

import numpy as np
from pyspark.sql import functions as F

from webarchive_discovery_spark.operators import similarity

CENTS = np.array([[1.0, 0.0], [0.0, 1.0]])


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_keeps_farthest_from_centroid(spark):
    # one duplicate group around centroid 0 with DISTINCT centroid sims:
    # all pairwise cosines ≥ 0.9, keep = lowest centroid_sim (most atypical)
    a = [1.0, 0.0]
    b = [0.98, float(np.sqrt(1 - 0.98**2))]
    c = [0.95, float(np.sqrt(1 - 0.95**2))]
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(
            _emb(spark, [(1, a), (2, b), (3, c)]), CENTS, threshold=0.9
        ).collect()
    }
    assert {r["component"] for r in out.values()} == {1}
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, False, True]
    assert out[3]["centroid_sim"] == 0.95
    assert out[1]["cluster"] == 0


def test_singletons_survive(spark):
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(
            _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]), CENTS
        ).collect()
    }
    assert all(r["keep"] for r in out.values())
    assert out[1]["component"] == 1 and out[2]["component"] == 2


def test_threshold_splits_groups(spark):
    # cos(a, b) ≈ 0.98 ≥ 0.95 → dup; cos(a, c) ≈ 0.90 < 0.95 → distinct,
    # but cos(b, c) ≈ 0.965 ≥ 0.95 chains them into ONE component
    a = [1.0, 0.0]
    b = [0.98, float(np.sqrt(1 - 0.98**2))]
    c = [0.90, float(np.sqrt(1 - 0.90**2))]
    out = similarity.semantic_dedup(
        _emb(spark, [(1, a), (2, b), (3, c)]), CENTS, threshold=0.95
    )
    comps = {r["vec_id"]: r["component"] for r in out.collect()}
    assert comps == {1: 1, 2: 1, 3: 1}  # transitive closure via b
    # with a higher threshold c splits off
    out2 = similarity.semantic_dedup(
        _emb(spark, [(1, a), (2, b), (3, c)]), CENTS, threshold=0.97
    )
    comps2 = {r["vec_id"]: r["component"] for r in out2.collect()}
    assert comps2[3] == 3 and comps2[1] == comps2[2] == 1


def test_duplicates_across_scale(spark):
    # cosine is scale-invariant: scaled copies are exact duplicates
    out = similarity.semantic_dedup(
        _emb(spark, [(10, [3.0, 0.0]), (11, [7.0, 0.0]), (12, [0.5, 0.0])]),
        CENTS,
    )
    rows = out.collect()
    assert {r["component"] for r in rows} == {10}
    assert sum(r["keep"] for r in rows) == 1


def test_row_count_preserved_and_shares_quantizer(spark):
    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    cents = similarity.ivf_centroids(8, 4, seed=5)
    out = similarity.semantic_dedup(_emb(spark, rows), cents, threshold=0.95)
    assert out.count() == 50
    assert out.filter(F.col("keep")).count() >= 1
    assert out.select("cluster").distinct().count() <= 4


def test_hot_cluster_auto_routed(spark):
    """A skewed cluster (80% of rows in one k-means cell) is automatically
    sub-blocked: results are IDENTICAL to the unrouted single-task plan, and
    no (cluster, pa, pb) task ever receives the whole hot cluster — the
    per-task input is bounded by ~2 sub-blocks regardless of cluster size."""
    rng = np.random.default_rng(7)
    rows = []
    # hot cluster 0: 160 vectors hugging [1, 0] in 8 near-dup bundles of 20
    for g in range(8):
        base = np.array([1.0, 0.02 * g])
        base = base / np.linalg.norm(base)
        for i in range(20):
            v = base + rng.normal(0, 1e-4, 2)
            rows.append((g * 20 + i, (v / np.linalg.norm(v)).tolist()))
    # cold cluster 1: 40 spread-out vectors near [0, 1]
    for i in range(40):
        v = np.array([0.05 * (i % 7), 1.0])
        v = v / np.linalg.norm(v)
        rows.append((1000 + i, v.tolist()))
    emb = _emb(spark, rows)

    unrouted = similarity.semantic_dedup(emb, CENTS, threshold=0.999,
                                         max_cluster_rows=10_000)
    routed = similarity.semantic_dedup(emb, CENTS, threshold=0.999,
                                       max_cluster_rows=50)
    key = lambda r: r["vec_id"]
    assert sorted(map(tuple, routed.collect()), key=lambda t: t[0]) == \
           sorted(map(tuple, unrouted.collect()), key=lambda t: t[0])

    # replicate the routing arithmetic: with 160 rows and a 50-row cap the
    # hot path uses nb = ceil(160/25) = 7 sub-blocks; the largest
    # (cluster, pa, pb) task input must be well below the full cluster
    block_rows = 50 // 2
    nb = -(-160 // block_rows)
    blk = emb.limit(160).select(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nb)).cast("int").alias("b")
    ).groupBy("b").count().collect()
    per_block = {r["b"]: r["count"] for r in blk}
    worst_task = max(per_block.values()) + max(
        (c for b, c in per_block.items()), default=0
    )
    assert worst_task < 160, per_block
    # routing must actually engage: the pair-builder plan has BOTH pandas
    # group kernels (cold per-cluster + hot per-(cluster, pa, pb)) and the
    # hot side groups on the sub-block pair columns.  (semantic_dedup's own
    # output plan is lineage-truncated by the CC loop's localCheckpoint, so
    # probe the builder directly on an assignment-shaped frame.)
    assignment = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_vec"),
        F.when(F.col("vec_id") < 1000, 0).otherwise(1).alias("cluster"),
    )
    pair_plan = similarity._within_cluster_pairs(
        assignment, 0.999, 50
    )._jdf.queryExecution().analyzed().toString()
    assert pair_plan.count("FlatMapGroupsInPandas") == 2, pair_plan
    assert "_pa" in pair_plan and "_pb" in pair_plan
