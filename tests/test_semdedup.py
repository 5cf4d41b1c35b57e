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
