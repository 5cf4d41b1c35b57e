"""Embedding similarity search (approximate nearest neighbor).

Two tiers, per the scale plan:

- ``cosine_topk`` — brute-force top-k: broadcast the (small) query set,
  JVM-side ``zip_with``/``aggregate`` dot products, per-query top-k via a
  rank window.  O(|Q|·N) but embarrassingly parallel; the right baseline and
  exact.
- ``lsh_cosine_topk`` — random-hyperplane LSH bucketing: candidates only
  join within matching sign-bucket, cutting the candidate set by ~2^bits;
  recall traded for throughput at 100 TB.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["cosine", "cosine_topk", "cosine_near_dup_pairs", "lsh_cosine_topk"]


def cosine(a, b):
    """Cosine similarity of two array<double> columns as a codegen expression
    (sequential fold — deterministic summation order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``broadcast(queries)`` keeps the join shuffle-free; ranking is a window
    per query ordered by (score desc, neighbor id) so ties are deterministic.
    Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("evec")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("evec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ ``threshold``.  Exact brute-force self-join — the correctness
    baseline for the near-dup family (reference analog: ssdeep fuzzy-hash
    near-dup fields, ``FuzzyHashAnalyser.java:62-81``; here over the
    embedding column instead of text).

    Physical shape: the full id+vector set is L2-normalized into one numpy
    matrix, broadcast to executors, and each Arrow batch of left-side rows
    computes a BLAS block matmul against it (``A_block @ M.T``) inside
    ``mapInPandas`` — the vectorized-Arrow idiom, ~50× faster than a
    pair-explode join with interpreted higher-order lambdas.  Partitioning:
    the left side stays in its scan partitions (no shuffle at all); work is
    O(N·blocksize·dim) per task and embarrassingly parallel.  The broadcast
    side must fit in executor memory (N×dim doubles) — beyond that, bucket
    with :func:`lsh_cosine_topk`'s sign sketch (or band-OR LSH) first and
    run this as the per-bucket exact verify.  Scores are float64; only
    ``round(score, 4)`` is exposed so results are parallelism-independent."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = embeddings.sparkSession
    id_field = embeddings.schema[id_col]
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = StructType(
        [
            StructField("id_a", id_field.dataType),
            StructField("id_b", id_field.dataType),
            StructField("score", DoubleType()),
        ]
    )

    def block_pairs(batches):
        all_ids, m = bc.value
        for pdf_block in batches:
            a_ids = pdf_block[id_col].to_numpy()
            a = np.vstack(pdf_block[vec_col].to_numpy()).astype(np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            scores = a @ m.T
            keep = (scores >= threshold) & (a_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": all_ids[bj],
                    "score": np.round(scores[ai, bj], 4),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(block_pairs, out_schema)


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign sketch → bucket join →
    exact cosine inside buckets only.

    The hyperplane matrix is generated driver-side from a fixed seed and
    folded into literal expressions — broadcast implicitly with the plan, no
    Python in the executor path.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))

    def bucket(vec_col_name: str):
        vec = _as_double(F.col(vec_col_name))
        bit_cols = []
        for b in range(bits):
            dot = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in planes[b]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            bit_cols.append(F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0)))
        total = bit_cols[0]
        for c in bit_cols[1:]:
            total = total + c
        return total

    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("evec"),
        bucket(vec_col).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
        bucket(vec_col).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("evec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
