"""Data Selection via Importance Resampling (DSIR) for training corpora.

Implements the hashed-n-gram importance-resampling recipe of Xie et al.,
"Data Selection for Language Models via Importance Resampling" (NeurIPS
2023), Spark-first: pick raw documents whose hashed n-gram distribution
looks like a (small) target corpus, by scoring each document with a
bag-of-buckets naive-Bayes log-likelihood ratio and sampling with Gumbel
top-k (which samples without replacement ∝ softmax of the scores —
deterministic here via hash-derived uniforms, so any parallelism level
selects the identical set).

(The reference has no data-selection tier — its nearest analog is the
collection/source facet routing in ``WARCIndexer.java``; this operator is
part of the beyond-reference LLM-pipeline surface, like ``dedup.py``'s
MinHash family.)

100 TB design:

- Feature extraction is pure codegen (``split``/``transform``/``md5``);
  feature rows explode to ~tokens-per-doc, then collapse through ONE hash
  aggregate keyed by bucket (≤ ``buckets`` rows survive — the "model").
- The bucket→log-ratio table is broadcast; scoring is a broadcast join plus
  one hash aggregate keyed by doc — no shuffle of the corpus beyond the
  per-doc sum, no Python anywhere.
- Selection is ``orderBy(score).limit(k)`` → TakeOrderedAndProject (per-
  partition heaps + driver merge of k rows, never a global sort).
- ``md5``-derived hashing keeps an exact ANSI-SQL oracle; swap the bucket
  hash to ``xxhash64`` for ~2× feature throughput when oracle parity is not
  needed (the explode dominates either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import values_df

__all__ = [
    "hashed_ngram_buckets",
    "dsir_bucket_model",
    "dsir_log_weights",
    "dsir_select",
    "doc_bucket_counts",
    "train_quality_classifier",
    "quality_scores",
]


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )


def hashed_ngram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 1024,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into hashed word uni+bigram feature occurrences:
    ``(id, bucket [, keep_cols…])`` with ``bucket = int(md5(feat)[:8], 16) %
    buckets``.

    Built explode-FIRST like :func:`.dedup.exploded_shingles`: project the
    token array into a real column, explode a flat feature index, and
    assemble each feature with plain ``get``/``concat_ws``.  A
    ``transform(sequence(…), i → element_at(tokens_expr, i))`` lambda
    re-evaluates the whole tokenizer expression per element (interpreted,
    outside codegen) — measured 12× slower at sf0.1 for identical output.
    Index layout: ``0..n-1`` → unigrams, ``n..2n-2`` → bigrams."""
    keep = [F.col(c) for c in (keep_cols or [])]
    pre = df.select(
        F.col(id_col).alias("id"), *keep, _tokens(text_col).alias("_t")
    )
    n = F.size(F.col("_t"))
    cnt = n + F.when(n >= 2, n - 1).otherwise(F.lit(0))
    idx = F.when(cnt > 0, F.sequence(F.lit(0), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    i = F.col("_i")
    feat = F.when(i < n, F.get("_t", i)).otherwise(
        F.concat_ws(" ", F.get("_t", i - n), F.get("_t", i - n + 1))
    )
    return pre.select("id", *[F.col(c) for c in (keep_cols or [])], "_t",
                      F.explode(idx).alias("_i")).select(
        "id",
        *[F.col(c) for c in (keep_cols or [])],
        (
            F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
            % buckets
        ).alias("bucket"),
    )


def dsir_bucket_model(
    feats: DataFrame, is_target: Column, buckets: int = 1024, alpha: float = 1.0
) -> DataFrame:
    """Fit both bag-of-buckets unigram models in ONE pass: per bucket, the
    Laplace-smoothed log probability ratio ``ln p_target - ln p_raw``.
    ``is_target`` marks the rows of ``feats`` (from
    :func:`hashed_ngram_buckets`, any extra columns preserved) belonging to
    the target corpus; the raw model uses ALL rows.  Output ≤ ``buckets``
    rows — broadcastable.  Totals come from a 1-row aggregate broadcast via
    ``crossJoin`` (fully lazy, same pattern as PageRank's dangling mass)."""
    stats = feats.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("_ct"),
        F.count(F.lit(1)).alias("_cr"),
    )
    totals = stats.agg(
        F.sum("_ct").alias("_T"), F.sum("_cr").alias("_R")
    )
    a, b = float(alpha), float(alpha) * buckets
    return (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(F.col("_ct") + a) - F.log(F.col("_T") + b)
                - F.log(F.col("_cr") + a) + F.log(F.col("_R") + b)
            ).alias("log_ratio"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: DataFrame,
    buckets: int = 1024,
) -> DataFrame:
    """Per-document importance log-weight ``ln w(x) = Σ_f log_ratio[h(f)]``
    summed over feature OCCURRENCES — broadcast join + one doc-keyed hash
    aggregate.  The raw model covers every bucket the corpus emits (it was
    fit on the same corpus), so the join is inner without loss."""
    feats = hashed_ngram_buckets(df, text_col, id_col, buckets)
    return (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(F.sum("log_ratio").alias("log_weight"))
        .select(F.col("id").alias(id_col), "log_weight")
    )


def dsir_select(
    weights: DataFrame, k: int, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Gumbel top-k selection: keep the ``k`` documents maximizing
    ``log_weight + Gumbel(0,1)`` — equivalent to sampling k docs without
    replacement with probability ∝ w(x) (Gumbel-max trick).  The Gumbel
    noise is hash-derived (``md5(seed:id)`` → uniform in (0,1) →
    ``-ln(-ln u)``), so selection is deterministic for a given seed at any
    cluster size.  Plan: TakeOrderedAndProject, never a global sort."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("score", F.col("log_weight") + gumbel)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def doc_bucket_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    buckets: int = 1024,
) -> DataFrame:
    """Per-document hashed-feature counts ``(id, bucket, c, y)`` — the
    design matrix for :func:`train_quality_classifier`, one hash aggregate
    over the exploded features."""
    feats = hashed_ngram_buckets(
        df.withColumn("_y", label.cast("double")), text_col, id_col,
        buckets, keep_cols=["_y"],
    )
    return feats.groupBy("id", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.first("_y").alias("y"),
    )


def train_quality_classifier(
    x: DataFrame,
    buckets: int = 1024,
    iters: int = 10,
    lr: float = 0.5,
) -> list[float]:
    """Train a fastText/WebText-style quality classifier IN the cluster:
    logistic regression over hashed n-gram counts by full-batch gradient
    descent.  Each iteration is two key-parallel aggregates over the design
    matrix (score docs under the broadcast weights, then accumulate the
    per-bucket gradient); the only driver traffic is the ≤ ``buckets``-float
    weight vector per iteration (model-fetch collect, same budget as IVF's
    centroid fetch).  Weights start at zero and every update is a plain sum
    of data values, so runs differ only by float summation order (~1e-15
    relative) across parallelism levels; round scores for bit-stable
    comparisons.

    Returns the trained weight list (index = bucket).  ``w_b ← w_b -
    lr/N · Σ_docs c_db (σ(z_d) - y_d)`` with ``z_d = Σ_b c_db w_b``.

    Iteration shape (r6 optimization — guide §2.4 / §1.2-1): each iteration
    computes ``z_d`` as a WINDOW sum over the doc partition directly on the
    cached design matrix — the broadcast weights join adds no exchange, and
    the matrix is cached hash(id)-partitioned and (id, bucket)-sorted, a
    layout ``cache()`` PRESERVES (``localCheckpoint``'s LogicalRDD reports
    Unknown partitioning), so the window re-shuffles NOTHING: the iteration
    is just the tiny per-bucket gradient exchange (map-side partials
    collapse it to ≤ ``buckets`` rows per partition) and ONE collect.
    Previous shapes: groupBy(id) exchange + an id-keyed scores⋈matrix join
    + groupBy(bucket) exchange (r5); checkpoint + a per-iteration id
    exchange for the window (early r6).  The (id, bucket) sort also FIXES
    the float summation order of ``z_d`` — fully deterministic across runs,
    not just across parallelism levels.  The distinct-id count doubles as
    the cache-materialization action.  The loop is planned statically
    (:func:`..session.static_plans`): fixed-shape rounds with ≤ ``buckets``
    aggregate keys gain nothing from AQE, and each AQE exchange would cost
    its own stage-job."""
    from pyspark.sql import Window

    from ..session import static_plans

    spark = x.sparkSession
    with static_plans(spark):
        x = (
            x.repartition(spark.sparkContext.defaultParallelism, "id")
            .sortWithinPartitions("id", "bucket")
            .cache()
        )
        n_docs = x.select("id").distinct().count()
        w = [0.0] * buckets
        wid = Window.partitionBy("id")
        for _ in range(iters):
            # LocalRelation weights (session.values_df): a parallelized
            # weight RDD cost a 32-task broadcast-build job per GD iteration
            wdf = values_df(
                spark,
                [(b, float(wb)) for b, wb in enumerate(w) if wb != 0.0] or [(0, 0.0)],
                "bucket long, w double",
            )
            z = F.sum(F.col("c") * F.coalesce("w", F.lit(0.0))).over(wid)
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z"))) - F.col("y")
            grad = (
                x.join(F.broadcast(wdf), "bucket", "left")
                .withColumn("_z", z)
                .groupBy("bucket")
                .agg(F.sum(F.col("c") * err).alias("g"))
                .collect()
            )
            for r in grad:
                w[int(r["bucket"])] -= lr * float(r["g"]) / n_docs
    x.unpersist()
    return w


def quality_scores_from_counts(
    x: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents from an EXISTING ``(id, bucket, c)`` design matrix:
    ``prob = σ(Σ_b c_db·w_b)`` — when a training pass already built the
    bucket counts, re-using them here skips a second tokenize + hash +
    explode + aggregate pass over the corpus (r6, guide §2.4).  This is
    also literally the oracle's scoring formula (``sum(x.c * w.w)``);
    :func:`quality_scores` computes the same sum occurrence-by-occurrence
    from raw text when no matrix exists."""
    spark = x.sparkSession
    wdf = values_df(
        spark, [(b, float(wb)) for b, wb in enumerate(weights)],
        "bucket long, w double",
    )
    return (
        x.join(F.broadcast(wdf), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("w")).alias("z"))
        .select(
            F.col("id").alias(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("prob"),
        )
    )


def quality_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: list[float],
    buckets: int = 1024,
) -> DataFrame:
    """Score documents under a trained classifier: ``(id, prob)`` with
    ``prob = σ(Σ_b c_db w_b)`` — broadcast weights join + one doc-keyed
    aggregate, no Python."""
    spark = df.sparkSession
    wdf = values_df(
        spark, [(b, float(wb)) for b, wb in enumerate(weights)],
        "bucket long, w double",
    )
    feats = hashed_ngram_buckets(df, text_col, id_col, buckets)
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("id")
        .agg(F.sum("w").alias("z"))
        .select(
            F.col("id").alias(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("prob"),
        )
    )
