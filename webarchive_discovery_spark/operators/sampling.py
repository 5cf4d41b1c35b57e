"""Deterministic per-key sampling.

Reference: ``ReservoirSamplingReducer``
(``warc-hadoop-recordreaders/.../mapreduce/ReservoirSamplingReducer.java:54-100``)
— fixed-seed (1231241245) reservoir of N=1000 values per key.  A literal
reservoir depends on reducer input *order*, which is nondeterministic across
cluster sizes; the Spark-first equivalent keeps the uniform-sample semantics
but defines the sample purely from data values: rank rows per key by a seeded
hash of the value and keep the first N.  Same key ⇒ same sample at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["deterministic_reservoir", "temperature_sample"]

DEFAULT_SEED = 1231241245  # rsr.seed default in the reference
DEFAULT_SAMPLE_SIZE = 1000  # rsr.sample.size default


def deterministic_reservoir(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n: int = DEFAULT_SAMPLE_SIZE,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Keep ≤ n rows per key, chosen by seeded-hash order of the value.

    Uses md5 (not xxhash64) as the ordering hash so external SQL oracles can
    reproduce the exact sample; the hash only orders rows, so its speed is
    irrelevant next to the shuffle.
    """
    rank_hash = F.md5(F.concat_ws("\x01", F.col(value_col).cast("string"), F.lit(str(seed))))
    w = Window.partitionBy(*key_cols).orderBy(rank_hash, F.col(value_col).cast("string"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.3,
    budget: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based mixture sampling (the mC4/XLM-R recipe: sample
    group g with probability ∝ n_g^alpha, alpha < 1 upweighting the tail so
    low-resource languages/domains survive).  Appends per-row audit columns
    ``group_n`` (group size), ``mix_weight`` (n^alpha renormalized),
    ``sample_rate`` (min(1, budget·weight/n)), ``sample_u`` (seeded
    md5-uniform), and ``sample_keep = u < rate``; nothing is dropped — the
    caller filters on ``sample_keep``.

    100 TB shape: one group-count aggregate, a 1-row totals broadcast
    (crossJoin, the PageRank dangling-mass pattern), one broadcast join of
    the tiny per-group table back onto the corpus, and a pure-codegen
    keep decision — deterministic at any parallelism for a given seed.
    ``budget`` defaults to the corpus size (reweighting without shrinking).
    md5 keeps the uniform restatable in an ANSI-SQL oracle."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("group_n"))
    totals = counts.agg(
        F.sum(F.pow("group_n", F.lit(alpha))).alias("_z"),
        F.sum("group_n").alias("_N"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        "group_n",
        (F.pow("group_n", F.lit(alpha)) / F.col("_z")).alias("mix_weight"),
        F.least(
            F.lit(1.0),
            (F.coalesce(F.lit(budget).cast("double"), F.col("_N").cast("double"))
             * F.pow("group_n", F.lit(alpha)) / F.col("_z"))
            / F.col("group_n"),
        ).alias("sample_rate"),
    )
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
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("sample_u", u)
        .withColumn("sample_keep", F.col("sample_u") < F.col("sample_rate"))
    )
