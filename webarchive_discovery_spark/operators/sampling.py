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

__all__ = ["deterministic_reservoir"]

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
