"""Revisit/duplicate resolution — the reference's "reduplication" join.

Reference: ``MDXReduplicatingReducer``
(``warc-hadoop-recordreaders/.../mdx/MDXReduplicatingReducer.java:72-152``):
group records by payload digest; the first ``response`` record in the group
is the exemplar; every ``revisit`` record is rewritten by merging the
exemplar's fields and marked ``record-type=reduplicated``.

Spark-first realization: a window ``first(..., ignorenulls)`` partitioned by
digest — one shuffle, no self-join, no driver state.  Exemplar choice is made
deterministic by ordering on a stable column (the reference relies on reducer
input order, which is only deterministic because its inputs are sorted; at
1000 executors we must order explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["reduplicate"]


def reduplicate(
    df: DataFrame,
    digest_col: str,
    type_col: str,
    merge_cols: list[str],
    order_col: str,
    response_type: str = "response",
    revisit_type: str = "revisit",
) -> DataFrame:
    """Rewrite revisit rows with the exemplar response's ``merge_cols``.

    Rows keep their own values when they are responses; revisits get the
    exemplar's values (or stay null if the digest has no response) and a
    ``record_type_out = 'reduplicated'`` marker.
    """
    w = (
        Window.partitionBy(digest_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = df
    for c in merge_cols:
        exemplar = F.first(
            F.when(F.col(type_col) == response_type, F.col(c)), ignorenulls=True
        ).over(w)
        out = out.withColumn(
            c,
            F.when(
                F.col(type_col) == revisit_type, F.coalesce(exemplar, F.col(c))
            ).otherwise(F.col(c)),
        )
    has_exemplar = (
        F.count(F.when(F.col(type_col) == response_type, 1)).over(w) > 0
    )
    return out.withColumn(
        "record_type_out",
        F.when(
            (F.col(type_col) == revisit_type) & has_exemplar, F.lit("reduplicated")
        ).otherwise(F.col(type_col)),
    )


def revisit_shortcircuit(captures: DataFrame) -> DataFrame:
    """WARC revisit short-circuit in the RECORD path
    (``WARCIndexer.java:432-437``): revisit records carry no payload, so
    ``content_length`` is nulled (it is 0 and would skew statistics) and
    ``content_type`` is copied from the served type (no Tika/DROID pass for
    revisits).  Downstream, :func:`reduplicate` resolves the revisit against
    its original response by digest."""
    is_revisit = F.lower(F.col("record_type")) == "revisit"
    return captures.withColumn(
        "content_length",
        F.when(is_revisit, F.lit(None).cast("int")).otherwise(F.col("content_length")),
    ).withColumn(
        "content_type",
        F.when(is_revisit, F.col("content_type_served")).otherwise(F.col("content_type")),
    )
