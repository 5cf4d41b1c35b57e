"""Host-graph operators: PageRank over the crawl link graph.

The reference derives host-level link graphs (``links_hosts`` fields, the
``hostLinks`` dataset — ``WARCDatasetGenerator``); crawl schedulers rank
hosts/pages by link structure.  The north rule's priority score consumes
raw inlink counts; this operator supplies the classic global ranking —
power-iteration PageRank (Brin & Page 1998) as pure DataFrame joins and
aggregations, one shuffle pair per iteration.

Scale shape: ranks and degrees are keyed on the vertex id; each iteration
is ``ranks ⋈ edges`` (co-partitioned hash join on ``src``) → hash agg on
``dst`` — the standard Pregel-free formulation.  Dangling-vertex mass is
redistributed uniformly each iteration (the textbook correction), computed
with one scalar agg.  Lineage is truncated every few iterations
(``localCheckpoint``) so the plan stays O(1) across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``(vertex, rank)`` after ``iterations`` power steps of
    ``r'(t) = (1-d)/N + d·(Σ_{s→t} r(s)/deg(s) + dangling_mass/N)``.

    Deterministic up to floating-point summation order (consumers should
    round; the gate rounds to 6 decimals)."""
    verts = (
        edges.select(F.col(src).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint()  # reused every iteration; vertex count below
    )
    n = verts.count()
    deg = edges.groupBy(F.col(src).alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("t"))
    for it in range(iterations):
        with_deg = ranks.join(deg, "v", "left")
        # dangling vertices (no out-edges) donate their mass uniformly —
        # carried as a broadcast 1-row scalar, NOT a driver collect: each
        # iteration stays a lazy plan fragment, no per-step driver sync
        dangling = F.broadcast(
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_m"))
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(e, "v")
            .groupBy(F.col("t").alias("v"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_sum"))
        )
        ranks = (
            verts.join(contribs, "v", "left")
            .crossJoin(dangling)
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.coalesce(F.col("in_sum"), F.lit(0.0))
                                        + F.col("_m") / n)
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(F.col("v").alias("vertex"), "rank")
