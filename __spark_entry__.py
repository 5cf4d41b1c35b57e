"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier fetch-order epoch at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full correctness-gate catalog
(see ``webarchive_discovery_spark/plans/gate_queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from webarchive_discovery_spark.plans import gate_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: one full crawl-frontier
    epoch (canonicalize → dedup → robots → politeness → global fetch order)."""
    return gate_queries.QUERIES["frontier_fetch_order"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(gate_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(gate_queries.ORACLES)
