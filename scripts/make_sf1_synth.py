"""Synthesize a 10x (sf1-equivalent) copy of the sf0.1 test tables for the
scale-step bench (VERDICT r5, item 2).  /root/testdata is read-only and the
driver owns the real generator, so this amplifies sf0.1 by unioning ten
key-shifted copies per table: copy k offsets every key column by
k * (max_key_of_its_home_table + 1), so primary keys stay unique AND the
foreign-key joins (lineitem->orders/part/supplier, orders->customer) keep
their 1:N shape instead of collapsing onto copy 0.  Modulo-derived gate
distributions (hosts, archetypes, variants — all id % m) are preserved.
Timing-only data — the oracle gates keep running on the driver's sf dirs.

Usage: python scripts/make_sf1_synth.py [out_dir]   (default /dev/shm/sf1synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webarchive_discovery_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key columns to shift per table, each tagged with the stride-defining home
# table (primary keys shift by their own table's stride, foreign keys by the
# referenced table's)
SHIFTS = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"),
                 ("l_suppkey", "supplier")],
    "events": [("event_id", "events")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

# primary key per home table (for stride computation)
PK = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}

SMALL = ["region", "nation"]  # tiny dims: copied as-is


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1synth"
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    strides = {
        t: spark.read.parquet(f"{SRC}/{t}.parquet").agg(F.max(pk)).collect()[0][0] + 1
        for t, pk in PK.items()
    }
    for table in SMALL:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{table}.parquet")
    for table, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        legs = []
        for k in range(COPIES):
            leg = src
            for col, home in shifts:
                leg = leg.withColumn(col, F.col(col) + F.lit(k * strides[home]))
            legs.append(leg)
        df = legs[0]
        for leg in legs[1:]:
            df = df.unionByName(leg)
        df.repartition(32).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: x{COPIES}", flush=True)
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
