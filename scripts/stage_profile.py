"""Per-stage scaling profile of the frontier epoch job — root-causes which
stage bends the 4->16-core curve (VERDICT r3 "What's wrong" #3).

Runs the SAME epoch pipeline as scripts/scaling_bench.py but truncated at
successive cut points, at two core counts (one subprocess JVM per level).
All cuts run INTERLEAVED inside the level's JVM — trial t runs every cut
before trial t+1 starts — so host-load drift between separate processes
(measured ~2x on this shared VM) hits all cuts alike and the cross-cut
subtraction stays meaningful; per cut the min over trials is reported.  The per-stage marginal cost at each level isolates where
efficiency is lost:

  canon   : Arrow-UDF canonicalize pass (embarrassingly parallel — should
            scale ~linearly; if it doesn't, the ceiling is host CPU/memory
            bandwidth, not the plan)
  dedup   : + hash shuffle keyed by host + (host,url_norm) aggregate
  window  : + robots broadcast join + per-host politeness running sum
            (reuses the dedup exchange — fused, no extra shuffle)
  sequence: + range repartition + staged parquet write + offset stamp
            (the tmpfs staging write suspected as the serial bottleneck)

Usage: python scripts/stage_profile.py [small] [large] [replication] [trials]
Writes BENCH/stage_profile.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

JOB = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F, Window
from webarchive_discovery_spark.session import get_spark
from webarchive_discovery_spark.operators import frontier

cores = int(os.environ["CORES"])
repl = int(os.environ["REPLICATION"])
cut = os.environ["CUT"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(f"profile-{cores}-{cut}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet(f"{sf_dir}/events.parquet")
rep = ev.crossJoin(spark.range(repl).withColumnRenamed("id", "rep"))
hostn = (F.col("user_id") % 20) * repl + F.col("rep")
hostlabel = F.concat(F.lit("h"), F.lpad(hostn.cast("string"), 5, "0"))
host = F.concat(hostlabel, F.lit(".example.org"))
n = F.floor(F.col("event_id") / 2).cast("long")
v = F.col("event_id") % 4
basep = F.concat(F.lit("/p/"), n.cast("string"))
url = (
    F.when(v == 0, F.concat(F.lit("http://"), host, basep))
    .when(v == 1, F.concat(F.lit("https://"), host, basep))
    .when(v == 2, F.concat(F.lit("http://www."), host, basep, F.lit("/")))
    .otherwise(F.concat(F.lit("https://"), host, basep, F.lit("?q=a b")))
)
urls = rep.select(
    (F.col("event_id") * repl + F.col("rep")).alias("event_id"),
    url.alias("url"), hostn.alias("hostn"),
).repartition(cores * 2).localCheckpoint()

rules = spark.range(20 * repl).selectExpr(
    "concat('h', lpad(cast(id as string), 5, '0'), '.example.org') as host",
    "case when id % 5 = 0 then 'deny' else 'allow' end as rule_type",
    "case when id % 5 = 0 then '/p/' else '/' end as path_prefix",
    "cast(100 * (id % 4 + 1) as int) as crawl_delay_ms",
)

def build(u):
    fr = frontier.canonicalize_frontier(u, "url")
    if cut == "canon":
        return fr
    # fused dedup: ONE hash exchange on host serves the aggregate AND the
    # downstream per-host politeness window (gate_queries._frontier_dedup)
    dd = fr.repartition("host").groupBy("host", "url_norm").agg(
        F.min("url_key").alias("url_key"),
        F.min("url_path").alias("url_path"),
        F.min("event_id").alias("first_event"), F.count(F.lit(1)).alias("inlinks"))
    if cut == "dedup":
        return dd
    pri = dd.withColumn("priority",
        frontier.priority_score(F.col("first_event") % 3, F.col("inlinks")))
    rm = frontier.robots_match(pri, rules).select(
        "url_key", "host", "priority", "robots_allowed")
    w = (Window.partitionBy("host")
         .orderBy(F.col("priority").desc(), F.col("url_key"))
         .rowsBetween(Window.unboundedPreceding, 0))
    sl = rm.withColumn("slot",
        F.sum(F.when(F.col("robots_allowed"), 1).otherwise(0)).over(w))
    band = sl.withColumn("band", F.least(F.lit(3), F.floor(F.col("priority") * 2).cast("int")))
    if cut == "window":
        return band
    return frontier.global_sequence(
        band, [F.col("band").desc(), F.col("slot").asc(), F.col("url_key").asc()],
        num_partitions=cores)

CUTS = ["canon", "dedup", "window", "sequence"]

def run(u, c):
    global cut
    cut = c
    df = build(u)
    df.write.format("noop").mode("overwrite").save()
    frontier.release_staging()

for c in CUTS:
    run(urls.sample(0.02, seed=1), c)  # full-shape warm-up, every cut

# INTERLEAVED trials: cuts alternate within this one JVM, so slow host
# windows hit all cuts alike and cross-cut subtraction stays meaningful
trials = int(os.environ.get("TRIALS", "3"))
best = {}
for _ in range(trials):
    for c in CUTS:
        t0 = time.time()
        run(urls, c)
        sec = time.time() - t0
        best[c] = min(best.get(c, 1e9), sec)
print(json.dumps({"cores": cores, "cumulative": {c: round(best[c], 2) for c in CUTS}}))
"""


CUTS = ["canon", "dedup", "window", "sequence"]


def run_level(cores: int, repl: int, trials: int) -> dict:
    mem = os.environ.get("SPARK_DRIVER_MEMORY", f"{max(6, 3 * cores)}g")
    env = dict(os.environ, CORES=str(cores), CUT="all", REPLICATION=str(repl),
               TRIALS=str(trials), SPARK_DRIVER_MEMORY=mem,
               REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-c", JOB], env=env,
                         capture_output=True, text=True, timeout=3000)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output cores={cores}:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])["cumulative"]


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    cum = {}
    for cores in (small, large):
        cum[cores] = run_level(cores, repl, trials)
        print(json.dumps({"cores": cores, "cumulative": cum[cores]}))

    stages = []
    prev_s = prev_l = 0.0
    for cut in CUTS:
        ms, ml = cum[small][cut] - prev_s, cum[large][cut] - prev_l
        prev_s, prev_l = cum[small][cut], cum[large][cut]
        speed = ms / ml if ml > 0 else float("inf")
        stages.append({
            "stage": cut,
            f"marginal_sec_{small}c": round(ms, 2),
            f"marginal_sec_{large}c": round(ml, 2),
            "speedup": round(speed, 2),
            "efficiency": round(speed / (large / small), 3),
        })
    report = {"small": small, "large": large, "replication": repl,
              "trials": trials, "cumulative": cum, "stages": stages}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/stage_profile.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
