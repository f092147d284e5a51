"""Packed-exchange arm for the no-reduction regime: ship ONE long
(store_id*1024 + v) through the repartition exchange instead of two,
cutting UnsafeRow exchange width 24 -> 16 bytes/row."""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from database_join_spark.datagen import (
    Q4112Config, q4112_frames, part2_query_repartition_first)
from database_join_spark.session import get_spark

spark = get_spark(app_name="packed-regroup-probe")
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism
ROWS = 1_000_000_000
cfg = Q4112Config(inner_tuples=100, outer_tuples=ROWS,
                  groups=100_000_000, outer_selectivity=1.0,
                  price_max=50, qty_max=20)
parts = 4 * cores

def packed_query(items, orders, partitions):
    joined = orders.join(F.broadcast(items), items.id == orders.item_id)
    pre = joined.select(
        (F.col("store_id") * 1024
         + F.col("price") * F.col("quantity")).alias("p"))
    per_store = (
        pre.repartition(partitions, F.shiftright("p", 10))
        .groupBy(F.shiftright("p", 10).alias("store_id"))
        .agg(F.expr("sum(p)").alias("sp"), F.count("*").alias("c"))
        .select(F.expr("(sp - store_id * 1024 * c) DIV c").alias("g")))
    return per_store.agg(
        F.expr("sum(g) DIV count(g)").alias("avg_of_avgs"),
        F.count("g").alias("n_groups"))

out = {}
answers = {}
for name, fn in (("baseline_repart_first",
                  lambda it, od: part2_query_repartition_first(it, od, parts)),
                 ("packed_repart_first",
                  lambda it, od: packed_query(it, od, parts))):
    runs = []
    for _ in range(3):  # first = warm-up
        items, orders = q4112_frames(spark, cfg, parts)
        t0 = time.perf_counter()
        rows = fn(items, orders).collect()
        runs.append(time.perf_counter() - t0)
    answers[name] = [tuple(r) for r in rows]
    out[name] = {"sec": round(min(runs[1:]), 4),
                 "runs": [round(r, 4) for r in runs[1:]]}
    print(f"# {name}: {out[name]} answer={answers[name]}", file=sys.stderr)
out["answers_match"] = answers["baseline_repart_first"] == answers["packed_repart_first"]
print(json.dumps(out))
