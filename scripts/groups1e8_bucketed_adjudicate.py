#!/usr/bin/env python
"""part2_groups1e8_bucketed anomaly adjudication (round 13 close).

The r13 full capture recorded the row at 13.30 s warm with a
COLD run of 7.29 s — warm slower than cold, on code untouched since
r12 (which measured 6.43 warm / 7.75 cold). The full capture's host
block shows the hazard (start load1 4.93, the 1e9-row sections
preceding it in the same JVM); this script isolates the row the
GROUPS1E6_ADJUDICATION way: fresh JVM, the bench's exact spelling
(write_bucketed_aligned B=128 + broadcast-items join + capacityBit
20), warm-up semantics identical to bench.py (run 0 = cold scan,
min of the rest = warm).

Writes GROUPS1E8_BUCKETED_ADJUDICATION.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

ROWS = 1_000_000_000
BUCKETS = 128


def main() -> None:
    from pyspark.sql import functions as F

    from database_join_spark.datagen import Q4112Config, q4112_frames
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators.bucketing import (
        write_bucketed_aligned,
    )
    from database_join_spark.plans.sizing import applied  # noqa: F401
    from database_join_spark.plans.stats import plan_for_cached
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="groups1e8-bucketed-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    nr_cfg = Q4112Config(
        inner_tuples=100,
        outer_tuples=ROWS,
        groups=min(100_000_000, ROWS),
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )
    items, orders = q4112_frames(spark, nr_cfg, cores)
    nr_sizing, _ = plan_for_cached(
        orders, ["store_id"], table_key=f"q4112:{nr_cfg}"
    )
    nr_parts = nr_sizing.tasks(cores)

    out: dict = {"rows": ROWS, "buckets": BUCKETS, "tasks": nr_parts}
    out["host_start"] = host_snapshot()
    spark.sql("DROP TABLE IF EXISTS bench_p2_fact")
    try:
        items, orders = q4112_frames(spark, nr_cfg, nr_parts)
        t0 = time.perf_counter()
        write_bucketed_aligned(
            orders, "bench_p2_fact", BUCKETS, ["store_id"]
        )
        out["build_sec"] = round(time.perf_counter() - t0, 2)

        def _bucketed_part2():
            items, _ = q4112_frames(spark, nr_cfg, nr_parts)
            per_store = (
                spark.table("bench_p2_fact")
                .join(F.broadcast(items), F.col("id") == F.col("item_id"))
                .groupBy("store_id")
                .agg(F.expr("sum(price * quantity) DIV count(*)").alias("g"))
            )
            return per_store.agg(
                F.expr("sum(g) DIV count(g)").alias("avg_of_avgs"),
                F.count("g").alias("n_groups"),
            )

        old_bit = spark.conf.get(
            "spark.sql.codegen.aggregate.fastHashMap.capacityBit", "16"
        )
        spark.conf.set(
            "spark.sql.codegen.aggregate.fastHashMap.capacityBit", "20"
        )
        try:
            runs = []
            for _ in range(4):  # run 0 = cold scan
                t0 = time.perf_counter()
                _bucketed_part2().collect()
                runs.append(time.perf_counter() - t0)
        finally:
            spark.conf.set(
                "spark.sql.codegen.aggregate.fastHashMap.capacityBit",
                old_bit,
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bench_p2_fact")
    out["cold_sec"] = round(runs[0], 4)
    out["warm_sec"] = round(min(runs[1:]), 4)
    out["runs"] = [round(r, 4) for r in runs]
    out["host_end"] = host_snapshot()
    Path(_REPO, "GROUPS1E8_BUCKETED_ADJUDICATION.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(
        json.dumps(
            {k: out[k] for k in ("build_sec", "cold_sec", "warm_sec", "runs")}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
