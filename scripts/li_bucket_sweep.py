#!/usr/bin/env python
"""large_inner steady-state levers (VERDICT r07 #8, stretch): the
bucketed co-located row sat at ~2.0 s (cached ~1.4 s) for three
rounds. Three levers, all aimed at the per-probe cost:

  1. BUCKET-COUNT SWEEP: with B buckets the per-task hash build
     holds inner/B entries — 312k at B=32 (≈5 MB of entries,
     L3-resident at best) down to 39k at B=256 (L2-resident).
     Probe work is constant; if lookups are cache-miss-bound, more
     buckets shave the steady state. (The partitioned analogue of
     the reference's capacityBit ablation, README-2.txt:10-11.)
  2. WRITER/BUCKET ALIGNMENT: Spark writes one file per
     (writer-task × bucket) pair, so a W-task write into B buckets
     fragments the table into up to W·B files — at W=128, B=128
     that is ~16k fragments whose per-file parquet overhead
     (footer parse, dictionary init, first-page latency) dominates
     the cold scan and INVERTS the bucket-count win. Repartitioning
     by the bucket key to exactly B partitions before the bucketed
     write gives ONE sorted file per bucket; the repartition
     exchange replaces the write-side fan-out, so the build is no
     slower. This is the standard layout discipline for bucketed
     tables at warehouse scale.
  3. BROADCAST-HASH over the cached probe side: ONE shared
     1e7-entry build table probed by every task — structurally the
     reference's own design (q4112_hj.c:73-74, one shared table, 16
     threads). In local mode the broadcast is a single in-process
     relation, so this arm measures Spark's row-at-a-time probe
     against the same memory layout the reference uses. (At cluster
     scale a 1e7-row broadcast is ~100s of MB to every executor —
     viable for a dim this size, priced by the recorded time.)

Each bucket count runs FOUR arms: fragmented write (generator
partitioning, 4·cores writer tasks) cold + cached, and aligned
write (repartition(B, key) first) cold + cached. Warm-up + 3 timed
runs, min reported; plans are checked (Exchange count / broadcast
presence) so a silently-degraded plan is caught.
Usage: python scripts/li_bucket_sweep.py [--reps 3]
Writes LI_BUCKET_SWEEP.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark.datagen import (  # noqa: E402
    Q4112Config,
    q4112_frames,
)
from database_join_spark.session import get_spark  # noqa: E402

INNER = 10_000_000
OUTER = 100_000_000
BUCKET_COUNTS = (32, 64, 128, 256)


def _agg(joined):
    return joined.agg(
        F.expr("sum(price * quantity) DIV count(*)").alias("avg_val")
    )


def _timed(fn, reps):
    runs = []
    for _ in range(reps + 1):  # first = warm-up
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    timed = runs[1:]
    return {"sec": round(min(timed), 4), "runs": [round(r, 4) for r in timed]}


def _data_files(table: str) -> int:
    return len(glob.glob(f"{_REPO}/spark-warehouse/{table.lower()}/part-*"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="li-bucket-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    cfg = Q4112Config(
        inner_tuples=INNER,
        outer_tuples=OUTER,
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )
    out: dict = {
        "cfg": {"inner": INNER, "outer": OUTER},
        "cores": cores,
        "buckets": {},
    }

    for b in BUCKET_COUNTS:
        row: dict = {"entries_per_task": INNER // b}
        for aligned in (False, True):
            tag = "aligned" if aligned else "fragmented"
            it, ot = f"sweep_items_{b}", f"sweep_orders_{b}"
            spark.sql(f"DROP TABLE IF EXISTS {it}")
            spark.sql(f"DROP TABLE IF EXISTS {ot}")
            try:
                items, orders = q4112_frames(spark, cfg, 4 * cores)
                if aligned:
                    items = items.repartition(b, "id")
                    orders = orders.repartition(b, "item_id")
                t0 = time.perf_counter()
                items.write.bucketBy(b, "id").sortBy("id").mode(
                    "overwrite"
                ).saveAsTable(it)
                orders.write.bucketBy(b, "item_id").sortBy("item_id").mode(
                    "overwrite"
                ).saveAsTable(ot)
                build = time.perf_counter() - t0

                def join():
                    bi = spark.table(it)
                    bo = spark.table(ot)
                    return _agg(
                        bo.join(bi.hint("shuffle_hash"), bi.id == bo.item_id)
                    )

                plan = (
                    join()._jdf.queryExecution().executedPlan().toString()
                )
                cold = _timed(lambda: join().collect(), args.reps)
                spark.catalog.cacheTable(it)
                spark.catalog.cacheTable(ot)
                spark.table(it).count()
                spark.table(ot).count()
                hot = _timed(lambda: join().collect(), args.reps)
                spark.catalog.uncacheTable(it)
                spark.catalog.uncacheTable(ot)
                row[tag] = {
                    "cold_sec": cold["sec"],
                    "cold_runs": cold["runs"],
                    "cached_sec": hot["sec"],
                    "cached_runs": hot["runs"],
                    "bucketed_build_sec": round(build, 1),
                    "data_files": _data_files(it) + _data_files(ot),
                    "exchanges_in_plan": plan.count("Exchange"),
                }
                print(
                    f"# buckets={b} {tag}: cold {cold['sec']} s "
                    f"cached {hot['sec']} s "
                    f"({row[tag]['data_files']} files)",
                    file=sys.stderr,
                )
            finally:
                spark.sql(f"DROP TABLE IF EXISTS {it}")
                spark.sql(f"DROP TABLE IF EXISTS {ot}")
        out["buckets"][b] = row

    # broadcast-hash arm: one shared build table (the reference's
    # architecture), probe side cached columnar, no bucketing
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        items, orders = q4112_frames(spark, cfg, cores)
        orders.cache()
        orders.count()
        t0 = time.perf_counter()
        bc = F.broadcast(items)
        _agg(orders.join(bc, items.id == orders.item_id)).collect()
        first = time.perf_counter() - t0  # includes the broadcast build

        def bhj():
            return _agg(
                orders.join(F.broadcast(items), items.id == orders.item_id)
            )

        plan = bhj()._jdf.queryExecution().executedPlan().toString()
        r = _timed(lambda: bhj().collect(), args.reps)
        r["first_run_with_broadcast_build_sec"] = round(first, 2)
        r["broadcast_in_plan"] = "BroadcastHashJoin" in plan
        out["broadcast_cached_probe"] = r
        print(f"# broadcast: {r['sec']} s {r['runs']}", file=sys.stderr)
        orders.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    Path(_REPO, "LI_BUCKET_SWEEP.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
