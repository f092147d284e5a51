#!/usr/bin/env python
"""Large-inner-join gap experiments (VERDICT r05 #9, stretch): the
one remaining >2× regime is the 1e7-build-side / 1e8-probe join,
where the reference's CAS-shared in-RAM build (``q4112_hj.c:73-74``)
pays no exchange and no scan. Round 5 established the two scale-safe
spellings (worst-case shuffle-hash; Exchange-free bucketed
co-located hash join). This probe measures the two candidate arms
the verdict named, plus the honest in-memory analogue:

  1. ``shuffle_hash``      — worst case, both sides exchanged (the
                             tracked ``large_inner`` bench row).
  2. ``bucketed_cold``     — co-located hash join over bucketed
                             tables read from parquet each run (the
                             tracked ``large_inner_bucketed`` row).
  3. ``bucketed_cached``   — same join over ``cacheTable``'d inputs:
                             columnar in-memory scan, no parquet
                             decode, still Exchange-free. This is
                             the closest Spark analogue of the
                             reference's RAM arrays (its steady
                             state) while remaining spill-safe.
  4. ``dim_filter_bloom``  — the *selective-dim* shape (10% of items
                             pass a dimension predicate) with
                             Spark's runtime bloom filter
                             (``spark.sql.optimizer.runtime.
                             bloomFilter.enabled``) OFF vs ON: the
                             bloom built from the filtered build
                             side prunes probe rows BEFORE the
                             exchange. This is the row-group-
                             pruning arm generalized: at osel=1.0
                             (the tracked shape) there is nothing to
                             prune — recorded as the structural
                             negative — so the measurement runs
                             where pruning is possible at all.

Each arm reports min + all runs; plans are checked for the
structural claim (Exchange count, InMemoryTableScan, bloom_filter
presence) so a conf that silently no-ops is caught.

Usage: python scripts/large_inner_probe.py [--reps 3]
Writes LARGE_INNER_PROBE.json at the repo root.
"""

from __future__ import annotations

import argparse
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
    part1_query_shuffle,
    q4112_frames,
)
from database_join_spark.session import get_spark  # noqa: E402

CFG = Q4112Config(
    inner_tuples=10_000_000,
    outer_tuples=100_000_000,
    groups=100,
    outer_selectivity=1.0,
    price_max=50,
    qty_max=20,
)
AGG = "sum(price * quantity) DIV count(*)"


def timed(reps: int, mk_df):
    runs = []
    for _ in range(reps + 1):  # first = warm-up
        df = mk_df()
        t0 = time.perf_counter()
        df.collect()
        runs.append(round(time.perf_counter() - t0, 4))
    timed_runs = runs[1:]
    return {
        "sec": min(timed_runs),
        "runs": timed_runs,
        "gtuples_per_sec": round(CFG.outer_tuples / min(timed_runs) / 1e9, 4),
    }


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="large-inner-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    out: dict = {"cfg": {"inner": CFG.inner_tuples, "outer": CFG.outer_tuples}}

    # -- arm 1: shuffle-hash worst case
    out["shuffle_hash"] = timed(
        args.reps,
        lambda: part1_query_shuffle(*q4112_frames(spark, CFG, 4 * cores)),
    )
    print(f"# shuffle_hash: {out['shuffle_hash']}", file=sys.stderr)

    # -- bucketed build (shared by arms 2 and 3)
    spark.sql("DROP TABLE IF EXISTS probe_li_items")
    spark.sql("DROP TABLE IF EXISTS probe_li_orders")
    try:
        items, orders = q4112_frames(spark, CFG, 4 * cores)
        t0 = time.perf_counter()
        items.write.bucketBy(cores, "id").sortBy("id").mode(
            "overwrite"
        ).saveAsTable("probe_li_items")
        orders.write.bucketBy(cores, "item_id").sortBy("item_id").mode(
            "overwrite"
        ).saveAsTable("probe_li_orders")
        out["bucketed_build_sec"] = round(time.perf_counter() - t0, 2)

        def bucketed_join():
            bi = spark.table("probe_li_items")
            bo = spark.table("probe_li_orders")
            return bo.join(
                bi.hint("shuffle_hash"), bi.id == bo.item_id
            ).agg(F.expr(AGG).alias("avg_val"))

        # -- arm 2: cold (parquet decode every run)
        out["bucketed_cold"] = timed(args.reps, bucketed_join)
        plan = plan_of(bucketed_join())
        out["bucketed_cold"]["exchanges_in_plan"] = plan.count("Exchange")
        print(f"# bucketed_cold: {out['bucketed_cold']}", file=sys.stderr)

        # -- arm 3: cached columnar (reference's RAM-array analogue)
        spark.catalog.cacheTable("probe_li_items")
        spark.catalog.cacheTable("probe_li_orders")
        t0 = time.perf_counter()
        spark.table("probe_li_items").count()  # materialize
        spark.table("probe_li_orders").count()
        out["cache_materialize_sec"] = round(time.perf_counter() - t0, 2)
        out["bucketed_cached"] = timed(args.reps, bucketed_join)
        qe = bucketed_join()._jdf.queryExecution()
        full_plan = qe.executedPlan().toString() + qe.optimizedPlan().toString()
        out["bucketed_cached"]["exchanges_in_plan"] = (
            qe.executedPlan().toString().count("Exchange")
        )
        out["bucketed_cached"]["in_memory_scan"] = (
            "InMemory" in full_plan or "TableCacheQueryStage" in full_plan
        )
        print(f"# bucketed_cached: {out['bucketed_cached']}", file=sys.stderr)
        spark.catalog.uncacheTable("probe_li_items")
        spark.catalog.uncacheTable("probe_li_orders")

        # -- arm 5: PARQUET-backed selective-dim join, runtime bloom
        # off vs on. The generated-frame arm below can never inject a
        # bloom (no probe-side file scan); this arm is the honest
        # shape — dim filter over a parquet dim, 1e8-row parquet
        # probe side — with the two threshold confs opened so the
        # ~50 MB filtered creation side and ~GB probe scan qualify
        # (defaults: creation < 10 MB, probe scan > 10 GB).
        def pq_dim_join():
            bi = spark.table("probe_li_items").filter(
                F.col("price") < CFG.price_max // 10 + 1
            )
            bo = spark.table("probe_li_orders")
            return bo.join(bi.hint("shuffle_hash"), bi.id == bo.item_id).agg(
                F.expr(AGG).alias("avg_val")
            )

        thresholds = {
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
                str(512 * 1024 * 1024),
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": str(64 * 1024 * 1024),
        }
        saved = {k: spark.conf.get(k) for k in thresholds}
        bloom_conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
        old_bloom = spark.conf.get(bloom_conf)
        try:
            for k, v in thresholds.items():
                spark.conf.set(k, v)
            for label, setting in [("off", "false"), ("on", "true")]:
                spark.conf.set(bloom_conf, setting)
                key = f"pq_dim_filter_bloom_{label}"
                out[key] = timed(args.reps, pq_dim_join)
                qe = pq_dim_join()._jdf.queryExecution()
                pl = (qe.executedPlan().toString()
                      + qe.optimizedPlan().toString())
                out[key]["bloom_in_plan"] = "bloom" in pl.lower()
                print(f"# {key}: {out[key]}", file=sys.stderr)
        finally:
            spark.conf.set(bloom_conf, old_bloom)
            for k, v in saved.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_li_items")
        spark.sql("DROP TABLE IF EXISTS probe_li_orders")

    # -- arm 4: selective-dim shape, runtime bloom OFF vs ON.
    # 10% of items pass the dim predicate; the join output shrinks
    # 10x, and a bloom on item ids can prune probe rows pre-exchange.
    def dim_join():
        items, orders = q4112_frames(spark, CFG, 4 * cores)
        dim = items.filter(F.col("price") < CFG.price_max // 10 + 1)
        return orders.join(
            dim.hint("shuffle_hash"), dim.id == orders.item_id
        ).agg(F.expr(AGG).alias("avg_val"))

    bloom_conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    old = spark.conf.get(bloom_conf)
    for label, setting in [("bloom_off", "false"), ("bloom_on", "true")]:
        spark.conf.set(bloom_conf, setting)
        out[f"dim_filter_{label}"] = timed(args.reps, dim_join)
        plan = plan_of(dim_join())
        out[f"dim_filter_{label}"]["bloom_in_plan"] = (
            "bloom" in plan.lower()
        )
        print(f"# dim_filter_{label}: {out[f'dim_filter_{label}']}",
              file=sys.stderr)
    spark.conf.set(bloom_conf, old)

    Path(_REPO, "LARGE_INNER_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
