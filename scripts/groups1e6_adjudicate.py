#!/usr/bin/env python
"""part2_groups1e6 regression adjudication (VERDICT r07 #3 / Wrong
#2): r06→r07 the row moved 7.96 → 9.87 s with an IDENTICAL
auto-chosen plan and three consistent runs — not single-run noise.
The r07 bench also added the cached-columnar large_inner arm, which
caches/uncaches ~4 GB of columnar data EARLIER IN THE SAME JVM AND
BENCH SEQUENCE than the groups=1e6 section. This script isolates
that variable with the established checkpoint-control protocol:

  arm A — fresh JVM, part2_groups1e6 alone (warm-up + 3 timed);
  arm B — fresh JVM, the large_inner bucketed+cached prelude first
          (same tables, same cache/uncache lifecycle as bench.py),
          then the identical part2_groups1e6 runs.

If B ≈ A, the cache arm is exonerated and the r07 move was host
drift (the adjacent rows improving the same day already weakened
the co-tenancy story, but drift has reversed before — BASELINE.md
§Part-2 r03 regression). If B ≫ A, the bench sequence perturbs the
row and the sections must be isolated (fresh JVM or cache-drop
between them).

Usage: python scripts/groups1e6_adjudicate.py          (orchestrate)
       python scripts/groups1e6_adjudicate.py --arm a|b (one arm)
Writes GROUPS1E6_ADJUDICATION.json at the repo root.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

ROWS = 1_000_000_000
TIMED_RUNS = 3


def _cfgs():
    from database_join_spark.datagen import Q4112Config

    hc = Q4112Config(
        inner_tuples=100,
        outer_tuples=ROWS,
        groups=1_000_000,
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )
    li = Q4112Config(
        inner_tuples=10_000_000,
        outer_tuples=100_000_000,
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )
    return hc, li


def run_arm(with_cache_prelude: bool) -> dict:
    from pyspark.sql import functions as F

    from database_join_spark.datagen import part2_query, q4112_frames
    from database_join_spark.plans.sizing import applied
    from database_join_spark.plans.stats import plan_for_cached
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="groups1e6-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    hc_cfg, li_cfg = _cfgs()
    out: dict = {"cache_prelude": with_cache_prelude}

    if with_cache_prelude:
        # replicate bench.py's large_inner bucketed + cached section:
        # bucketed saveAsTable build, cacheTable + materialize, one
        # co-located join, uncache, drop — the exact lifecycle that
        # precedes part2_groups1e6 in the bench sequence.
        spark.sql("DROP TABLE IF EXISTS adj_li_items")
        spark.sql("DROP TABLE IF EXISTS adj_li_orders")
        t0 = time.perf_counter()
        try:
            items, orders = q4112_frames(spark, li_cfg, 4 * cores)
            items.write.bucketBy(cores, "id").sortBy("id").mode(
                "overwrite"
            ).saveAsTable("adj_li_items")
            orders.write.bucketBy(cores, "item_id").sortBy(
                "item_id"
            ).mode("overwrite").saveAsTable("adj_li_orders")
            spark.catalog.cacheTable("adj_li_items")
            spark.catalog.cacheTable("adj_li_orders")
            spark.table("adj_li_items").count()
            spark.table("adj_li_orders").count()
            bi = spark.table("adj_li_items")
            bo = spark.table("adj_li_orders")
            bo.join(bi.hint("shuffle_hash"), bi.id == bo.item_id).agg(
                F.expr("sum(price * quantity) DIV count(*)")
            ).collect()
            spark.catalog.uncacheTable("adj_li_items")
            spark.catalog.uncacheTable("adj_li_orders")
        finally:
            spark.sql("DROP TABLE IF EXISTS adj_li_items")
            spark.sql("DROP TABLE IF EXISTS adj_li_orders")
        out["prelude_sec"] = round(time.perf_counter() - t0, 1)

    items, orders = q4112_frames(spark, hc_cfg, cores)
    sizing, cached = plan_for_cached(
        orders, ["store_id"], table_key=f"q4112:{hc_cfg}"
    )
    out["sizing"] = {
        "est_groups": sizing.est_groups,
        "capacity_bit": sizing.capacity_bit,
        "tasks_per_core": sizing.tasks_per_core,
        "estimate_cached": cached,
    }
    runs = []
    with applied(spark, sizing):
        for _ in range(TIMED_RUNS + 1):  # first = warm-up
            items, orders = q4112_frames(
                spark, hc_cfg, sizing.tasks(cores)
            )
            t0 = time.perf_counter()
            part2_query(items, orders).collect()
            runs.append(time.perf_counter() - t0)
    out["runs"] = [round(r, 4) for r in runs[1:]]
    out["min"] = round(min(runs[1:]), 4)
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--arm":
        print(json.dumps(run_arm(sys.argv[2] == "b")))
        return
    results = {}
    for arm, prelude in (("a_isolated", "a"), ("b_after_cache_arm", "b")):
        p = subprocess.run(
            [sys.executable, __file__, "--arm", prelude],
            capture_output=True,
            text=True,
        )
        if p.returncode != 0:
            raise SystemExit(f"arm {arm} failed:\n{p.stderr[-2000:]}")
        results[arm] = json.loads(p.stdout.strip().splitlines()[-1])
        print(f"# {arm}: {results[arm]['min']} s", file=sys.stderr)
    results["delta_pct"] = round(
        100.0
        * (results["b_after_cache_arm"]["min"] - results["a_isolated"]["min"])
        / results["a_isolated"]["min"],
        1,
    )
    Path(_REPO, "GROUPS1E6_ADJUDICATION.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
