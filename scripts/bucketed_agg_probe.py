#!/usr/bin/env python
"""Bucketed-aggregate probe at groups=1e8 uniform (round 9).

The one remaining weak regime (VERDICT r08, 4.96×): Part 2 at
groups=1e8 must move ~1e9 (group, value) rows through a shuffle
while the reference CAS-updates one pre-sized shared-memory table
(q4112.c:169-300). Every in-exchange lever is exhausted
(REGROUP_PROBE: repartition-first rewrite; PACKED_REGROUP_PROBE:
2.8%, not adopted; the estimate tax is amortized by the statistics
catalog). This probe transfers the large_inner lesson
(LI_BUCKET_SWEEP: aligned bucketed layout made the co-located join
exchange-free, 2.04 → 0.47 s) from joins to AGGREGATION: write the
fact ONCE as a bucketed table on the group key, so every subsequent
groupBy(store_id) inherits the bucketed hash partitioning and runs
with NO exchange at all — the per-task aggregate covers its
groups/B keys with a fast map (781k at B=128, inside a 2^20 map),
the regime the reference's capacityBit ablation calls covered.

Arms (one JVM, default profile — the rewrite regime needs no tuned
confs; all arms same session so host state is comparable, and host
snapshots are embedded per VERDICT r08 #5):

- control_repart   — the tracked best: repartition-first, 4× tasks
- bucketed build   — write_bucketed_aligned(orders, store_id, B)
                     for B ∈ {64, 128, 256} × {sorted, unsorted}
                     (sort is build tax the agg can't exploit, but
                     sorted files delta-compress better → smaller
                     scan; measured both ways at B=128 first, the
                     winner swept across B)
- bucketed query   — scan → broadcast join items → groupBy → agg,
                     cold run + repeats, fast map bit 20

Correctness: the bucketed spelling is asserted against the
independent numpy oracle at 1e7 rows / 1e6 groups, and its 1e9-row
answer must equal the control arm's (both equal the oracle at every
small config by construction).

Usage: python scripts/bucketed_agg_probe.py [--rows 1000000000]
       [--json BUCKETED_AGG_PROBE.json] [--quick]
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


def bucketed_part2(spark, table_name: str):
    """Part 2 over the bucketed fact: broadcast join preserves the
    scan's bucketed partitioning, so the per-store aggregate needs
    no exchange; only the B scalar partials cross the wire for the
    final avg-of-avgs."""
    from pyspark.sql import functions as F

    from database_join_spark.datagen import Q4112Config, q4112_frames

    # items is tiny (inner=100) and regenerated per query — the
    # broadcast side; the bucketed table replaces only the fact.
    bo = spark.table(table_name)
    per_store = (
        bo.join(
            F.broadcast(spark.table(table_name + "_items")),
            F.col("id") == F.col("item_id"),
        )
        .groupBy("store_id")
        .agg(F.expr("sum(price * quantity) DIV count(*)").alias("g"))
    )
    return per_store.agg(
        F.expr("sum(g) DIV count(g)").alias("avg_of_avgs"),
        F.count("g").alias("n_groups"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--json", default="BUCKETED_AGG_PROBE.json")
    ap.add_argument(
        "--quick", action="store_true",
        help="1e7-row smoke of the full harness",
    )
    args = ap.parse_args()
    rows = 10_000_000 if args.quick else args.rows
    groups = min(100_000_000, rows // 10)

    from pyspark.sql import functions as F

    from database_join_spark.datagen import (
        Q4112Config,
        part2_oracle,
        part2_query_repartition_first,
        q4112_frames,
    )
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators.bucketing import (
        data_file_count,
        write_bucketed_aligned,
    )
    from database_join_spark.plans import plan_string
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="bucketed-agg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    cap_conf = "spark.sql.codegen.aggregate.fastHashMap.capacityBit"

    out: dict = {
        "rows": rows,
        "groups": groups,
        "cores": cores,
        "host_start": host_snapshot(),
    }

    # ---- section 0: correctness of the bucketed spelling vs the
    # independent numpy oracle (small scale, full harness path)
    small = Q4112Config(
        inner_tuples=100,
        outer_tuples=10_000_000,
        groups=1_000_000,
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )
    items, orders = q4112_frames(spark, small, cores)
    spark.sql("DROP TABLE IF EXISTS probe_bagg_small")
    spark.sql("DROP TABLE IF EXISTS probe_bagg_small_items")
    try:
        write_bucketed_aligned(
            orders, "probe_bagg_small", 32, ["store_id"], sort_cols=[]
        )
        items.write.mode("overwrite").saveAsTable(
            "probe_bagg_small_items"
        )
        got = bucketed_part2(spark, "probe_bagg_small").collect()[0]
        want_avg, want_groups = part2_oracle(small)
        assert (got["avg_of_avgs"], got["n_groups"]) == (
            want_avg,
            want_groups,
        ), f"bucketed spelling wrong: {got} vs {(want_avg, want_groups)}"
        out["small_scale_oracle_match"] = True
        plan = plan_string(bucketed_part2(spark, "probe_bagg_small"))
        # the ONLY exchange is the B→1 partials for the final scalar
        # aggregate; the per-store agg must inherit the bucketing
        n_exchanges = plan.count("Exchange")
        assert "hashpartitioning(store_id" not in plan, plan
        out["small_scale_exchanges"] = n_exchanges
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_bagg_small")
        spark.sql("DROP TABLE IF EXISTS probe_bagg_small_items")
    print(
        f"# small-scale oracle match, exchanges="
        f"{out['small_scale_exchanges']}",
        file=sys.stderr,
    )

    cfg = Q4112Config(
        inner_tuples=100,
        outer_tuples=rows,
        groups=groups,
        outer_selectivity=1.0,
        price_max=50,
        qty_max=20,
    )

    # ---- section 1: control — the tracked repartition-first best
    out["host_control"] = host_snapshot()
    parts = 4 * cores
    runs = []
    control_answer = None
    for i in range(3):  # first = warm-up
        items, orders = q4112_frames(spark, cfg, parts)
        t0 = time.perf_counter()
        got = part2_query_repartition_first(items, orders, parts).collect()
        runs.append(round(time.perf_counter() - t0, 4))
        control_answer = (got[0]["avg_of_avgs"], got[0]["n_groups"])
    out["control_repart_runs"] = runs
    out["control_repart_sec"] = min(runs[1:])
    out["control_answer"] = list(control_answer)
    print(f"# control_repart: {runs}", file=sys.stderr)

    # ---- section 2: bucketed arms
    arms = [(128, True), (128, False)]
    arm_results: dict[str, dict] = {}

    def run_arm(buckets: int, sorted_files: bool) -> dict:
        name = f"B{buckets}_{'sorted' if sorted_files else 'unsorted'}"
        res: dict = {"host": host_snapshot()}
        spark.sql("DROP TABLE IF EXISTS probe_bagg_fact")
        spark.sql("DROP TABLE IF EXISTS probe_bagg_fact_items")
        try:
            items, orders = q4112_frames(spark, cfg, parts)
            t0 = time.perf_counter()
            write_bucketed_aligned(
                orders,
                "probe_bagg_fact",
                buckets,
                ["store_id"],
                sort_cols=None if sorted_files else [],
            )
            res["build_sec"] = round(time.perf_counter() - t0, 2)
            items.write.mode("overwrite").saveAsTable(
                "probe_bagg_fact_items"
            )
            res["files"] = data_file_count(spark, "probe_bagg_fact")
            loc = next(
                (
                    r["data_type"].removeprefix("file:")
                    for r in spark.sql(
                        "DESCRIBE TABLE EXTENDED probe_bagg_fact"
                    ).collect()
                    if r["col_name"] == "Location"
                ),
                None,
            )
            res["size_gb"] = (
                round(
                    sum(
                        f.stat().st_size
                        for f in Path(loc).rglob("part-*")
                    )
                    / 1e9,
                    2,
                )
                if loc
                else None
            )

            plan = plan_string(bucketed_part2(spark, "probe_bagg_fact"))
            assert "hashpartitioning(store_id" not in plan, plan[:2000]

            old_bit = spark.conf.get(cap_conf, "16")
            spark.conf.set(cap_conf, "20")
            try:
                qruns = []
                answer = None
                for i in range(4):  # run 0 = cold scan (reported)
                    t0 = time.perf_counter()
                    got = bucketed_part2(
                        spark, "probe_bagg_fact"
                    ).collect()
                    qruns.append(round(time.perf_counter() - t0, 4))
                    answer = (got[0]["avg_of_avgs"], got[0]["n_groups"])
                res["query_cold_sec"] = qruns[0]
                res["query_warm_sec"] = min(qruns[1:])
                res["query_runs"] = qruns
                res["answer_matches_control"] = (
                    list(answer) == out["control_answer"]
                )
                assert res["answer_matches_control"], (
                    f"{name}: {answer} vs control {control_answer}"
                )
            finally:
                spark.conf.set(cap_conf, old_bit)
        finally:
            spark.sql("DROP TABLE IF EXISTS probe_bagg_fact")
            spark.sql("DROP TABLE IF EXISTS probe_bagg_fact_items")
        print(f"# {name}: {res}", file=sys.stderr)
        return res

    for buckets, sorted_files in arms:
        name = f"B{buckets}_{'sorted' if sorted_files else 'unsorted'}"
        arm_results[name] = run_arm(buckets, sorted_files)

    # winner variant (by warm query) swept across B
    b128 = {
        k: v for k, v in arm_results.items() if k.startswith("B128")
    }
    best_sorted = min(
        b128, key=lambda k: b128[k]["query_warm_sec"]
    ).endswith("sorted") and not min(
        b128, key=lambda k: b128[k]["query_warm_sec"]
    ).endswith("unsorted")
    for buckets in (64, 256):
        name = f"B{buckets}_{'sorted' if best_sorted else 'unsorted'}"
        arm_results[name] = run_arm(buckets, best_sorted)

    out["arms"] = arm_results
    out["host_end"] = host_snapshot()
    Path(_REPO, args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))
    spark.stop()


if __name__ == "__main__":
    main()
