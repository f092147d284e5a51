#!/usr/bin/env python
"""Bucketed aggregate under SKEW at groups=1e8 (round 10).

Round 9 proved the bucketed layout is the uniform no-reduction
endgame (BUCKETED_AGG_PROBE.json: B128_sorted 5.96 s warm vs 53.5 s
repartition-first control at 1e9 rows / 1e8 groups) and
``plans/sizing.decide()`` emits ``layout_hint="bucket_on_group_key"``
— but ONLY in the uniform branch; the skewed branch deliberately
carries no hint because a hot key concentrates one bucket file + one
scan task, unmeasured (VERDICT r09 #4). This probe measures exactly
that, on REGROUP_PROBE's two skew shapes:

- ``hh100`` — 100 heavy hitters @ p=0.5 (hot mass spread over ≥
  O(cores) keys). REGROUP baselines: repartition-first 26.2 s,
  plain+wide 50.1 s.
- ``hh1``   — ONE heavy hitter @ p=0.5 (half the fact on one key).
  REGROUP baselines: plain (partial agg crushes the hot key
  map-side) 57.6 s, repartition-first 112.0 s.

Per shape: small-scale numpy-oracle check of the bucketed spelling
(the skewed generator path), then at 1e9 rows a same-session control
(the regime's best known spelling) and the bucketed arm
(B128_sorted, the r09 winner variant): build cost, file sizes, cold
+ warm query walls, answers asserted identical to the control. The
mechanism to watch: the hot bucket holds p·rows ≈ 5e8 rows, so ONE
task scans/aggregates it sequentially — the bucketed plan trades the
exchange for a straggler. Outcome either extends the layout hint to
the skewed branch or records the negative with the straggler priced.

Usage: python scripts/bucketed_agg_skew_probe.py [--rows 1000000000]
       [--quick]
Writes BUCKETED_AGG_SKEW_PROBE.json at the repo root.
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

from scripts.bucketed_agg_probe import bucketed_part2  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--json", default="BUCKETED_AGG_SKEW_PROBE.json")
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
        part2_query,
        part2_query_repartition_first,
        q4112_frames,
    )
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators.bucketing import (
        write_bucketed_aligned,
    )
    from database_join_spark.plans import plan_string
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="bucketed-agg-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    parts = 4 * cores
    cap_conf = "spark.sql.codegen.aggregate.fastHashMap.capacityBit"

    out: dict = {
        "rows": rows,
        "groups": groups,
        "cores": cores,
        "buckets": 128,
        "host_start": host_snapshot(),
        "shapes": {},
    }

    # shape → (hh_groups, hh_prob, control spelling) — the control is
    # the regime's best KNOWN spelling per REGROUP_PROBE
    shapes = {
        "hh100": (100, 0.5, "repart"),
        "hh1": (1, 0.5, "plain"),
    }

    for shape, (hh_g, hh_p, control_kind) in shapes.items():
        res: dict = {"hh_groups": hh_g, "hh_prob": hh_p,
                     "control_kind": control_kind,
                     "host": host_snapshot()}

        # ---- small-scale oracle check of the bucketed spelling on
        # the SKEWED generator path
        small = Q4112Config(
            inner_tuples=100, outer_tuples=10_000_000,
            groups=1_000_000, outer_selectivity=1.0,
            price_max=50, qty_max=20, hh_groups=hh_g, hh_prob=hh_p,
        )
        items, orders = q4112_frames(spark, small, cores)
        spark.sql("DROP TABLE IF EXISTS probe_baggs_small")
        spark.sql("DROP TABLE IF EXISTS probe_baggs_small_items")
        try:
            write_bucketed_aligned(
                orders, "probe_baggs_small", 32, ["store_id"],
                sort_cols=None,
            )
            items.write.mode("overwrite").saveAsTable(
                "probe_baggs_small_items"
            )
            got = bucketed_part2(spark, "probe_baggs_small").collect()[0]
            want = part2_oracle(small)
            assert (got["avg_of_avgs"], got["n_groups"]) == want, (
                shape, got, want,
            )
            res["small_scale_oracle_match"] = True
        finally:
            spark.sql("DROP TABLE IF EXISTS probe_baggs_small")
            spark.sql("DROP TABLE IF EXISTS probe_baggs_small_items")
        print(f"# {shape}: small-scale oracle match", file=sys.stderr)

        cfg = Q4112Config(
            inner_tuples=100, outer_tuples=rows, groups=groups,
            outer_selectivity=1.0, price_max=50, qty_max=20,
            hh_groups=hh_g, hh_prob=hh_p,
        )

        # ---- control: the regime's best known spelling
        runs = []
        control_answer = None
        for _ in range(3):  # first = warm-up
            items, orders = q4112_frames(spark, cfg, parts)
            q = (
                part2_query_repartition_first(items, orders, parts)
                if control_kind == "repart"
                else part2_query(items, orders)
            )
            t0 = time.perf_counter()
            got = q.collect()
            runs.append(round(time.perf_counter() - t0, 4))
            control_answer = (got[0]["avg_of_avgs"], got[0]["n_groups"])
        res["control_runs"] = runs
        res["control_sec"] = min(runs[1:])
        res["control_answer"] = list(control_answer)
        print(f"# {shape} control({control_kind}): {runs}",
              file=sys.stderr)

        # ---- bucketed arm: B128_sorted (the r09 uniform winner)
        spark.sql("DROP TABLE IF EXISTS probe_baggs_fact")
        spark.sql("DROP TABLE IF EXISTS probe_baggs_fact_items")
        try:
            items, orders = q4112_frames(spark, cfg, parts)
            t0 = time.perf_counter()
            write_bucketed_aligned(
                orders, "probe_baggs_fact", 128, ["store_id"],
                sort_cols=None,
            )
            res["build_sec"] = round(time.perf_counter() - t0, 2)
            items.write.mode("overwrite").saveAsTable(
                "probe_baggs_fact_items"
            )
            loc = next(
                (
                    r["data_type"].removeprefix("file:")
                    for r in spark.sql(
                        "DESCRIBE TABLE EXTENDED probe_baggs_fact"
                    ).collect()
                    if r["col_name"] == "Location"
                ),
                None,
            )
            if loc:
                sizes = sorted(
                    f.stat().st_size for f in Path(loc).rglob("part-*")
                )
                res["size_gb"] = round(sum(sizes) / 1e9, 2)
                # the skew signature: the hot bucket's share of bytes
                res["largest_file_gb"] = round(sizes[-1] / 1e9, 3)
                res["median_file_mb"] = round(
                    sizes[len(sizes) // 2] / 1e6, 1
                )

            plan = plan_string(bucketed_part2(spark, "probe_baggs_fact"))
            assert "hashpartitioning(store_id" not in plan, plan[:2000]

            old_bit = spark.conf.get(cap_conf, "16")
            spark.conf.set(cap_conf, "20")
            try:
                qruns = []
                answer = None
                for _ in range(4):  # run 0 = cold scan
                    t0 = time.perf_counter()
                    got = bucketed_part2(
                        spark, "probe_baggs_fact"
                    ).collect()
                    qruns.append(round(time.perf_counter() - t0, 4))
                    answer = (got[0]["avg_of_avgs"], got[0]["n_groups"])
                res["bucketed_cold_sec"] = qruns[0]
                res["bucketed_warm_sec"] = min(qruns[1:])
                res["bucketed_runs"] = qruns
                assert list(answer) == res["control_answer"], (
                    shape, answer, control_answer,
                )
                res["answer_matches_control"] = True
            finally:
                spark.conf.set(cap_conf, old_bit)
        finally:
            spark.sql("DROP TABLE IF EXISTS probe_baggs_fact")
            spark.sql("DROP TABLE IF EXISTS probe_baggs_fact_items")

        res["host_after"] = host_snapshot()
        out["shapes"][shape] = res
        print(f"# {shape}: {json.dumps({k: v for k, v in res.items() if k not in ('host', 'host_after')})}",
              file=sys.stderr)

    out["host_end"] = host_snapshot()
    Path(_REPO, args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "shapes"}))
    spark.stop()


if __name__ == "__main__":
    main()
