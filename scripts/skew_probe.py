#!/usr/bin/env python
"""Group-by skew probe at the reference's high-cardinality configs.

The reference's most instructive Part-2 result is that SKEW MAKES IT
FASTER: groups=1e8 runs 7.64 s @16T unskewed but 5.51 s with 100
heavy hitters at p=0.5 (``q4112.csv:76-100`` vs ``:101-125``;
``README-2.txt:41-43`` credits the thread-local caches — hot groups
stay in L2 and never touch the contended global table). Spark's
partial (map-side) aggregation is the same mechanism: heavy-hitter
rows collapse to one partial row per task before the exchange, so
the shuffle carries LESS under skew while the long uniform tail
still dominates the agg-table mass.

This probe measures our Part 2 at those two configs (min of reps,
fresh frames per run) and writes SKEW_PROBE.json, which BASELINE.md
cites. p=1.0 is excluded: the reference generator gives every group
one appearance before the heavy-hitter draw, so its p=1.0 config
still aggregates 1e8 distinct groups, while this generator's
store_id is a pure per-row function (no sequential "appear once"
pass at 1e9-row scale) and would collapse to 100 groups — not the
same workload; p=0.5 matches the reference's shape row for row.

Usage: python scripts/skew_probe.py [--rows 1000000000] [--reps 3]
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

#: (label, groups, hh_groups, hh_prob, reference @16T seconds)
CONFIGS = [
    ("groups1e8_uniform", 100_000_000, 0, 0.0, 7.64),   # q4112.csv:76-100
    ("groups1e8_skew_p05", 100_000_000, 100, 0.5, 5.51),  # q4112.csv:101-125
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--untuned",
        action="store_true",
        help="default session (8g heap, lz4, 1 task/thread) — the r03 "
        "protocol; default is the wide-exchange profile + 4x map "
        "tasks, the SPILL_PROBE-winning config for this regime",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_join_spark.datagen import (
        Q4112Config,
        part2_query,
        q4112_frames,
    )
    from database_join_spark.session import get_spark

    profile = None if args.untuned else "wide-exchange"
    spark = get_spark(app_name="skew-probe", profile=profile)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    parts = cores if args.untuned else 4 * cores
    spark.range(0, args.rows // 5).agg(F.sum("id")).collect()  # JIT warm

    out = {
        "rows": args.rows,
        "reps": args.reps,
        "profile": profile or "default",
        "map_tasks": "4x" if profile else "1x",
        "points": {},
    }
    for label, groups, hh, p, ref in CONFIGS:
        cfg = Q4112Config(
            inner_tuples=100,
            outer_tuples=args.rows,
            groups=groups,
            outer_selectivity=1.0,
            price_max=50,
            qty_max=20,
            hh_groups=hh,
            hh_prob=p,
        )
        runs = []
        for _ in range(args.reps + 1):  # first = codegen warm-up
            items, orders = q4112_frames(spark, cfg, parts)
            t0 = time.perf_counter()
            part2_query(items, orders).collect()
            runs.append(time.perf_counter() - t0)
        timed = runs[1:]
        sec = min(timed)
        out["points"][label] = {
            "sec": round(sec, 4),
            "runs": [round(r, 4) for r in timed],
            "ref16t_sec": ref,
            "ratio": round(sec / ref, 2),
        }
        print(
            f"# {label}: {sec:.2f} s (ref @16T {ref:.2f} s) {timed}",
            file=sys.stderr,
        )
    Path(_REPO, "SKEW_PROBE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
