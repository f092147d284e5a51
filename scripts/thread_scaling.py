#!/usr/bin/env python
"""Thread-scaling sweep of the reference workload (VERDICT r02 #3).

The reference's headline artifact is runtime vs 1/2/4/8/16 threads
(``q4112_hj.csv`` 5 thread-counts × 8 configs; scaling discussion in
``README-1.txt:20-51``: near-linear to 8 physical cores, sub-linear
to 16 hyper-threads). This script reproduces that curve for the
Spark engine: Part 1 / Part 2 at local[1/2/4/8/16/32] on the same
1e9-row generated workload bench.py uses.

Each thread count runs in a FRESH subprocess (own JVM): Spark's
local[N] fixes parallelism at context construction, and JIT state
must not leak between points. Inside each subprocess the protocol
matches bench.py's ``_throughput``: codegen warm-up, fresh frames
per repeat, min of ``reps`` timed runs.

Usage: python scripts/thread_scaling.py [--rows 1000000000]
       [--reps 5] [--threads 1,2,4,8,16,32] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

#: Run inside a subprocess: one (threads, rows, reps) point.
#: ``skew`` switches to the reference's heavy-hitter Part-2 config
#: (groups=1e8, hh_groups=100, p=0.5 — q4112.csv:101-125): Part 2
#: only, since the skew finding is a group-by phenomenon, with the
#: same 1-task-per-thread protocol skew_probe.py uses.
_POINT_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from database_join_spark.datagen import (
    Q4112Config, part1_query, part2_query, q4112_frames,
)
from database_join_spark.session import RUNTIME_CONFS, WIDE_EXCHANGE_CONFS

threads, rows, reps, skew = {threads}, {rows}, {reps}, {skew}
b = (SparkSession.builder.appName(f"thread-scaling-{{threads}}")
     .master(f"local[{{threads}}]")
     .config("spark.sql.shuffle.partitions", str(threads))
     # The skew config is the wide-exchange regime: big heap + the
     # SPILL_PROBE-winning shuffle confs (skew_probe.py protocol);
     # the groups=100 sweep needs only defaults.
     .config("spark.driver.memory", "48g" if skew else "8g")
     .config("spark.ui.enabled", "false"))
for k, v in RUNTIME_CONFS.items():
    b = b.config(k, v)
if skew:
    for k, v in WIDE_EXCHANGE_CONFS.items():
        b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

if skew:
    cfg = Q4112Config(inner_tuples=100, outer_tuples=rows,
                      groups=100_000_000, outer_selectivity=1.0,
                      price_max=50, qty_max=20,
                      hh_groups=100, hh_prob=0.5)
    plan = [("part2", part2_query, 4 * threads)]
else:
    cfg = Q4112Config(inner_tuples=100, outer_tuples=rows, groups=100,
                      outer_selectivity=1.0, price_max=50, qty_max=20)
    plan = [("part1", part1_query, 4 * threads),
            ("part2", part2_query, threads)]
spark.range(0, rows // 5).agg(F.sum("id")).collect()  # JIT warm-up

out = {{}}
for name, q, parts in plan:
    runs = []
    for _ in range(reps + 1):  # first run = codegen warm-up
        items, orders = q4112_frames(spark, cfg, parts)
        t0 = time.perf_counter()
        q(items, orders).collect()
        runs.append(time.perf_counter() - t0)
    out[name] = round(min(runs[1:]), 4)
    out[name + "_runs"] = [round(r, 4) for r in runs[1:]]
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_point(threads: int, rows: int, reps: int, skew: bool = False) -> dict:
    prog = _POINT_PROG.format(
        repo=_REPO, threads=threads, rows=rows, reps=reps, skew=skew
    )
    proc = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"local[{threads}] sweep point failed:\n{proc.stdout}\n{proc.stderr}"
    )


#: Reference minima for the skew config (q4112.csv:101-125, ns→s),
#: keyed by thread count — gen_baseline.py joins these into the
#: BASELINE.md skew-scaling table.
SKEW_REF_SEC = {1: 50.86, 2: 25.25, 4: 13.10, 8: 7.15, 16: 5.49}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--threads", default="1,2,4,8,16,32")
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--skew",
        action="store_true",
        help="heavy-hitter Part-2 config (groups=1e8, hh=100, p=0.5)",
    )
    args = ap.parse_args()

    threads = [int(t) for t in args.threads.split(",")]
    table: dict[str, dict] = {}
    for t in threads:
        point = run_point(t, args.rows, args.reps, skew=args.skew)
        table[str(t)] = point
        line = f"# local[{t:>2}]:"
        if "part1" in point:
            line += f" part1 {point['part1']:7.2f} s  "
        line += f" part2 {point['part2']:7.2f} s"
        print(line, file=sys.stderr)
    base = table[str(threads[0])]
    for t in threads:
        p = table[str(t)]
        if "part1" in p:
            p["part1_speedup"] = round(base["part1"] / p["part1"], 2)
        p["part2_speedup"] = round(base["part2"] / p["part2"], 2)
        if args.skew and t in SKEW_REF_SEC:
            p["ref_sec"] = SKEW_REF_SEC[t]
            p["ratio_vs_ref"] = round(p["part2"] / SKEW_REF_SEC[t], 2)
    result = {"rows": args.rows, "reps": args.reps, "points": table}
    if args.skew:
        result["config"] = "groups=1e8 hh_groups=100 hh_prob=0.5 (part2)"
        result["ref_csv"] = "q4112.csv:101-125"
    print(json.dumps(result))
    if args.json:
        Path(args.json).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
