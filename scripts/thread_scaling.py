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
_POINT_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from database_join_spark.datagen import (
    Q4112Config, part1_query, part2_query, q4112_frames,
)
from database_join_spark.session import RUNTIME_CONFS

threads, rows, reps = {threads}, {rows}, {reps}
b = (SparkSession.builder.appName(f"thread-scaling-{{threads}}")
     .master(f"local[{{threads}}]")
     .config("spark.sql.shuffle.partitions", str(threads))
     .config("spark.driver.memory", "8g")
     .config("spark.ui.enabled", "false"))
for k, v in RUNTIME_CONFS.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

cfg = Q4112Config(inner_tuples=100, outer_tuples=rows, groups=100,
                  outer_selectivity=1.0, price_max=50, qty_max=20)
spark.range(0, rows // 5).agg(F.sum("id")).collect()  # JIT warm-up

out = {{}}
for name, q, parts in [("part1", part1_query, 4 * threads),
                       ("part2", part2_query, threads)]:
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


def run_point(threads: int, rows: int, reps: int) -> dict:
    prog = _POINT_PROG.format(repo=_REPO, threads=threads, rows=rows, reps=reps)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--threads", default="1,2,4,8,16,32")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    threads = [int(t) for t in args.threads.split(",")]
    table: dict[str, dict] = {}
    for t in threads:
        point = run_point(t, args.rows, args.reps)
        table[str(t)] = point
        print(
            f"# local[{t:>2}]: part1 {point['part1']:7.2f} s   "
            f"part2 {point['part2']:7.2f} s",
            file=sys.stderr,
        )
    base1, base2 = table[str(threads[0])]["part1"], table[str(threads[0])]["part2"]
    for t in threads:
        p = table[str(t)]
        p["part1_speedup"] = round(base1 / p["part1"], 2)
        p["part2_speedup"] = round(base2 / p["part2"], 2)
    result = {"rows": args.rows, "reps": args.reps, "points": table}
    print(json.dumps(result))
    if args.json:
        Path(args.json).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
