#!/usr/bin/env python
"""First-run spill-cliff probe at groups=1e8 uniform (VERDICT r03 #3).

SKEW_PROBE r03 recorded 186.7/217.9/84.4 s for Part 2 at groups=1e8
uniform — a 2.2–2.6× first-run penalty before the steady state. The
regime is no-reduction partial agg: ~1e9 (group, sum, count) rows
(~20 GB compressed) cross the single box's shuffle, so the suspects
are all in the shuffle write/read path:

- ``buffer``: spark.shuffle.file.buffer 32k→1m + spill buffers —
  fewer, larger flushes to the local dirs;
- ``zstd``: shuffle compression codec lz4→zstd — ~2× smaller shuffle
  bytes for this integer-dense payload, at some CPU cost;
- ``shm``: spark.local.dir=/dev/shm — tmpfs removes the disk (and
  the page-cache warm-up that explains run-1 vs run-3) entirely;
  legitimate single-box tuning, and the honest control for "is it
  the disk or the code";
- ``maps4x``: 4× map tasks — each map-side ExternalSorter handles a
  quarter of the rows, spilling less per task;
- ``combo``: buffer + zstd + maps4x (the deployable subset — shm is
  a RAM spend call that 128 GiB boxes can afford but isn't default).

Protocol: each config runs in a FRESH JVM (subprocess), preceded by
a best-effort page-cache drop (sync + vm.drop_caches when
privileged) so run 1 is a true cold start; 1 codegen warm-up at 1/20
scale (JIT only — does not touch the big shuffle), then ``reps``
timed full runs. Reported: every run, first, and min. Success
criterion (VERDICT): first-run within ~1.3× of best, or a measured
explanation of which component pays the cliff.

Usage: python scripts/spill_probe.py [--rows 1000000000] [--reps 3]
       [--configs baseline,buffer,zstd,shm,maps4x,combo]
       [--json SPILL_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "buffer": {
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.spill.diskWriteBufferSize": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
    },
    "zstd": {"spark.io.compression.codec": "zstd"},
    "shm": {"spark.local.dir": "/dev/shm/spark-spill-probe"},
    "maps4x": {},  # 4× input partitions; handled via parts multiplier
    "combo": {
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.spill.diskWriteBufferSize": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
        "spark.io.compression.codec": "zstd",
    },
    # Heap-sizing arm: the r03 SKEW_PROBE ran this workload under
    # get_spark's 8g default and bottomed at 84.4 s, while the 48g
    # matrix baseline bottoms far higher — hypothesis: a small heap
    # forces the partial agg to spill EARLY and stream through disk,
    # while a big heap lets ~1e8-group state balloon in-heap and pays
    # GC instead. These two arms decide heap-vs-host for that delta.
    "mem8g": {},
    "combo8g": {
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.spill.diskWriteBufferSize": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
        "spark.io.compression.codec": "zstd",
    },
}
_PARTS_MULT = {"maps4x": 4, "combo": 4, "combo8g": 4}
_DRIVER_MEM = {"mem8g": "8g", "combo8g": "8g"}

_POINT_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from database_join_spark.datagen import Q4112Config, part2_query, q4112_frames
from database_join_spark.session import RUNTIME_CONFS

rows, reps, parts_mult, extra = {rows}, {reps}, {parts_mult}, {extra}
b = (SparkSession.builder.appName("spill-probe")
     .master("local[32]")
     .config("spark.sql.shuffle.partitions", "32")
     .config("spark.driver.memory", {mem!r})
     .config("spark.ui.enabled", "false"))
for k, v in RUNTIME_CONFS.items():
    b = b.config(k, v)
for k, v in extra.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism

cfg = Q4112Config(inner_tuples=100, outer_tuples=rows,
                  groups=100_000_000, outer_selectivity=1.0,
                  price_max=50, qty_max=20)
# JIT-only warm-up at 1/20 scale and 1/20 groups: compiles the same
# codegen'd pipeline without pre-warming the 20 GB shuffle path.
wcfg = Q4112Config(inner_tuples=100, outer_tuples=rows // 20,
                   groups=5_000_000, outer_selectivity=1.0,
                   price_max=50, qty_max=20)
wi, wo = q4112_frames(spark, wcfg, cores * parts_mult)
part2_query(wi, wo).collect()

runs = []
for _ in range(reps):
    items, orders = q4112_frames(spark, cfg, cores * parts_mult)
    t0 = time.perf_counter()
    part2_query(items, orders).collect()
    runs.append(round(time.perf_counter() - t0, 4))
print("RESULT " + json.dumps(runs))
spark.stop()
"""


def _drop_caches() -> bool:
    """Best-effort cold-start: sync + drop the page cache (root only).
    Kernel cache state only — no files are touched."""
    try:
        subprocess.run(["sync"], check=True)
        Path("/proc/sys/vm/drop_caches").write_text("3\n")
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def run_config(name: str, rows: int, reps: int) -> dict:
    extra = CONFIGS[name]
    prog = _POINT_PROG.format(
        repo=_REPO,
        rows=rows,
        reps=reps,
        parts_mult=_PARTS_MULT.get(name, 1),
        extra=repr(extra),
        mem=_DRIVER_MEM.get(name, "48g"),
    )
    cold = _drop_caches()
    proc = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            runs = json.loads(line[len("RESULT "):])
            return {
                "runs": runs,
                "first": runs[0],
                "min": min(runs),
                "first_over_min": round(runs[0] / min(runs), 2),
                "cold_start": cold,
                "confs": extra,
                "parts_mult": _PARTS_MULT.get(name, 1),
                "driver_mem": _DRIVER_MEM.get(name, "48g"),
            }
    raise RuntimeError(f"{name} failed:\n{proc.stdout}\n{proc.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="baseline,buffer,zstd,shm,maps4x,combo")
    ap.add_argument("--json", default="SPILL_PROBE.json")
    args = ap.parse_args()

    # Merge into an existing artifact so config arms can be run
    # incrementally (e.g. the mem8g/combo8g heap arms after the main
    # matrix) without re-paying the ~1h full sweep.
    out_path = Path(_REPO, args.json)
    if out_path.exists():
        out = json.loads(out_path.read_text())
        # Refuse to mix arms measured at different workload sizes into
        # one artifact: the merged file has a single rows/reps header
        # that BASELINE.md renders, so a mismatched incremental run
        # would silently misattribute old points (ADVICE r04).
        if (out.get("rows"), out.get("reps")) != (args.rows, args.reps):
            raise SystemExit(
                f"{out_path.name} holds points measured at rows="
                f"{out.get('rows')} reps={out.get('reps')}; rerun with "
                "matching --rows/--reps or use a different --json path"
            )
    else:
        out = {"rows": args.rows, "reps": args.reps, "points": {}}
    for name in args.configs.split(","):
        point = run_config(name, args.rows, args.reps)
        point["rows"], point["reps"] = args.rows, args.reps
        out["points"][name] = point
        print(
            f"# {name}: first {point['first']:.1f} s  min {point['min']:.1f} s"
            f"  ({point['first_over_min']}× cliff)  runs {point['runs']}",
            file=sys.stderr,
        )
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
