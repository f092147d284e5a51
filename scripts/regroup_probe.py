#!/usr/bin/env python
"""Aggregate-spelling probe at groups=1e8 uniform (round 5).

SPILL_PROBE (r04) attacked the no-reduction exchange with CONFS and
got 5.9× (207.5 → 35.2 s quiet-host). This probe attacks the PLAN:
when nearly every row is its own group, the standard
partial-then-final aggregate builds a useless ~rows-per-task-entry
map before the exchange; `part2_query_repartition_first` ships the
raw (key, value) rows and aggregates once, post-exchange, where each
task owns ~groups/partitions keys.

Arms (each a fresh JVM, one codegen warm-up at 1/20 scale, `reps`
timed runs; all arms same session-day so host state is comparable —
cross-day absolute numbers are NOT, see BASELINE.md §Part-2
regression):

- plain_wide4x    — prior best practice: default plan, wide-exchange
                    confs + 48g heap, 4× map tasks
- repart_wide4x   — rewrite under the same tuned profile
- repart_default4x— rewrite, UNTUNED profile (8g heap, lz4)
- repart_default1x/8x — partition-count sensitivity

Usage: python scripts/regroup_probe.py [--rows 1000000000] [--reps 2]
       [--arms ...] [--json REGROUP_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

#: arm -> (spelling, profile, parts_mult, hh_groups, hh_prob).
#: The *_hh arms probe the rewrite's skew hazard: with ≥ O(cores)
#: hot keys the hot mass spreads across reducers and the rewrite
#: still wins; with ONE key owning half the rows, the rewrite
#: funnels 5e8 rows through a single reducer while the default
#: plan's partial agg crushes the hot key map-side — the sampled
#: top-share guard in plans/sizing.py exists because of these arms.
ARMS: dict[str, tuple[str, str, int, int, float]] = {
    "plain_wide4x": ("plain", "wide-exchange", 4, 0, 0.0),
    "repart_wide4x": ("repart", "wide-exchange", 4, 0, 0.0),
    "repart_default4x": ("repart", "default", 4, 0, 0.0),
    "repart_default1x": ("repart", "default", 1, 0, 0.0),
    "repart_default8x": ("repart", "default", 8, 0, 0.0),
    "plain_wide4x_hh100": ("plain", "wide-exchange", 4, 100, 0.5),
    "repart_default4x_hh100": ("repart", "default", 4, 100, 0.5),
    "plain_wide4x_hh1": ("plain", "wide-exchange", 4, 1, 0.5),
    "repart_default4x_hh1": ("repart", "default", 4, 1, 0.5),
}

_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from database_join_spark.datagen import (
    Q4112Config, part2_query, part2_query_repartition_first, q4112_frames)
from database_join_spark.session import get_spark

spelling, profile, mult, rows, reps = (
    {spelling!r}, {profile!r}, {mult}, {rows}, {reps})
hh_groups, hh_prob = {hh_groups}, {hh_prob}
spark = get_spark(app_name="regroup-probe",
                  profile=None if profile == "default" else profile)
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism

def query(items, orders):
    if spelling == "plain":
        return part2_query(items, orders)
    return part2_query_repartition_first(items, orders, cores * mult)

cfg = Q4112Config(inner_tuples=100, outer_tuples=rows,
                  groups=100_000_000, outer_selectivity=1.0,
                  price_max=50, qty_max=20,
                  hh_groups=hh_groups, hh_prob=hh_prob)
wcfg = Q4112Config(inner_tuples=100, outer_tuples=rows // 20,
                   groups=5_000_000, outer_selectivity=1.0,
                   price_max=50, qty_max=20,
                   hh_groups=hh_groups, hh_prob=hh_prob)
wi, wo = q4112_frames(spark, wcfg, cores * mult)
query(wi, wo).collect()
runs, answer = [], None
for _ in range(reps):
    items, orders = q4112_frames(spark, cfg, cores * mult)
    t0 = time.perf_counter()
    answer = query(items, orders).collect()[0].asDict()
    runs.append(round(time.perf_counter() - t0, 2))
print("RESULT " + json.dumps({{"runs": runs, "answer": answer}}))
spark.stop()
"""


def run_arm(name: str, rows: int, reps: int) -> dict:
    spelling, profile, mult, hh_groups, hh_prob = ARMS[name]
    prog = _PROG.format(
        repo=_REPO, spelling=spelling, profile=profile,
        mult=mult, rows=rows, reps=reps,
        hh_groups=hh_groups, hh_prob=hh_prob,
    )
    proc = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            payload = json.loads(line[len("RESULT "):])
            return {
                "spelling": spelling, "profile": profile,
                "parts_mult": mult, "hh_groups": hh_groups,
                "hh_prob": hh_prob, "runs": payload["runs"],
                "min": min(payload["runs"]), "answer": payload["answer"],
            }
    raise RuntimeError(f"{name} failed:\n{proc.stdout}\n{proc.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--json", default="REGROUP_PROBE.json")
    args = ap.parse_args()

    out_path = Path(_REPO, args.json)
    if out_path.exists():
        out = json.loads(out_path.read_text())
        if (out.get("rows"), out.get("reps")) != (args.rows, args.reps):
            raise SystemExit(
                f"{out_path.name} holds rows={out.get('rows')} "
                f"reps={out.get('reps')}; rerun with matching flags"
            )
    else:
        out = {"rows": args.rows, "reps": args.reps,
               "groups": 100_000_000, "points": {}}
    for name in args.arms.split(","):
        point = run_arm(name, args.rows, args.reps)
        out["points"][name] = point
        print(f"# {name}: min {point['min']} s  runs {point['runs']}",
              file=sys.stderr)
    by_cfg: dict[tuple, set] = {}
    for p in out["points"].values():
        by_cfg.setdefault(
            (p.get("hh_groups", 0), p.get("hh_prob", 0.0)), set()).add(
            json.dumps(p["answer"], sort_keys=True))
    for cfg_key, answers in by_cfg.items():
        if len(answers) > 1:
            raise SystemExit(
                f"arms disagree on the answer at hh={cfg_key}: {answers}")
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
