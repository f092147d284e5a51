#!/usr/bin/env python
"""Auto-sizing parity probe (VERDICT r04 Next #3 "Done" criterion).

plans/sizing.py closes the reference's FM-sizing loop: estimate the
group cardinality, pick the execution profile from the measured
regime table. This probe checks the closed loop against the
hand-picked bests of rounds 3–4 on the three measured regimes:

- groups=100   — hand best: defaults (bit 16, 1 task/core)
- groups=1e6   — hand best: fast map 2^20, 1 task/core (BASELINE.md
                 §Fast-map ablation, 8.55 s)
- groups=1e8   — hand best: wide-exchange confs + 48g heap + 4× map
                 tasks (§spill matrix "combo", 35.2 s steady)

Protocol per regime: (A) a DECIDE subprocess (default session) runs
plan_for on the orders frame and reports the decision + estimate
cost — planning and execution are separate JVMs exactly because the
wide-exchange profile is build-time; (B) an EXECUTE subprocess built
with the decided profile runs Part 2 with the decided fast-map bit
and task count; (C) an EXECUTE subprocess pinned to the hand-picked
best config does the same. Success: B within ±10% of C per regime
(identical configs make it a reproducibility check; a differing
config is the interesting case). Every run recorded.

Usage: python scripts/sizing_probe.py [--rows 1000000000]
       [--regimes g100,g1e6,g1e8] [--json SIZING_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

#: groups, timed reps, hand-picked best (spelling, profile,
#: capacity_bit, tasks_per_core) per BASELINE.md's r03/r04
#: measurements. The g1e8 hand config stays the r04 best practice
#: (default plan + wide-exchange confs) ON PURPOSE: round 5's auto
#: decision switched that regime to the repartition-first rewrite
#: (REGROUP_PROBE.json), so the parity row now measures the rewrite
#: against the best conf-only answer.
REGIMES: dict[str, dict] = {
    "g100": {"groups": 100, "reps": 5, "hand": ("plain", "default", 16, 1)},
    "g1e6": {"groups": 1_000_000, "reps": 3,
             "hand": ("plain", "default", 20, 1)},
    "g1e8": {"groups": 100_000_000, "reps": 2,
             "hand": ("plain", "wide-exchange", 16, 4)},
}

_DECIDE_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from database_join_spark.datagen import Q4112Config, q4112_frames
from database_join_spark.plans.sizing import plan_for
from database_join_spark.session import get_spark

spark = get_spark(app_name="sizing-decide")
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism
cfg = Q4112Config(inner_tuples=100, outer_tuples={rows},
                  groups={groups}, outer_selectivity=1.0,
                  price_max=50, qty_max=20)
items, orders = q4112_frames(spark, cfg, cores)
t0 = time.perf_counter()
s = plan_for(orders, ["store_id"])
print("RESULT " + json.dumps({{
    "est_groups": s.est_groups, "capacity_bit": s.capacity_bit,
    "tasks_per_core": s.tasks_per_core, "profile": s.profile,
    "partial_before_exchange": s.partial_before_exchange,
    "estimate_sec": round(time.perf_counter() - t0, 2)}}))
spark.stop()
"""

_EXEC_PROG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from database_join_spark.datagen import (
    Q4112Config, part2_query, part2_query_repartition_first, q4112_frames)
from database_join_spark.plans.sizing import AggSizing, applied
from database_join_spark.session import get_spark

spelling, profile, bit, mult, reps = (
    {spelling!r}, {profile!r}, {bit}, {mult}, {reps})
spark = get_spark(app_name="sizing-exec",
                  profile=None if profile == "default" else profile)
spark.sparkContext.setLogLevel("ERROR")
cores = spark.sparkContext.defaultParallelism
cfg = Q4112Config(inner_tuples=100, outer_tuples={rows},
                  groups={groups}, outer_selectivity=1.0,
                  price_max=50, qty_max=20)
# JIT-only warm-up at 1/20 scale (same discipline as spill_probe).
wcfg = Q4112Config(inner_tuples=100, outer_tuples={rows} // 20,
                   groups=max({groups} // 20, 1), outer_selectivity=1.0,
                   price_max=50, qty_max=20)
sizing = AggSizing(est_groups={groups}, capacity_bit=bit,
                   tasks_per_core=mult, profile=profile)

def query(items, orders):
    if spelling == "repart":
        return part2_query_repartition_first(items, orders, cores * mult)
    return part2_query(items, orders)

runs = []
with applied(spark, sizing):
    wi, wo = q4112_frames(spark, wcfg, cores * mult)
    query(wi, wo).collect()
    for _ in range(reps):
        items, orders = q4112_frames(spark, cfg, cores * mult)
        t0 = time.perf_counter()
        query(items, orders).collect()
        runs.append(round(time.perf_counter() - t0, 4))
print("RESULT " + json.dumps(runs))
spark.stop()
"""


def _run(prog: str) -> dict | list:
    proc = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"subprocess failed:\n{proc.stdout}\n{proc.stderr}")


def probe_regime(name: str, rows: int) -> dict:
    spec = REGIMES[name]
    groups, reps = spec["groups"], spec["reps"]
    decision = _run(
        _DECIDE_PROG.format(repo=_REPO, rows=rows, groups=groups)
    )
    print(f"# {name} decide: {decision}", file=sys.stderr)

    def execute(spelling: str, profile: str, bit: int, mult: int) -> list:
        return _run(
            _EXEC_PROG.format(
                repo=_REPO, rows=rows, groups=groups, reps=reps,
                spelling=spelling, profile=profile, bit=bit, mult=mult,
            )
        )

    auto_cfg = (
        "plain" if decision.get("partial_before_exchange", True)
        else "repart",
        decision["profile"],
        decision["capacity_bit"],
        decision["tasks_per_core"],
    )
    hand_cfg = tuple(spec["hand"])
    auto_runs = execute(*auto_cfg)
    hand_runs = (
        auto_runs if auto_cfg == hand_cfg else execute(*hand_cfg)
    )
    auto, hand = min(auto_runs), min(hand_runs)
    point = {
        "groups": groups,
        "decision": decision,
        "auto_config": list(auto_cfg),
        "hand_config": list(hand_cfg),
        "config_identical": auto_cfg == hand_cfg,
        "auto_runs": auto_runs,
        "hand_runs": hand_runs,
        "auto_sec": auto,
        "hand_sec": hand,
        "auto_over_hand": round(auto / hand, 3),
        "within_10pct": auto / hand <= 1.10,
    }
    print(
        f"# {name}: auto {auto:.2f} s vs hand {hand:.2f} s "
        f"({point['auto_over_hand']}x, identical={point['config_identical']})",
        file=sys.stderr,
    )
    return point


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--regimes", default="g100,g1e6,g1e8")
    ap.add_argument("--json", default="SIZING_PROBE.json")
    args = ap.parse_args()

    out_path = Path(_REPO, args.json)
    if out_path.exists():
        out = json.loads(out_path.read_text())
        if out.get("rows") != args.rows:
            raise SystemExit(
                f"{out_path.name} holds rows={out.get('rows')}; rerun "
                "with matching --rows or another --json path"
            )
    else:
        out = {"rows": args.rows, "points": {}}
    for name in args.regimes.split(","):
        out["points"][name] = probe_regime(name, args.rows)
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
