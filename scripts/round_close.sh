#!/bin/sh
# Regenerate every generated table from the newest committed
# artifacts, in dependency order (VERDICT r05 #4: BASELINE.md cited a
# stale BENCH because the generators ran before the round's artifact
# landed). Run this FIRST THING each round — the driver writes
# BENCH_r{N}/CORRECTNESS_r{N} after the round's final commit, so the
# freshest artifacts are only committed when the next round opens —
# and again before the round's final commit if new local artifacts
# (probes, bench reruns) landed meanwhile.
set -e
cd "$(dirname "$0")/.."
python scripts/gen_baseline.py
python scripts/gen_status.py > STATUS.md
python scripts/plan_audit.py > PLANS.md
echo "round-close regeneration complete"
