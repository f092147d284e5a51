"""bench.py contract smoke test.

The driver records bench.py's single stdout JSON line as the round's
BENCH artifact; a crash or malformed line loses the round's
performance record (r03 lost its query map to output truncation).
This runs the REAL bench.py in a subprocess at toy scale and pins
the output contract: one parseable JSON line, the required keys
(round 9: every headline `_sec` row including the bucketed
aggregate, plus the host block), the 1,900-char budget the driver's
tail capture imposes, and the slim/full split — sizing decisions
and runs arrays live in BENCH_FULL.json, NOT on the printed line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_one_valid_slim_json_line(tmp_path):
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "8",
        "BENCH_REPEATS": "1",
        "BENCH_THROUGHPUT_ROWS": "2000000",
        "PYTHONPATH": str(REPO),
        # keep the toy run from clobbering the repo's committed
        # full-payload sidecar
        "BENCH_FULL_PATH": str(tmp_path / "BENCH_FULL.json"),
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(lines) == 1, proc.stdout
    line = lines[0]
    assert len(line) <= 1900  # driver tail-capture budget
    out = json.loads(line)
    assert out["metric"] == "bench_total_sec"
    assert out["unit"] == "sec"
    assert out["queries"] and all(
        v > 0 for v in out["queries"].values()
    )
    wl = out.get("reference_workload")
    if wl is None:  # slim fallback when the line would overflow
        assert out.get("reference_workload_in") == "BENCH_FULL.json"
        wl = json.loads(
            (tmp_path / "BENCH_FULL.json").read_text()
        )["reference_workload"]
    # the full sidecar landed at the overridden path, not the repo's
    assert (tmp_path / "BENCH_FULL.json").exists()
    # the slim line carries every headline timing (round 9 adds the
    # bucketed-aggregate rows) ...
    for key in (
        "q4112_part1_sec",
        "q4112_part2_sec",
        "part2_groups1e6_sec",
        "part2_groups1e8_sec",
        "part2_groups1e8_bucketed_sec",
        "part2_groups1e8_bucketed_cold_sec",
        "part2_groups1e8_bucketed_build_sec",
        "large_inner_sec",
        "large_inner_bucketed_sec",
        "large_inner_bucketed_build_sec",
    ):
        assert key in wl, sorted(wl)
    # ... and the host drift-adjudication block (round 9, r08 #5;
    # round 12 adds the recorded quiet-window decision, r11 #3)
    assert set(out.get("host", {})) == {"start", "mid", "end", "quiet"}
    # round 14 (VERDICT r13 #7): the committed quiet-control band
    # rides the line when the artifact is readable — per-query
    # medians rounded to the 0.01 s band plus its recorded load1 —
    # so a "regressed" status can be read against the quiet band
    # without re-deriving it from repo history. Additions-only: all
    # pre-existing keys above are untouched.
    if (REPO / "BENCH_SF_ONLY.json").exists():
        qc = out.get("quiet_control")
        assert qc is not None and qc["source"] == "BENCH_SF_ONLY.json"
        committed = json.loads(
            (REPO / "BENCH_SF_ONLY.json").read_text()
        )["queries"]
        assert set(qc["queries"]) == set(committed)
        assert all(
            abs(qc["queries"][k] - committed[k]) <= 0.005 + 1e-9
            for k in committed
        )
    waited, load1 = out["host"]["quiet"]
    assert waited >= 0 and load1 > 0
    # sizing decisions / runs arrays / derivable per-row extras are
    # audit payload: slimmed OFF the printed line (round 9 — the
    # 1,900-char tail budget must fit the reference_workload map),
    # present in the full sidecar of record
    full_wl = json.loads(
        (tmp_path / "BENCH_FULL.json").read_text()
    )["reference_workload"]
    for key in (
        "part2_groups1e6_sizing",
        "part2_groups1e8_sizing",
        "part2_groups1e8_runs",
        "part2_groups1e8_bucketed_runs",
    ):
        assert key in full_wl, sorted(full_wl)
        assert key not in out.get("reference_workload", {}), key
    sizing = full_wl["part2_groups1e6_sizing"]
    assert set(sizing) >= {
        "est_groups",
        "capacity_bit",
        "tasks_per_core",
        "profile",
    }
    # round-6 row: the no-reduction regime records the decision the
    # sizing loop actually made (at toy scale the estimate is small,
    # so the chosen spelling may be the standard plan — the CONTRACT
    # is that the decision fields are present and consistent)
    nr = full_wl["part2_groups1e8_sizing"]
    assert set(nr) >= {
        "est_groups",
        "repartition_first",
        "profile",
        "profile_applied",
    }
    assert isinstance(nr["repartition_first"], bool)
