#!/usr/bin/env python
"""Regenerate BASELINE.md's measured table from the BENCH artifact.

VERDICT r01 and r02 both flagged the hand-maintained "Measured" table
drifting from `BENCH_r{N}.json` (in r01 the drift masked a gate
failure). This script makes the artifact the single source: it reads
the newest `BENCH_r{N}.json` (or the path passed as argv[1]) and
rewrites the marked block in BASELINE.md.

Reference constants come from the reference's own CSVs (BASELINE.md
top sections): Part 1 0.51 s and Part 2 1.26 s at 16 threads, 1e9
outer tuples (`q4112_hj.csv:26-50`, `q4112.csv:1-25`).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN = "<!-- BENCH_MEASURED:BEGIN (generated — do not edit by hand) -->"
END = "<!-- BENCH_MEASURED:END -->"

#: Reference @16T seconds for 1e9 outer tuples.
REF = {"q4112_part1": 0.51, "q4112_part2": 1.26}


def newest_bench() -> Path:
    benches = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not benches:
        raise SystemExit("no BENCH_r*.json found")
    return benches[-1]


def render(bench_path: Path) -> str:
    bench = json.loads(bench_path.read_text())
    # The round driver wraps bench.py's JSON line under "parsed"
    # (BENCH_r{N}.json); a direct bench.py capture is the line itself.
    payload = bench.get("parsed", bench)
    wl = payload.get("reference_workload", {})
    rows_total = payload.get("throughput_rows", 1_000_000_000)

    lines = [
        f"Artifact of record: `{bench_path.name}` "
        f"(round {bench.get('n', '?')}, local[{bench.get('cpus', '?')}]).",
        "",
        "| workload | reference @16T | this engine @local[32] | ratio |",
        "|---|---|---|---|",
    ]
    for key, label in [
        ("q4112_part1", "Part 1 (HJ + scalar int AVG)"),
        ("q4112_part2", "Part 2 (HJ + group-by + avg-of-avgs)"),
    ]:
        sec = wl.get(f"{key}_sec")
        if sec is None:
            continue
        gps = wl.get(f"{key}_gtuples_per_sec", rows_total / sec / 1e9)
        ref = REF[key]
        lines.append(
            f"| {label} | {ref:.2f} s ⇒ {rows_total / ref / 1e9:.2f} G tuples/s "
            f"| {sec:.2f} s ⇒ {gps:.2f} G tuples/s | {sec / ref:.2f}× |"
        )
    li_sec = wl.get("large_inner_sec")
    if li_sec is not None:
        li_rows = wl.get("large_inner_rows", 0)
        li_gps = wl.get("large_inner_gtuples_per_sec", 0.0)
        lines.append(
            f"| large_inner (inner=1e7, SHUFFLE_HASH, {li_rows:.0e} probes) "
            f"| — (no matching ref config; see Large-build-side section) "
            f"| {li_sec:.2f} s ⇒ {li_gps:.3f} G tuples/s | — |"
        )
    gate = all(
        wl.get(f"{k}_sec", float("inf")) / REF[k] <= 2.0 for k in REF
    )
    lines += [
        "",
        f"2× BENCH gate: **{'pass' if gate else 'FAIL'}** "
        f"(both parts must be within 2× of the reference @16T).",
    ]
    return "\n".join(lines)


def main() -> None:
    bench_path = (
        Path(sys.argv[1]) if len(sys.argv) > 1 else newest_bench()
    )
    baseline = REPO / "BASELINE.md"
    text = baseline.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit("BASELINE.md markers not found")
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    baseline.write_text(pre + BEGIN + "\n" + render(bench_path) + "\n" + END + post)
    print(f"BASELINE.md measured table regenerated from {bench_path.name}")


if __name__ == "__main__":
    main()
