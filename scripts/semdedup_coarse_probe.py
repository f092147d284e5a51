#!/usr/bin/env python
"""SemDeDup coarse-scorer probe at 1M/k=100 (round 11, VERDICT r10 #5).

After the sampled fit (round 10) the 1M wall is ~95% within-block
scorer (SEMDEDUP_SAMPLEDFIT_PROBE: e2e 824.6 s with the fit at 33 s).
This probe prices the two-tier int8/SGEMM scorer
(``semdedup_pairs(coarse_score=True)``): tier 1 sweeps pairs as a
float32 SGEMM over per-vector int8 images — bit-exact over int8
values and 2× DGEMM's flop rate at half the tile traffic — with a
per-vector exact angular-error bound that makes tier-1 recall 1.0 by
construction; tier 2 pays exact int64 arithmetic only for tier-1
survivors. Output is therefore IDENTICAL, which the probe asserts as
set equality, not a recall floor.

Arms (same synthetic corpus as SEMDEDUP_PROBE: 1M base vectors + 10k
planted twins, k=100, 5 iterations, sampled fit 1-in-10 + adaptive
ratio probing — the shipped at-scale recipe):

- ``exact``  — semdedup_pairs(fit_sample_mod=10, ratio=1.5)
- ``coarse`` — same + coarse_score=True

Usage: python scripts/semdedup_coarse_probe.py [--n 1000000] [--quick]
Writes SEMDEDUP_COARSE_PROBE.json at the repo root.
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

from database_join_spark.operators import similarity as S  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402
from scripts.semdedup_probe import (  # noqa: E402
    DUP_EVERY,
    ITERS,
    THRESHOLD,
    VECTORS_PER_CLUSTER,
    synth_corpus,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument(
        "--quick", action="store_true",
        help="100k-vector smoke of the full harness",
    )
    args = ap.parse_args()
    n = 100_000 if args.quick else args.n
    k = max(10, n // VECTORS_PER_CLUSTER)
    n_twins = n // DUP_EVERY
    truth = {(b, n + b // DUP_EVERY) for b in range(0, n, DUP_EVERY)}

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="semdedup-coarse-probe")
    spark.sparkContext.setLogLevel("ERROR")

    vecs = synth_corpus(spark, n).persist()
    total = vecs.count()

    out: dict = {
        "n_base": n,
        "n_total": total,
        "k": k,
        "iterations": ITERS,
        "ratio": 1.5,
        "cap": 4,
        "fit_sample_mod": 10,
        "host_start": host_snapshot(),
        "arms": {},
    }

    results: dict[str, set] = {}
    for name, coarse in (("exact", False), ("coarse", True)):
        t0 = time.monotonic()
        got = {
            (r["id_a"], r["id_b"])
            for r in S.semdedup_pairs(
                vecs,
                k=k,
                iterations=ITERS,
                m=4,
                threshold=THRESHOLD,
                ratio=1.5,
                fit_sample_mod=10,
                coarse_score=coarse,
            ).collect()
        }
        sec = round(time.monotonic() - t0, 2)
        results[name] = got
        out["arms"][name] = {
            "sec_end_to_end": sec,
            "recall_vs_planted": round(len(got & truth) / n_twins, 4),
            "planted_pairs": n_twins,
            "emitted_pairs": len(got),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    # the exactness contract: identical pair SETS, not a recall floor
    assert results["coarse"] == results["exact"], (
        len(results["coarse"] - results["exact"]),
        len(results["exact"] - results["coarse"]),
    )
    out["identical_pair_sets"] = True
    out["speedup_end_to_end"] = round(
        out["arms"]["exact"]["sec_end_to_end"]
        / out["arms"]["coarse"]["sec_end_to_end"],
        3,
    )
    print(f"# speedup: {out['speedup_end_to_end']}x", file=sys.stderr)

    out["host_end"] = host_snapshot()
    vecs.unpersist()
    # one artifact, one point per scale — the scorer's share of the
    # e2e wall shrinks with n at fixed vectors-per-cluster, so the
    # speedup is scale-dependent and both points belong on record
    artifact = Path(_REPO, "SEMDEDUP_COARSE_PROBE.json")
    points = {}
    if artifact.exists():
        try:
            points = json.loads(artifact.read_text()).get("points", {})
        except ValueError:
            points = {}
    points[str(n)] = out
    artifact.write_text(
        json.dumps({"points": points}, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("host_start", "host_end")}))
    spark.stop()


if __name__ == "__main__":
    main()
