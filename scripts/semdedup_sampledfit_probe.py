#!/usr/bin/env python
"""SemDeDup sampled-fit probe at 1M/k=100 (round 10, VERDICT r09 #6).

The r09 adaptive arms hold recall 1.0 at 0.23× of the fixed-m=4
candidate mass (SEMDEDUP_PROBE.json), but the 1M wall is
fit/assign-bound — the k-means fit scans the full corpus once per
iteration. Blocking quality depends on WHERE the centroids sit, not
on which rows placed them, so the at-scale lever is fitting on a
deterministic hash-sample while the assign stays full-corpus
(``semdedup_pairs(fit_sample_mod=…)``, round 10).

Arms (same synthetic corpus as SEMDEDUP_PROBE: 1M base vectors +
10k planted twins, k=100, 5 iterations):

- ``fit_full`` / ``fit_s10`` / ``fit_s100`` — kmeans_fit wall on the
  full corpus vs the 1-in-10 / 1-in-100 ``xxhash64(id) % mod == 0``
  samples (fit cost is ~linear in fit rows; the centroid-update
  exchange is k·dim-bounded either way).
- ``e2e_s10`` / ``e2e_s100`` — full semdedup_pairs
  (ratio=1.5, cap=4, threshold as shipped) under each sampled fit:
  recall vs planted twins must hold 1.0 for the recipe to graduate;
  candidate mass is compared against the r09 full-fit arm
  (r1.5_cap4: 2.068e10 candidates, recall 1.0, 907.65 s e2e —
  different host state, so walls are indicative, recall/mass are
  the contract).

Usage: python scripts/semdedup_sampledfit_probe.py [--n 1000000]
       [--quick]
Writes SEMDEDUP_SAMPLEDFIT_PROBE.json at the repo root.
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

from pyspark.sql import functions as F  # noqa: E402

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

    spark = get_spark(app_name="semdedup-sampledfit-probe")
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
        "host_start": host_snapshot(),
        "arms": {},
    }

    # ---- fit-cost arms ------------------------------------------------
    for name, mod in (("fit_full", None), ("fit_s10", 10),
                      ("fit_s100", 100)):
        fit_in = vecs
        if mod:
            fit_in = vecs.filter(
                F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
            )
        fit_rows = fit_in.count()
        t0 = time.monotonic()
        _a, cents, _h = S.kmeans_fit(fit_in, k=k, iterations=ITERS)
        sec = round(time.monotonic() - t0, 2)
        out["arms"][name] = {
            "fit_rows": fit_rows,
            "fit_sec": sec,
            "k_effective": len(cents),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)
        assert len(cents) == k, (name, len(cents), k)

    # ---- end-to-end recall under the sampled fits ---------------------
    for name, mod in (("e2e_s10", 10), ("e2e_s100", 100)):
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
                fit_sample_mod=mod,
            ).collect()
        }
        sec = round(time.monotonic() - t0, 2)
        hit = len(got & truth)
        out["arms"][name] = {
            "sec_end_to_end": sec,
            "recall_vs_planted": round(hit / n_twins, 4),
            "planted_pairs": n_twins,
            "emitted_pairs": len(got),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    # the r09 full-fit reference for the same shape (host state
    # differs; recall/candidate-mass are the contract, walls are
    # indicative)
    ref = Path(_REPO, "SEMDEDUP_PROBE.json")
    if ref.exists() and not args.quick:
        for p in json.loads(ref.read_text())["points"]:
            if p["n_base"] == n and f"r1.5_cap4" in p.get("adaptive", {}):
                out["r09_full_fit_reference"] = p["adaptive"]["r1.5_cap4"]

    out["host_end"] = host_snapshot()
    vecs.unpersist()
    Path(_REPO, "SEMDEDUP_SAMPLEDFIT_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out["arms"]))
    spark.stop()


if __name__ == "__main__":
    main()
