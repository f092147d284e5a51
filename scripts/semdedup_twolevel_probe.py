#!/usr/bin/env python
"""Two-level SemDeDup assign probe (round 13, VERDICT r12 #1/#2).

Round 12 made SemDeDup's blocking constant scale (k_for: k ∝ n), which
leaves the ASSIGN as the last super-linear term: the flat GEMM does
n·k distance work, so under k ∝ n it is ∝ n². The fix is the two-level
quantizer (operators/similarity.kmeans_assign_topm_2l): a √k coarse
router OVER THE UNTOUCHED FINE CENTROIDS plus ratio-capped coarse
probing — n·(√k + coarse_m·√k) work, bit-compatible with the flat
assign wherever the coarse probe covers the true top-m cells.

Three parts (VERDICT r12 #1's "Done =" list):

* ``parity`` (n=1M, k=k_for(n)): emitted-row deviation of the
  two-level assign vs the flat assign on IDENTICAL centroids — the
  shipped ratio-capped spelling (m=4, ratio=1.5) and the uncapped
  m=4/ratio=None regime (where a 4th-nearest centroid can sit in an
  unprobed cell; the deviation there is the documented bounded one).
* ``crossover`` (n=1M, k ∈ {1000, 2048, 3162}): flat vs two-level
  assign wall at fixed n — picks plans/sizing.TWOLEVEL_ASSIGN_MIN_K.
* ``scale`` (n ∈ {1M, 2M, 4M}, k=k_for(n)): assign wall under both
  spellings — flat must bend super-linearly, two-level ~linearly —
  plus the SHIPPED operator end-to-end at the largest n (auto
  dispatch routes it through the two-level path past the threshold)
  with planted-twin recall.

Usage: python scripts/semdedup_twolevel_probe.py [--quick]
       [--part parity|crossover|scale|all] [--ns 1000000,2000000,4000000]
Writes SEMDEDUP_TWOLEVEL_PROBE.json (merge-on-write per part).
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
from database_join_spark.plans.sizing import (  # noqa: E402
    fit_sample_mod_for,
    k_for,
)
from database_join_spark.session import get_spark  # noqa: E402
from scripts.semdedup_probe import (  # noqa: E402
    DUP_EVERY,
    ITERS,
    THRESHOLD,
    synth_corpus,
)

M, RATIO = 4, 1.5


def _fit(emb, n_total: int, k: int):
    """Sampled fit exactly as semdedup_pairs does it."""
    mod = fit_sample_mod_for(n_total, k)
    fit_in = emb
    if mod > 1:
        fit_in = emb.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
        )
        if fit_in.limit(k).count() < k:
            fit_in = emb
    t0 = time.monotonic()
    _a, cents, _h = S.kmeans_fit(fit_in, k=k, iterations=ITERS)
    return cents, round(time.monotonic() - t0, 2), mod


def _assign_wall(base, cents, impl: str, m=M, ratio=RATIO):
    t0 = time.monotonic()
    rows = S.kmeans_assign_topm(
        base, cents, m=m, ratio=ratio, impl=impl
    ).count()
    return round(time.monotonic() - t0, 2), rows


def part_parity(spark, host_snapshot, n: int) -> dict:
    emb = synth_corpus(spark, n).persist()
    n_total = emb.count()
    k = k_for(n_total)
    cents, fit_sec, mod = _fit(emb, n_total, k)
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(S._quant("embedding")).alias("qv"),
    )
    out = {
        "n_total": n_total,
        "k": k,
        "fit_sample_mod": mod,
        "fit_sec": fit_sec,
        "configs": [],
    }
    for m, ratio in ((M, RATIO), (M, None)):
        flat = (
            S.kmeans_assign_topm(base, cents, m=m, ratio=ratio, impl="np")
            .select("id", "block")
            .localCheckpoint(eager=True)
        )
        two = (
            S.kmeans_assign_topm(
                base, cents, m=m, ratio=ratio, impl="np2l"
            )
            .select("id", "block")
            .localCheckpoint(eager=True)
        )
        only_flat = flat.exceptAll(two).count()
        only_two = two.exceptAll(flat).count()
        fr, tr = flat.count(), two.count()
        out["configs"].append(
            {
                "m": m,
                "ratio": ratio,
                "flat_rows": fr,
                "twolevel_rows": tr,
                "only_flat": only_flat,
                "only_twolevel": only_two,
                "deviation_frac": round((only_flat + only_two) / fr, 6),
            }
        )
        print(json.dumps(out["configs"][-1]))
    emb.unpersist()
    out["host"] = host_snapshot()
    return out


def part_crossover(spark, host_snapshot, n: int, ks) -> dict:
    emb = synth_corpus(spark, n).persist()
    n_total = emb.count()
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(S._quant("embedding")).alias("qv"),
    ).localCheckpoint(eager=True)
    out = {"n_total": n_total, "rungs": []}
    for k in ks:
        cents, fit_sec, mod = _fit(emb, n_total, k)
        flat_sec, flat_rows = _assign_wall(base, cents, "np")
        two_sec, two_rows = _assign_wall(base, cents, "np2l")
        rung = {
            "k": k,
            "fit_sec": fit_sec,
            "flat_assign_sec": flat_sec,
            "twolevel_assign_sec": two_sec,
            "speedup": round(flat_sec / max(two_sec, 1e-9), 2),
            "flat_rows": flat_rows,
            "twolevel_rows": two_rows,
        }
        out["rungs"].append(rung)
        print(json.dumps(rung))
    emb.unpersist()
    out["host"] = host_snapshot()
    return out


def part_scale(spark, host_snapshot, ns) -> dict:
    out = {"rungs": [], "end_to_end": None}
    for n in ns:
        # one synth per n — the end-to-end arm at the largest n
        # reuses the same persisted corpus (the generator is cheap
        # since the round-13 broadcast-join rewrite, but a second
        # 4M materialization is still pure waste)
        emb = synth_corpus(spark, n).persist()
        n_total = emb.count()
        k = k_for(n_total)
        cents, fit_sec, mod = _fit(emb, n_total, k)
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        ).localCheckpoint(eager=True)
        flat_sec, flat_rows = _assign_wall(base, cents, "np")
        two_sec, two_rows = _assign_wall(base, cents, "np2l")
        rung = {
            "n_total": n_total,
            "k": k,
            "fit_sample_mod": mod,
            "fit_sec": fit_sec,
            "flat_assign_sec": flat_sec,
            "twolevel_assign_sec": two_sec,
            "flat_rows": flat_rows,
            "twolevel_rows": two_rows,
            "host": host_snapshot(),
        }
        out["rungs"].append(rung)
        print(json.dumps(rung))

        if n == max(ns):
            # end-to-end SHIPPED operator: auto dispatch must route
            # through the two-level path (k_for(n) >= threshold)
            truth = {
                (b, n + b // DUP_EVERY)
                for b in range(0, n, DUP_EVERY)
            }
            t0 = time.monotonic()
            got = {
                (r["id_a"], r["id_b"])
                for r in S.semdedup_pairs(
                    emb,
                    k=k,
                    iterations=ITERS,
                    m=M,
                    threshold=THRESHOLD,
                    ratio=RATIO,
                    fit_sample_mod=fit_sample_mod_for(n_total, k),
                ).collect()
            }
            wall = round(time.monotonic() - t0, 2)
            from database_join_spark.plans.sizing import (
                TWOLEVEL_ASSIGN_MIN_K,
            )

            out["end_to_end"] = {
                "n_total": n_total,
                "k": k,
                "auto_dispatch_twolevel": k >= TWOLEVEL_ASSIGN_MIN_K,
                "wall_sec": wall,
                "recall_vs_planted": round(
                    len(got & truth) / len(truth), 4
                ),
                "emitted_pairs": len(got),
                "host": host_snapshot(),
            }
            print(json.dumps(out["end_to_end"]))
        emb.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="50k smoke")
    ap.add_argument("--part", default="all")
    ap.add_argument("--ns", type=str, default="1000000,2000000,4000000")
    ap.add_argument("--ks", type=str, default="1000,2048,3162")
    args = ap.parse_args()

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="semdedup-twolevel")
    spark.sparkContext.setLogLevel("ERROR")

    n1 = 50_000 if args.quick else 1_000_000
    ns = (
        [10_000, 20_000, 50_000]
        if args.quick
        else [int(s) for s in args.ns.split(",")]
    )
    ks = (
        [100, 316]
        if args.quick
        else [int(s) for s in args.ks.split(",")]
    )

    # Incremental merge-on-write after EACH part: a crash or kill in
    # a later part keeps the earlier parts' measurements (the first
    # round-13 run lost 50 minutes of data to an end-of-main write).
    artifact = Path(_REPO, "SEMDEDUP_TWOLEVEL_PROBE.json")

    def flush(key: str, value) -> None:
        merged: dict = {}
        if artifact.exists():
            merged = json.loads(artifact.read_text())
        merged[key] = value
        merged["quick"] = args.quick
        merged["m"] = M
        merged["ratio"] = RATIO
        merged["coarse_probe"] = {
            "coarse_m": S.COARSE_PROBE_M,
            "coarse_ratio": S.COARSE_PROBE_RATIO,
        }
        artifact.write_text(json.dumps(merged, indent=1) + "\n")
        print(f"flushed part {key!r}")

    if args.part in ("parity", "all"):
        flush("parity", part_parity(spark, host_snapshot, n1))
    if args.part in ("crossover", "all"):
        flush(
            "crossover",
            part_crossover(spark, host_snapshot, n1, ks),
        )
    if args.part in ("scale", "all"):
        flush("scale", part_scale(spark, host_snapshot, ns))
    print("wrote SEMDEDUP_TWOLEVEL_PROBE.json")


if __name__ == "__main__":
    main()
