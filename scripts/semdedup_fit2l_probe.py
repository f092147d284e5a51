#!/usr/bin/env python
"""Two-level FIT probe for SemDeDup (round 13 follow-through).

SEMDEDUP_TWOLEVEL_PROBE.json closed the pair-assign term (n·√k) and
measured the SAMPLED FIT as the new dominant phase at 4M (153–177 s:
n_s·k GEMM per Lloyd iteration with n_s = 100·k under k_for's k ∝ n —
a 100·k² term, ∝ n²). The fix mirrors the assign work: the fit loop's
nearest-centroid assignment now routes through the same √k coarse
router (operators/similarity.kmeans_assign_np_2l) past
TWOLEVEL_ASSIGN_MIN_K, turning the per-iteration work into
n_s·(√k + coarse_m·√k) ≈ 100·k^1.5. Inside Lloyd's a rare
covered-cell miss only nudges one centroid's floor mean — the fit
stays bit-deterministic, just not bit-identical to the flat
trajectory, so this probe measures BOTH the wall and the downstream
effect (centroid drift + planted-pair recall through the shipped
operator).

Parts:

* ``parity`` (n=1M, k=k_for): flat fit (assign_impl="np") vs
  two-level fit (assign_impl="np2l") on the identical corpus —
  per-coordinate centroid deviation, then the SHIPPED blocking +
  scoring run against BOTH centroid sets: emitted-pair symmetric
  difference and planted recall under each.
* ``scale`` (n ∈ 1M/2M/4M, k=k_for(n)): fit wall flat vs two-level
  at the shipped sampled-fit recipe — flat must grow ~k² per
  iteration, two-level ~k^1.5.
* ``end_to_end`` (largest n): the shipped ``semdedup_pairs`` verbatim
  (auto dispatch → two-level fit AND two-level assign) — wall +
  planted recall, against the r13 flat-fit record (349 s at 4M,
  SEMDEDUP_TWOLEVEL_PROBE.json scale part).

Usage: python scripts/semdedup_fit2l_probe.py [--quick]
       [--part parity|scale|e2e|all] [--ns 1000000,2000000,4000000]
Writes SEMDEDUP_FIT2L_PROBE.json (merge-on-write per part).
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


def _fit_input(emb, n_total: int, k: int):
    mod = fit_sample_mod_for(n_total, k)
    fit_in = emb
    if mod > 1:
        fit_in = emb.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
        )
        if fit_in.limit(k).count() < k:
            fit_in = emb
    return fit_in, mod


def _fit(emb, n_total: int, k: int, impl: str):
    fit_in, mod = _fit_input(emb, n_total, k)
    t0 = time.monotonic()
    _a, cents, _h = S.kmeans_fit(
        fit_in, k=k, iterations=ITERS, assign_impl=impl
    )
    return cents, round(time.monotonic() - t0, 2), mod


def _pairs_for_cents(emb, base, cents, k: int):
    """The shipped blocking + scoring downstream of a DONE fit —
    semdedup_pairs' own spellings, so both centroid sets feed the
    identical machinery."""
    from database_join_spark.session import track_persist

    blocks = track_persist(
        S.kmeans_assign_topm(base, cents, m=M, ratio=RATIO)
    )
    sizes = blocks.groupBy("block").agg(F.count(F.lit(1)).alias("s"))
    chunks = sizes.select(
        "block",
        F.greatest(
            F.lit(1), F.ceil(F.col("s") / S.SEMDEDUP_TARGET_CHUNK)
        )
        .cast("int")
        .alias("c"),
    )
    chunked = (
        blocks.join(F.broadcast(chunks), "block")
        .withColumn(
            "ch", F.pmod(F.xxhash64("id"), F.col("c")).cast("int")
        )
        .withColumn("other", F.explode(F.expr("sequence(0, c - 1)")))
        .select(
            "block",
            "id",
            "qv",
            "ch",
            F.least("ch", "other").alias("ca"),
            F.greatest("ch", "other").alias("cb"),
        )
    )
    scored = chunked.groupBy("block", "ca", "cb").applyInPandas(
        S._block_scorer(THRESHOLD, coarse=False),
        schema="id_a long, id_b long, dot long, n2_a long, n2_b long",
    )
    final = (
        scored.select(
            "id_a",
            "id_b",
            S.cosine(
                F.col("dot"), F.col("n2_a"), F.col("n2_b")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= THRESHOLD)
        .distinct()
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in final.select("id_a", "id_b").collect()
    }
    blocks.unpersist()
    return pairs


def part_parity(spark, host_snapshot, n: int) -> dict:
    import numpy as np

    emb = synth_corpus(spark, n).persist()
    n_total = emb.count()
    k = k_for(n_total)
    c_flat, sec_flat, mod = _fit(emb, n_total, k, "np")
    c_2l, sec_2l, _ = _fit(emb, n_total, k, "np2l")
    a, b = np.asarray(c_flat), np.asarray(c_2l)
    diff = a != b
    out = {
        "n_total": n_total,
        "k": k,
        "fit_sample_mod": mod,
        "flat_fit_sec": sec_flat,
        "twolevel_fit_sec": sec_2l,
        "fit_speedup": round(sec_flat / max(sec_2l, 1e-9), 2),
        "centroid_coords_differing": int(diff.sum()),
        "centroid_coords_total": int(diff.size),
        "centroids_differing": int(diff.any(axis=1).sum()),
        "max_abs_coord_delta": int(np.abs(a - b).max()),
    }
    print(json.dumps(out))
    # downstream: the SHIPPED blocking+scoring against both centroid
    # sets — what a fit deviation actually costs in emitted pairs
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(S._quant("embedding")).alias("qv"),
    ).localCheckpoint(eager=True)
    truth = {
        (i, n + i // DUP_EVERY) for i in range(0, n, DUP_EVERY)
    }
    p_flat = _pairs_for_cents(emb, base, c_flat, k)
    p_2l = _pairs_for_cents(emb, base, c_2l, k)
    out["pairs_flat"] = len(p_flat)
    out["pairs_twolevel"] = len(p_2l)
    out["pair_symmetric_diff"] = len(p_flat ^ p_2l)
    out["recall_flat"] = round(len(p_flat & truth) / len(truth), 4)
    out["recall_twolevel"] = round(len(p_2l & truth) / len(truth), 4)
    out["host"] = host_snapshot()
    print(json.dumps({k2: out[k2] for k2 in list(out)[-6:-1]}))
    emb.unpersist()
    return out


def part_scale(spark, host_snapshot, ns) -> dict:
    out = {"rungs": []}
    for n in ns:
        emb = synth_corpus(spark, n).persist()
        n_total = emb.count()
        k = k_for(n_total)
        _c1, sec_flat, mod = _fit(emb, n_total, k, "np")
        _c2, sec_2l, _ = _fit(emb, n_total, k, "np2l")
        rung = {
            "n_total": n_total,
            "k": k,
            "fit_sample_mod": mod,
            "flat_fit_sec": sec_flat,
            "twolevel_fit_sec": sec_2l,
            "speedup": round(sec_flat / max(sec_2l, 1e-9), 2),
            "host": host_snapshot(),
        }
        out["rungs"].append(rung)
        print(json.dumps(rung))
        emb.unpersist()
    return out


def part_e2e(spark, host_snapshot, n: int) -> dict:
    from database_join_spark.plans.sizing import TWOLEVEL_ASSIGN_MIN_K

    emb = synth_corpus(spark, n).persist()
    n_total = emb.count()
    k = k_for(n_total)
    truth = {
        (i, n + i // DUP_EVERY) for i in range(0, n, DUP_EVERY)
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
    out = {
        "n_total": n_total,
        "k": k,
        "auto_dispatch_twolevel_fit": k >= TWOLEVEL_ASSIGN_MIN_K,
        "wall_sec": wall,
        "recall_vs_planted": round(len(got & truth) / len(truth), 4),
        "emitted_pairs": len(got),
        "r13_flat_fit_record_sec": 349.0,
        "host": host_snapshot(),
    }
    print(json.dumps(out))
    emb.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="50k smoke")
    ap.add_argument("--part", default="all")
    ap.add_argument("--ns", type=str, default="1000000,2000000,4000000")
    args = ap.parse_args()

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="semdedup-fit2l")
    spark.sparkContext.setLogLevel("ERROR")

    n1 = 50_000 if args.quick else 1_000_000
    ns = (
        [10_000, 50_000]
        if args.quick
        else [int(s) for s in args.ns.split(",")]
    )

    artifact = Path(_REPO, "SEMDEDUP_FIT2L_PROBE.json")

    def flush(key: str, value) -> None:
        merged: dict = {}
        if artifact.exists():
            merged = json.loads(artifact.read_text())
        merged[key] = value
        merged["quick"] = args.quick
        merged["iterations"] = ITERS
        merged["coarse_probe"] = {
            "coarse_m": S.COARSE_PROBE_M,
            "coarse_ratio": S.COARSE_PROBE_RATIO,
        }
        artifact.write_text(json.dumps(merged, indent=1) + "\n")
        print(f"flushed part {key!r}")

    # Drain the persist pool between parts: kmeans_fit routes its
    # iteration frame through track_persist, and across 14 fits plus
    # the parity part's checkpointed bases the accumulated storage
    # OOM'd the long session's heap during the first full run's e2e
    # part (parity/scale flushed; e2e re-ran in a fresh process). At
    # full scale prefer one --part per invocation.
    import gc

    from database_join_spark.session import configure_session

    def between_parts():
        gc.collect()
        configure_session(spark)

    if args.part in ("parity", "all"):
        flush("parity", part_parity(spark, host_snapshot, n1))
        between_parts()
    if args.part in ("scale", "all"):
        flush("scale", part_scale(spark, host_snapshot, ns))
        between_parts()
    if args.part in ("e2e", "all"):
        flush("e2e", part_e2e(spark, host_snapshot, max(ns)))
    print("wrote SEMDEDUP_FIT2L_PROBE.json")


if __name__ == "__main__":
    main()
