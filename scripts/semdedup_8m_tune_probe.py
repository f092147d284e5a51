#!/usr/bin/env python
"""The 8M SemDeDup rung, re-measured and Arrow-batch-tuned (round 14,
VERDICT r13 #3).

Round 13 mapped a "memory cliff" at 8M: the FLAT n×k assign blew to
904.5 s while the two-level path read 45.9 s, and the END-TO-END
shipped operator read 542 s = 2.59× the 4M steady state's 209.5 s.
The verdict asked whether Arrow batch sizing (the per-worker input
batch the mapInPandas assign materializes) moves the shipped
two-level path's 8M wall back onto the ≤4M cost curve.

The cost model: the two-level assign does n·(kc + mc·k/kc) int64
distance work — at k=k_for(n) that is Θ(n·√n), so the HONEST curve
prediction for 2× corpus is 2·√2 ≈ 2.83×, not 2×. This probe:

* re-runs the shipped assign at 8M under arrow.maxRecordsPerBatch ∈
  {10000 (default), 2500, 40000}, same fitted centroids, emitted
  rowcount asserted identical across arms;
* records host/memory snapshots per arm (spill thrash shows as
  page-cache churn + wall, not as a Spark metric at local scale);
* re-measures the two-level-vs-flat deviation bound at 1M (the
  committed 2e-6 contract) — the 8M flat arm (904 s of dead code at
  this k: auto dispatch is two-level) is NOT re-run;
* re-runs the shipped end-to-end at 8M with the best batch size:
  recall vs planted must be 1.0.

Usage: python scripts/semdedup_8m_tune_probe.py [--n 8000000]
Writes SEMDEDUP_8M_TUNE_PROBE.json.
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
from scripts.semdedup_twolevel_probe import (  # noqa: E402
    DUP_EVERY,
    ITERS,
    M,
    RATIO,
    THRESHOLD,
    _fit,
    synth_corpus,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--batches", default="10000,2500,40000")
    ap.add_argument("--skip-deviation", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="semdedup-8m-tune")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": args.n, "host_start": host_snapshot()}

    # ---- deviation bound re-measure at 1M (flat vs two-level)
    if not args.skip_deviation:
        emb1 = synth_corpus(spark, 1_000_000).persist()
        n1 = emb1.count()
        k1 = k_for(n1)
        cents1, fit_sec, mod1 = _fit(emb1, n1, k1)
        base1 = emb1.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        ).localCheckpoint(eager=True)
        flat = (
            S.kmeans_assign_topm(base1, cents1, m=M, ratio=RATIO, impl="np")
            .select("id", "block")
            .localCheckpoint(eager=True)
        )
        two = (
            S.kmeans_assign_topm(
                base1, cents1, m=M, ratio=RATIO, impl="np2l"
            )
            .select("id", "block")
            .localCheckpoint(eager=True)
        )
        only_flat = flat.exceptAll(two).count()
        only_two = two.exceptAll(flat).count()
        fr = flat.count()
        out["deviation_1m"] = {
            "n_total": n1,
            "k": k1,
            "fit_sec": fit_sec,
            "flat_rows": fr,
            "only_flat": only_flat,
            "only_twolevel": only_two,
            "deviation_frac": round((only_flat + only_two) / fr, 8),
        }
        print(json.dumps(out["deviation_1m"]))
        emb1.unpersist()

    # ---- 8M rung: shipped two-level assign under batch-size arms
    emb = synth_corpus(spark, args.n).persist()
    n_total = emb.count()
    k = k_for(n_total)
    cents, fit_sec, mod = _fit(emb, n_total, k)
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(S._quant("embedding")).alias("qv"),
    ).localCheckpoint(eager=True)
    out["rung"] = {
        "n_total": n_total,
        "k": k,
        "fit_sample_mod": mod,
        "fit_sec": fit_sec,
        "arms": [],
    }
    rows_ref = None
    for batch in [int(b) for b in args.batches.split(",")]:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
        )
        t0 = time.monotonic()
        rows = (
            S.kmeans_assign_topm(base, cents, m=M, ratio=RATIO, impl="np2l")
            .select(F.count(F.lit(1)))
            .collect()[0][0]
        )
        arm = {
            "maxRecordsPerBatch": batch,
            "assign_sec": round(time.monotonic() - t0, 2),
            "emitted_rows": rows,
            "host": host_snapshot(),
        }
        rows_ref = rows_ref or rows
        assert rows == rows_ref, (batch, rows, rows_ref)
        out["rung"]["arms"].append(arm)
        print(json.dumps({k_: arm[k_] for k_ in list(arm)[:3]}))
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )

    # ---- end-to-end shipped operator at 8M (default batch size)
    if not args.skip_e2e:
        truth = {
            (b, args.n + b // DUP_EVERY)
            for b in range(0, args.n, DUP_EVERY)
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
                # catalog hints, as the registry query passes them:
                # engages the round-14 memory-adaptive persist skip
                # (the first run of this probe OOM'd the 8 g heap on
                # the ~17 GB blocks cache without them)
                n_hint=n_total,
                dim_hint=64,
            ).collect()
        }
        out["end_to_end_8m"] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "recall_vs_planted": round(len(got & truth) / len(truth), 4),
            "emitted_pairs": len(got),
            "host": host_snapshot(),
        }
        print(json.dumps(out["end_to_end_8m"]))
    emb.unpersist()
    out["host_end"] = host_snapshot()
    Path(_REPO, "SEMDEDUP_8M_TUNE_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
