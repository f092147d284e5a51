#!/usr/bin/env python
"""Round-14 decomposition of dedup_semantic's residual sf0.1 wall.

Round 13 left the row at ~1.3 s quiet (from 4.44), naming the
remaining composition only coarsely: "~0.5 s scorer shuffle +
applyInPandas round trip + distinct, ~0.3 s plan/analysis of the
literal assign tree" (OPTIMIZATION_r13 Not-yet #1). Before touching
anything (guide §1), split it finely, mirroring the CURRENT n_hint
no-chunk fast path:

  guard        sample-size guard count job (semdedup_pairs entry)
  fit          kmeans_fit (driver Lloyd: head + collect + numpy loop
               + construction of the returned-but-unused assign)
  build        construction/analysis of chunked + scorer + final
  x_assign     noop(chunked)       — assign+explode exec, no exchange
  x_scored     noop(scored)        — + groupBy exchange + applyInPandas
  x_nodist     noop(final sans distinct) — + cosine filter
  x_full       noop(final)         — + distinct exchange

Each exec phase runs on a freshly built plan per repeat (so analysis
is NOT amortized away for the build row, but x_* phases reuse the
same built frame so they time execution + AQE planning, not Catalyst
analysis). Writes SEMDEDUP_R14_PHASE_PROBE.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from database_join_spark.catalog import table
    from database_join_spark.operators import similarity as S
    from database_join_spark.plans.sizing import fit_sample_mod_for, k_for
    from database_join_spark.plans.stats import (
        cached_statistic,
        parquet_rowcount,
        parquet_table_key,
    )
    from database_join_spark.queries import load_all
    from database_join_spark.queries.pipeline import (
        _COS_DUP_THRESHOLD,
        _SEMDEDUP_PROBES,
    )
    from database_join_spark.session import configure_session, get_spark

    registry = load_all()
    spec = registry["dedup_semantic"]
    spark = get_spark(app_name="semdedup-r14-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": SF_DIR}

    # Bench-identical end-to-end runs (1 warm-up + 7 timed, median)
    t0 = time.perf_counter()
    spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out["warmup_sec"] = round(time.perf_counter() - t0, 4)
    runs = []
    for _ in range(7):
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(time.perf_counter() - t0)
    out["end_to_end_sec"] = round(statistics.median(runs), 4)
    out["end_to_end_runs"] = [round(r, 4) for r in runs]

    emb_path = f"{SF_DIR}/embeddings.parquet"
    n_vec, _ = cached_statistic(
        parquet_table_key(emb_path),
        "rowcount",
        lambda: parquet_rowcount(emb_path),
    )
    k = k_for(int(n_vec))
    mod = fit_sample_mod_for(int(n_vec), k)
    out.update(n_vec=int(n_vec), k=k, fit_sample_mod=mod)

    phases: dict[str, list[float]] = {}

    def rec(name: str, sec: float) -> None:
        phases.setdefault(name, []).append(sec)

    for _ in range(5):
        configure_session(spark)
        emb = table(spark, SF_DIR, "embeddings")

        t0 = time.perf_counter()
        fit_input = emb
        if mod is not None and mod > 1:
            fit_input = emb.filter(
                F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0
            )
            if fit_input.limit(k).count() < k:
                fit_input = emb
        rec("guard", time.perf_counter() - t0)

        t0 = time.perf_counter()
        _a, cents, _h = S.kmeans_fit(
            fit_input,
            id_col="vec_id",
            vec_col="embedding",
            k=k,
            iterations=3,
        )
        rec("fit", time.perf_counter() - t0)

        t0 = time.perf_counter()
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        )
        # n_hint fast path (the shipped spelling at sf0.1)
        chunked = S.kmeans_assign_topm(
            base, cents, m=_SEMDEDUP_PROBES
        ).select(
            "block",
            "id",
            "qv",
            F.lit(0).alias("ch"),
            F.lit(0).alias("ca"),
            F.lit(0).alias("cb"),
        )
        rec("build_assign", time.perf_counter() - t0)
        t0 = time.perf_counter()
        scored = chunked.groupBy("block", "ca", "cb").applyInPandas(
            S._block_scorer(_COS_DUP_THRESHOLD),
            schema="id_a long, id_b long, dot long, n2_a long, n2_b long",
        )
        nodist = scored.select(
            "id_a",
            "id_b",
            S.cosine(F.col("dot"), F.col("n2_a"), F.col("n2_b")).alias(
                "cos_sim"
            ),
        ).filter(F.col("cos_sim") >= _COS_DUP_THRESHOLD)
        final = nodist.distinct()
        rec("build_rest", time.perf_counter() - t0)

        rec("x_assign", _noop(chunked))
        rec("x_scored", _noop(scored))
        rec("x_nodist", _noop(nodist))
        rec("x_full", _noop(final))

    out["phases_median"] = {
        k_: round(statistics.median(v), 4) for k_, v in phases.items()
    }
    out["phases_runs"] = {
        k_: [round(x, 4) for x in v] for k_, v in phases.items()
    }
    Path(_REPO, "SEMDEDUP_R14_PHASE_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out["phases_median"]))
    print("end_to_end", out["end_to_end_sec"])
    spark.stop()


if __name__ == "__main__":
    main()
