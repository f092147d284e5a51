#!/usr/bin/env python
"""Decompose dedup_semantic's sf0.1 bench wall (4.44 s at HEAD's
quiet capture — the largest fixture row) into its phases, same
session, bench-identical noop sink.

At sf0.1 the table is 2,000 vectors with k at the k_for floor, so
the row is a FIXED-OVERHEAD measurement: per-run Spark jobs (fit
iterations, seed collect, sample-size guard, census, scorer) and
driver-side planning of the k*dim literal expression trees — not
data work. The phase split tells us which overhead to remove.

Writes SEMDEDUP_SF01_WALL_PROBE.json.
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


def _run_once(fn, spark, sf_dir: str) -> float:
    """bench.py's timed region verbatim: the query function's eager
    work (the k-means fit collects at definition time) is INSIDE the
    timer — a `_noop(fn(...))` spelling evaluates fn before the
    timer starts and under-reports by the whole fit."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from database_join_spark.operators import similarity as S
    from database_join_spark.plans.sizing import fit_sample_mod_for, k_for
    from database_join_spark.queries import load_all
    from database_join_spark.session import get_spark

    registry = load_all()
    spec = registry["dedup_semantic"]
    spark = get_spark(app_name="semdedup-sf01-wall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": SF_DIR}

    # Bench-identical end-to-end runs (1 warm-up + 7 timed, median)
    _run_once(spec.fn, spark, SF_DIR)
    runs = [_run_once(spec.fn, spark, SF_DIR) for _ in range(7)]
    out["end_to_end_sec"] = round(statistics.median(runs), 4)
    out["end_to_end_runs"] = [round(r, 4) for r in runs]

    # Phase decomposition (mirrors semdedup_pairs' body)
    from database_join_spark.queries.pipeline import (
        _COS_DUP_THRESHOLD,
        _SEMDEDUP_PROBES,
    )
    from database_join_spark.catalog import table
    from database_join_spark.plans.stats import (
        cached_statistic,
        parquet_rowcount,
        parquet_table_key,
    )
    from database_join_spark.session import configure_session, track_persist

    emb_path = f"{SF_DIR}/embeddings.parquet"
    n_vec, _ = cached_statistic(
        parquet_table_key(emb_path),
        "rowcount",
        lambda: parquet_rowcount(emb_path),
    )
    k = k_for(int(n_vec))
    mod = fit_sample_mod_for(int(n_vec), k)
    out["n_vec"] = int(n_vec)
    out["k"] = k
    out["fit_sample_mod"] = mod

    phases: dict[str, list[float]] = {}
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
        phases.setdefault("sample_guard", []).append(
            time.perf_counter() - t0
        )

        t0 = time.perf_counter()
        _a, cents, _h = S.kmeans_fit(
            fit_input, id_col="vec_id", vec_col="embedding",
            k=k, iterations=3,
        )
        phases.setdefault("fit_3iter", []).append(time.perf_counter() - t0)

        base = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        )
        t0 = time.perf_counter()
        blocks = track_persist(
            S.kmeans_assign_topm(base, cents, m=_SEMDEDUP_PROBES)
        )
        sizes = blocks.groupBy("block").agg(F.count(F.lit(1)).alias("s"))
        chunks = sizes.select(
            "block",
            F.greatest(
                F.lit(1), F.ceil(F.col("s") / S.SEMDEDUP_TARGET_CHUNK)
            ).cast("int").alias("c"),
        )
        chunked = (
            blocks.join(F.broadcast(chunks), "block")
            .withColumn(
                "ch", F.pmod(F.xxhash64("id"), F.col("c")).cast("int")
            )
            .withColumn("other", F.explode(F.expr("sequence(0, c - 1)")))
            .select(
                "block", "id", "qv", "ch",
                F.least("ch", "other").alias("ca"),
                F.greatest("ch", "other").alias("cb"),
            )
        )
        scored = chunked.groupBy("block", "ca", "cb").applyInPandas(
            S._block_scorer(_COS_DUP_THRESHOLD),
            schema="id_a long, id_b long, dot long, n2_a long, n2_b long",
        )
        final = (
            scored.select(
                "id_a", "id_b",
                S.cosine(
                    F.col("dot"), F.col("n2_a"), F.col("n2_b")
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= _COS_DUP_THRESHOLD)
            .distinct()
        )
        phases.setdefault("build_plan", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        _noop(final)
        phases.setdefault("score_noop", []).append(time.perf_counter() - t0)

    out["phases_median"] = {
        k_: round(statistics.median(v), 4) for k_, v in phases.items()
    }
    out["phases_runs"] = {
        k_: [round(x, 4) for x in v] for k_, v in phases.items()
    }
    Path(_REPO, "SEMDEDUP_SF01_WALL_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out["phases_median"]))
    print("end_to_end", out["end_to_end_sec"])
    spark.stop()


if __name__ == "__main__":
    main()
