#!/usr/bin/env python
"""Same-session A/B for the round-14 dedup_semantic changes at sf0.1.

Arm A replicates the round-13 spelling inline (separate sample-guard
count job, kmeans_fit with its returned-but-unused assign, AQE-default
scorer exchange); arm B is the SHIPPED query function (folded guard +
centroids-only fit + one-task-per-block scorer exchange). Alternating
A/B/A/B (the repo's de-biasing discipline), bench-identical timing
(query construction + noop sink inside the timer), median of 7 per
arm, pair-set equality asserted first. Writes SEMDEDUP_R14_AB_PROBE.json.
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
    spark = get_spark(app_name="semdedup-r14-ab")
    spark.sparkContext.setLogLevel("ERROR")

    emb_path = f"{SF_DIR}/embeddings.parquet"
    n_vec, _ = cached_statistic(
        parquet_table_key(emb_path),
        "rowcount",
        lambda: parquet_rowcount(emb_path),
    )
    k = k_for(int(n_vec))
    mod = fit_sample_mod_for(int(n_vec), k)

    def old_frame():
        """The round-13 spelling, inline: guard count job + full
        kmeans_fit (assign constructed, discarded) + n_hint fast
        path + AQE-default scorer exchange."""
        configure_session(spark)
        emb = table(spark, SF_DIR, "embeddings")
        fit_input = emb
        if mod is not None and mod > 1:
            fit_input = emb.filter(
                F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0
            )
            if fit_input.limit(k).count() < k:
                fit_input = emb
        _a, cents, _h = S.kmeans_fit(
            fit_input,
            id_col="vec_id",
            vec_col="embedding",
            k=k,
            iterations=3,
        )
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        )
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
        scored = chunked.groupBy("block", "ca", "cb").applyInPandas(
            S._block_scorer(_COS_DUP_THRESHOLD),
            schema="id_a long, id_b long, dot long, n2_a long, n2_b long",
        )
        return (
            scored.select(
                "id_a",
                "id_b",
                S.cosine(
                    F.col("dot"), F.col("n2_a"), F.col("n2_b")
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= _COS_DUP_THRESHOLD)
            .distinct()
        )

    def new_frame():
        configure_session(spark)
        return spec.fn(spark, SF_DIR)

    # pair-set identity first (also warms both plans)
    a_rows = sorted(map(tuple, old_frame().collect()))
    b_rows = sorted(map(tuple, new_frame().collect()))
    assert a_rows == b_rows, "round-14 changes moved the pair set"

    def run(mk) -> float:
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(old_frame)
    run(new_frame)
    runs: dict[str, list[float]] = {"old_r13": [], "new_r14": []}
    for _ in range(7):
        runs["old_r13"].append(run(old_frame))
        runs["new_r14"].append(run(new_frame))

    out = {
        "sf_dir": SF_DIR,
        "n_vec": int(n_vec),
        "k": k,
        "fit_sample_mod": mod,
        "pairs": len(a_rows),
        "pair_set_identical": True,
        "median_old_sec": round(statistics.median(runs["old_r13"]), 4),
        "median_new_sec": round(statistics.median(runs["new_r14"]), 4),
        "runs": {
            a: [round(x, 4) for x in v] for a, v in runs.items()
        },
    }
    out["speedup"] = round(
        out["median_old_sec"] / out["median_new_sec"], 3
    )
    Path(_REPO, "SEMDEDUP_R14_AB_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
