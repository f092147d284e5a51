"""Same-session A/B of the stored-IVF index layout: fragmented
(naive partitionBy from a many-task frame) vs aligned
(write_partitioned_aligned, one file per cell) vs aligned+persisted,
at 1M vectors / 200 queries / n_probe=8 — the full-cell-coverage
regime where ANN_PROBE's stored-IVF arm loses to the inline arm.

Why this exists: the r08 aligned-write fix was motivated by the ~2k
fragment files the naive write produced, but the cross-capture
ANN_PROBE re-run landed on a drifted (slower) host and could not say
how much the file count itself mattered. This probe holds the
session, corpus, centroids, and query set fixed and varies ONLY the
stored layout, so the file-count component is isolated from both
host drift and the KMeans fit. Writes IVF_LAYOUT_PROBE.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from database_join_spark.operators import similarity as S  # noqa: E402
from database_join_spark.operators.bucketing import (  # noqa: E402
    write_partitioned_aligned,
)
from database_join_spark.session import get_spark  # noqa: E402

from ann_probe import CLUSTERS, K, synth_vectors  # noqa: E402

N = 1_000_000
N_QUERIES = 200
REPS = 3


def main() -> None:
    spark = get_spark(app_name="ivf-layout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_vectors(spark, N).persist()
    corpus.count()
    queries = corpus.orderBy("vec_id").limit(N_QUERIES).persist()
    queries.count()

    ivf_corpus, cents = S.ivf_index(corpus, n_centroids=CLUSTERS)

    import shutil
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="ivf_layout_")
    out: dict = {
        "vectors": N,
        "queries": N_QUERIES,
        "k": K,
        "n_probe": 8,
        "protocol": (
            "one session, one corpus, one KMeans fit; only the stored "
            f"layout varies; {REPS} timed runs per arm, min reported"
        ),
    }
    try:
        # fragmented: the pre-r08 spelling (writer tasks × cells files)
        t0 = time.perf_counter()
        ivf_corpus.write.partitionBy("cell").mode("overwrite").parquet(
            f"{idx_dir}/frag"
        )
        frag_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        write_partitioned_aligned(ivf_corpus, f"{idx_dir}/aligned", ["cell"])
        aligned_build = time.perf_counter() - t0
        # salted: ~8 files/cell ≈ 512 files — tests whether a
        # CONTROLLED multi-file-per-value layout recovers whatever
        # the fragmented layout's extra splits buy (measured answer:
        # no — see the artifact's reading / diagnostic)
        t0 = time.perf_counter()
        write_partitioned_aligned(
            ivf_corpus, f"{idx_dir}/salted", ["cell"], files_per_value=8
        )
        salted_build = time.perf_counter() - t0

        def files(sub: str) -> int:
            import glob

            return len(glob.glob(f"{idx_dir}/{sub}/cell=*/part-*"))

        def run_once(index_df) -> float:
            t0 = time.perf_counter()
            rows = S.ivf_topk(
                None, queries, k=K, n_probe=8, index=(index_df, cents)
            ).collect()
            assert len(rows) > 0
            return round(time.perf_counter() - t0, 2)

        def run(index_df) -> list[float]:
            return [run_once(index_df) for _ in range(REPS)]

        arms = {}
        frag_df = spark.read.parquet(f"{idx_dir}/frag")
        aligned_df = spark.read.parquet(f"{idx_dir}/aligned")
        salted_df = spark.read.parquet(f"{idx_dir}/salted")
        # interleave arms so slow drift hits all equally
        frag_runs: list[float] = []
        aligned_runs: list[float] = []
        salted_runs: list[float] = []
        for _ in range(REPS):
            frag_runs.append(run_once(frag_df))
            aligned_runs.append(run_once(aligned_df))
            salted_runs.append(run_once(salted_df))
        arms["fragmented"] = {
            "files": files("frag"),
            "build_sec": round(frag_build, 2),
            "runs": frag_runs,
            "sec": min(frag_runs),
        }
        arms["aligned"] = {
            "files": files("aligned"),
            "build_sec": round(aligned_build, 2),
            "runs": aligned_runs,
            "sec": min(aligned_runs),
        }
        arms["salted_x8"] = {
            "files": files("salted"),
            "build_sec": round(salted_build, 2),
            "runs": salted_runs,
            "sec": min(salted_runs),
        }
        # the high-coverage alternative: persist the stored corpus
        cached_df = salted_df.persist()
        cached_df.count()
        cached_runs = run(cached_df)
        arms["salted_x8_persisted"] = {
            "files": files("salted"),
            "runs": cached_runs,
            "sec": min(cached_runs),
        }
        cached_df.unpersist()
        # reference point in the same session: the inline arm
        t0 = time.perf_counter()
        S.ivf_topk(
            corpus, queries, k=K, n_centroids=CLUSTERS, n_probe=8
        ).collect()
        out["inline_sec"] = round(time.perf_counter() - t0, 2)
        out["arms"] = arms
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus.unpersist()
        queries.unpersist()

    print(json.dumps(out))
    Path(__file__).resolve().parent.parent.joinpath(
        "IVF_LAYOUT_PROBE.json"
    ).write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
