#!/usr/bin/env python
"""Scaling probe for the similarity-search family (round 6): the last
pipeline family without scale evidence (dedup, decontam, and
ExactSubstr each have one — scale_probe / decontam_probe /
substr_probe). Runs the exact operator code from
``operators/similarity.py`` — ``brute_force_topk`` (exact baseline),
``lsh_topk`` (multi-table hyperplane ANN), ``ivf_topk`` (KMeans
inverted-file ANN) — on synthetic clustered 64-dim corpora of
increasing size with a fixed 20-query set.

Claims under test:
  * brute force is O(|corpus|·|queries|) — the linear-in-corpus
    baseline the ANN paths must beat while holding recall;
  * both ANN paths restrict exact rescoring to candidate mass
    (bucket collisions / probed cells), so their cost grows with the
    collision mass, not the corpus×query product;
  * recall@10 vs the exact baseline holds at 1M vectors (the pytest
    floors are fixture-scale only).

Corpus: 64 seeded cluster directions (driver-side literals, same
discipline as the LSH hyperplanes); vector = unit-ish center + per-
coordinate hash noise. Queries = 20 corpus members (self-match
excluded by the operators). Ground truth = brute_force_topk on the
same frame.

Usage: python scripts/ann_probe.py [sizes...] (default 100k 300k 1M)
Writes ANN_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark.operators import similarity as S  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402

DIM = 64
CLUSTERS = 64
N_QUERIES = 20
K = 10
NOISE = 0.25


def synth_vectors(spark, n: int):
    """n deterministic clustered vectors: cluster = id % CLUSTERS,
    v[i] = center[cluster][i] + noise(id, i). Centers are seeded
    driver-side literals; noise is hash-derived per coordinate."""
    centers = []
    for c in range(CLUSTERS):
        rng = random.Random(1000 + c)
        centers.append([rng.uniform(-1.0, 1.0) for _ in range(DIM)])
    lit = ", ".join(
        "array(" + ", ".join(f"{x:.6f}D" for x in row) + ")"
        for row in centers
    )
    vec = (
        f"transform(sequence(0, {DIM - 1}), i -> CAST("
        f"element_at(array({lit}), CAST(id % {CLUSTERS} AS INT) + 1)[i]"
        f" + (pmod(xxhash64(id, i), 1000) / 1000.0 - 0.5) * {NOISE}"
        f" AS FLOAT))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def recall_at_k(got, truth) -> float:
    """Fraction of the exact top-k pairs the ANN result recovered."""
    t = {(r["query_id"], r["neighbor_id"]) for r in truth}
    g = {(r["query_id"], r["neighbor_id"]) for r in got}
    return len(t & g) / len(t)


def probe_size(spark, n: int, n_queries: int = N_QUERIES) -> dict:
    corpus = synth_vectors(spark, n).persist()
    corpus.count()  # materialize so every arm pays scoring, not gen
    step = n // n_queries
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(n_queries)

    t0 = time.perf_counter()
    truth = S.brute_force_topk(corpus, queries, k=K).collect()
    bf_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    lsh = S.lsh_topk(corpus, queries, k=K, bits=8, tables=8, dim=DIM).collect()
    lsh_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    ivf = S.ivf_topk(
        corpus, queries, k=K, n_centroids=CLUSTERS, n_probe=8
    ).collect()
    ivf_sec = time.perf_counter() - t0

    # ---- stored-index arms (VERDICT r06 #8 / r07 #6): materialize
    # the corpus-side state as parquet tables — the operators' own
    # documented 100 TB posture — then query against the STORED
    # state. This is the regime where the per-corpus pass (signatures
    # / KMeans fit+assign+norms) is built once and amortized across
    # query batches, so ANN should beat brute force even at 20
    # queries; the uncached arms above re-pay it per run.
    spark = corpus.sparkSession
    import shutil
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix=f"ann_index_{n}_")
    try:
        t0 = time.perf_counter()
        S.lsh_corpus_buckets(corpus, bits=8, tables=8, dim=DIM).write.mode(
            "overwrite"
        ).parquet(f"{idx_dir}/lsh")
        lsh_build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        lsh_c = S.lsh_topk(
            corpus,
            queries,
            k=K,
            bits=8,
            tables=8,
            dim=DIM,
            corpus_buckets=spark.read.parquet(f"{idx_dir}/lsh"),
        ).collect()
        lsh_cached_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        ivf_corpus, cents = S.ivf_index(corpus, n_centroids=CLUSTERS)
        # cell as partition column: each probe is a pruned scan. The
        # natural (per-writer-task) layout is kept DELIBERATELY:
        # IVF_LAYOUT_PROBE.json A/B'd it against 1-file-per-cell and
        # salted-aligned layouts same-session and the natural write
        # was the fastest stored layout for this compute-heavy
        # consumer (its extra scan splits parallelize the scoring
        # stage); alignment only wins scan-dominated consumers.
        ivf_corpus.write.partitionBy("cell").mode("overwrite").parquet(
            f"{idx_dir}/ivf"
        )
        Path(idx_dir, "ivf_centroids.json").write_text(json.dumps(cents))
        ivf_build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        stored_cents = [
            (int(c), [float(x) for x in v])
            for c, v in json.loads(
                Path(idx_dir, "ivf_centroids.json").read_text()
            )
        ]
        ivf_c = S.ivf_topk(
            None,
            queries,
            k=K,
            n_probe=8,
            index=(spark.read.parquet(f"{idx_dir}/ivf"), stored_cents),
        ).collect()
        ivf_cached_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    corpus.unpersist()
    return {
        "vectors": n,
        "queries": n_queries,
        "k": K,
        "brute_sec": round(bf_sec, 2),
        "brute_pairs_per_sec": round(n * n_queries / bf_sec),
        "lsh_sec": round(lsh_sec, 2),
        "lsh_recall": round(recall_at_k(lsh, truth), 4),
        "lsh_speedup": round(bf_sec / lsh_sec, 2),
        "ivf_sec": round(ivf_sec, 2),
        "ivf_recall": round(recall_at_k(ivf, truth), 4),
        "ivf_speedup": round(bf_sec / ivf_sec, 2),
        "lsh_index_build_sec": round(lsh_build_sec, 2),
        "lsh_cached_sec": round(lsh_cached_sec, 2),
        "lsh_cached_recall": round(recall_at_k(lsh_c, truth), 4),
        "lsh_cached_speedup": round(bf_sec / lsh_cached_sec, 2),
        "ivf_index_build_sec": round(ivf_build_sec, 2),
        "ivf_cached_sec": round(ivf_cached_sec, 2),
        "ivf_cached_recall": round(recall_at_k(ivf_c, truth), 4),
        "ivf_cached_speedup": round(bf_sec / ivf_cached_sec, 2),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    spark = get_spark(app_name="ann-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_size(spark, 5_000)  # JIT/codegen + spark.ml warm-up
    results = []
    for n in sizes:
        r = probe_size(spark, n)
        results.append(r)
        print(
            f"# {n} vecs: brute {r['brute_sec']} s | "
            f"lsh {r['lsh_sec']} s recall {r['lsh_recall']} "
            f"({r['lsh_speedup']}x) | ivf {r['ivf_sec']} s "
            f"recall {r['ivf_recall']} ({r['ivf_speedup']}x)",
            file=sys.stderr,
        )
    # query-scaling point: ANN amortizes its one-per-corpus pass
    # (signatures / cell assignment) across queries, so the speedup
    # axis is |queries|, not just |corpus| — measure 10x queries at
    # the largest size.
    qs = probe_size(spark, sizes[-1], n_queries=10 * N_QUERIES)
    print(
        f"# {sizes[-1]} vecs x {qs['queries']} queries: "
        f"brute {qs['brute_sec']} s | lsh {qs['lsh_sec']} s "
        f"recall {qs['lsh_recall']} ({qs['lsh_speedup']}x) | "
        f"ivf {qs['ivf_sec']} s recall {qs['ivf_recall']} "
        f"({qs['ivf_speedup']}x)",
        file=sys.stderr,
    )

    payload = {
        "dim": DIM,
        "clusters": CLUSTERS,
        "noise": NOISE,
        "lsh": {"bits": 8, "tables": 8},
        "ivf": {"n_centroids": CLUSTERS, "n_probe": 8},
        "points": results,
        "query_scaling": qs,
    }
    Path(_REPO, "ANN_PROBE.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
