#!/usr/bin/env python
"""Scaling probe for the exact-integer k-means operator (round 6):
topic_kmeans is the registry's only iterative fit, and its pytest
evidence is fixture-scale (500 vectors). Runs the exact operator code
(``operators/similarity.kmeans_fit``) on synthetic clustered 64-dim
corpora of increasing size.

Claims under test:
  * per-iteration cost is ONE literal-centroid map stage plus one
    k·dim-bounded aggregation → runtime grows linearly with corpus
    size (vectors/s per iteration roughly flat across 100k→1M);
  * driver state is k·dim centroid stats only — the collect() per
    iteration returns exactly k·dim rows regardless of corpus size;
  * the fit recovers planted structure: k=10 over 10 planted
    clusters with min-id seeding (ids 0..9 are one member of each
    planted cluster) → majority-label purity ≈ 1.0;
  * bit-determinism at scale: two fits of the same corpus produce
    identical assignment checksums (the exact-int64 design claim,
    which a float k-means cannot make under parallel summation).

Corpus: same synthesis discipline as ann_probe.py — 10 seeded
cluster directions as driver-side literals, per-coordinate hash
noise, cluster = id % 10.

Usage: python scripts/kmeans_probe.py [sizes...] (default 100k 300k 1M)
Writes KMEANS_PROBE.json at the repo root.
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
K = 10
ITERS = 3
NOISE = 0.25


def synth_vectors(spark, n: int):
    """n deterministic clustered vectors, planted cluster = id % K."""
    centers = []
    for c in range(K):
        rng = random.Random(2000 + c)
        centers.append([rng.uniform(-1.0, 1.0) for _ in range(DIM)])
    lit = ", ".join(
        "array(" + ", ".join(f"{x:.6f}D" for x in row) + ")"
        for row in centers
    )
    vec = (
        f"transform(sequence(0, {DIM - 1}), i -> CAST("
        f"element_at(array({lit}), CAST(id % {K} AS INT) + 1)[i]"
        f" + (pmod(xxhash64(id, i), 1000) / 1000.0 - 0.5) * {NOISE}"
        f" AS FLOAT))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def checksum(assigned) -> int:
    """Order-independent exact checksum of the full assignment."""
    return int(
        assigned.agg(
            F.sum(
                (F.col("cluster").cast("long") * (F.col("id") + 1))
                .cast("decimal(38,0)")
            )
        ).collect()[0][0]
    )


def purity(assigned, n: int) -> float:
    """Fraction of vectors whose fitted cluster's majority planted
    label is their own planted label (planted = id % K)."""
    counts = (
        assigned.groupBy(
            "cluster", (F.col("id") % K).alias("planted")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best: dict[int, int] = {}
    for r in counts:
        best[r.cluster] = max(best.get(r.cluster, 0), r.n)
    return sum(best.values()) / n


def main(sizes: list[int]) -> None:
    spark = get_spark(app_name="kmeans-probe")
    out: dict = {"dim": DIM, "k": K, "iterations": ITERS, "points": []}
    for n in sizes:
        vecs = synth_vectors(spark, n).persist()
        vecs.count()  # materialize so the fit times the fit
        t0 = time.monotonic()
        assigned, cents, hist = S.kmeans_fit(
            vecs, k=K, iterations=ITERS, track_inertia=True
        )
        assigned = assigned.persist()
        assigned.count()
        fit_sec = round(time.monotonic() - t0, 4)
        per_iter = round(fit_sec / ITERS, 4)
        point = {
            "n": n,
            "fit_sec": fit_sec,
            "sec_per_iteration": per_iter,
            "vectors_per_sec_per_iteration": round(n / per_iter),
            "driver_state_rows": K * DIM,
            "inertia_history": hist,
            "inertia_monotone": all(
                a >= b for a, b in zip(hist, hist[1:])
            ),
            "purity": round(purity(assigned, n), 4),
        }
        if n == sizes[0]:
            # determinism: refit the smallest size and compare
            c1 = checksum(assigned)
            assigned2, _, _ = S.kmeans_fit(
                vecs, k=K, iterations=ITERS
            )
            point["checksum_match"] = checksum(assigned2) == c1
        assigned.unpersist()
        vecs.unpersist()
        out["points"].append(point)
        print(json.dumps(point))
    Path(_REPO, "KMEANS_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote KMEANS_PROBE.json")


if __name__ == "__main__":
    sizes = [int(float(s)) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    main(sizes)
