#!/usr/bin/env python
"""SemDeDup scaling probe (round 7, VERDICT r06 #6): the registry's
``dedup_semantic`` is validated at fixture scale (500 vectors); this
runs the exact operator code (``operators/similarity.semdedup_pairs``)
on synthetic corpora with PLANTED near-duplicate pairs at 100k→1M
vectors, k scaled with n (the SemDeDup recipe: cluster count grows
with the corpus so per-cluster pair cost stays bounded).

Claims under test:
  * recall vs the planted ground truth, per probe width m — m is the
    recall/cost knob: m=1 is the broken single-assignment spelling
    the r06 VERDICT flagged (boundary-straddling pairs lost), the
    shipped m pins recall 1.0 on the fixtures; here both are
    MEASURED at volume;
  * blocking economics: Σ|block|² candidate pairs vs the n²/2
    all-pairs count and the n²·m²/2k uniform-cluster model —
    the number that makes the recipe linear-ish at corpus scale;
  * pairs/s end-to-end (fit + blocking + pair scoring).

Corpus: n base vectors spread over BROAD domain structure (50 domain
directions at half scale + wide per-coordinate hash noise, so
same-domain background cosine sits ~0.5, far under the 0.9 dup
threshold), plus one planted twin per DUP_EVERY-th vector — the twin
is the base vector under a small deterministic perturbation
(cos ≳ 0.997). Ground truth = the planted (id, twin) set; recall is
counted against it. Emitted pairs all carry their true quantized
cosine, so precision-against-threshold is exact by construction and
is spot-asserted on a sample.

Usage: python scripts/semdedup_probe.py [sizes...] (default 100k 300k 1M)
Writes SEMDEDUP_PROBE.json at the repo root.
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
DOMAINS = 50
#: domain direction scale vs unit noise — puts same-domain background
#: cosine near 0.5 (|c|²≈5.3 vs |noise|²≈5.3), far from the threshold
CENTER_SCALE = 0.5
ITERS = 3
THRESHOLD = 0.9
DUP_EVERY = 100
#: the twin's per-coordinate perturbation (±0.025) — cos ≳ 0.997
TWIN_NOISE = 0.05
#: k ∝ n (the SemDeDup recipe); 10k vectors per cluster
VECTORS_PER_CLUSTER = 10_000
#: m=1 (the r06-flagged single-assignment spelling) vs m=4 (the
#: shipped width) — the two arms VERDICT r07 #1 asks for; the full
#: m-recall curve is measured at fixture scale (_SEMDEDUP_PROBES,
#: queries/pipeline.py).
PROBE_MS = (1, 4)
#: Adaptive arms (round 9, VERDICT r08 #6): distance-ratio probing
#: (cap, ratio) — probe centroid j only when d²_j ≤ r·d²_nearest.
#: Fixed m=4 pays 17.5× the m=1 candidate mass at 1M to recover 173
#: boundary twins; the ratio rule should keep recall 1.0 while only
#: boundary-straddling vectors fan out.
PROBE_ADAPTIVE = ((4, 1.5), (4, 2.0), (4, 3.0))


def synth_corpus(spark, n: int):
    """n base vectors + one planted twin per DUP_EVERY-th id.

    Twins get ids n..n+n/DUP_EVERY-1; twin of base id b has id
    n + b//DUP_EVERY. All deterministic (seeded driver literals +
    per-coordinate xxhash64 noise) — no RNG at execution time.
    """
    # Domain centers ride in as a 50-row BROADCAST JOIN, not a
    # 50×64-literal array indexed per element: higher-order
    # transforms run interpreted, and `element_at(array(<3200
    # literals>), dom)[i]` re-evaluated the whole CreateArray for
    # every element of every row — thread dumps pinned the entire
    # round-13 4M synth (45+ min) inside that interpreted eval. The
    # join binds each row's center ONCE; per-element work drops to
    # an array index + hash + IEEE double ops. Values are
    # bit-identical to the old literal spelling: centers round
    # through the same 6-decimal string the literals printed, and
    # the noise divides by DOUBLE literals (the D suffix — an
    # un-suffixed 1000.0 parses as DECIMAL(5,1) and drags the eval
    # onto BigDecimal).
    centers = []
    for c in range(DOMAINS):
        rng = random.Random(7000 + c)
        centers.append(
            [
                float(f"{x:.6f}")
                for x in (
                    rng.uniform(-CENTER_SCALE, CENTER_SCALE)
                    for _ in range(DIM)
                )
            ]
        )
    centers_df = spark.createDataFrame(
        [(c, centers[c]) for c in range(DOMAINS)],
        "dom int, center array<double>",
    )
    base_expr = (
        f"transform(sequence(0, {DIM - 1}), i -> center[i]"
        f" + (pmod(xxhash64(base_id, i), 1000) / 1000.0D - 0.5D))"
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"), F.col("id").alias("base_id")
    )
    twins = (
        spark.range(0, n, DUP_EVERY)
        .select(
            (F.lit(n) + F.col("id") / DUP_EVERY)
            .cast("long")
            .alias("vec_id"),
            F.col("id").alias("base_id"),
        )
    )
    both = (
        base.unionByName(twins)
        .join(
            F.broadcast(centers_df),
            F.pmod("base_id", F.lit(DOMAINS)).cast("int")
            == F.col("dom"),
        )
        .withColumn("b", F.expr(base_expr))
    )
    # twin = base + deterministic ±TWIN_NOISE/2 per coordinate
    vec = (
        f"transform(sequence(0, {DIM - 1}), i -> CAST(b[i] + "
        f"IF(vec_id >= {n}, (pmod(xxhash64(vec_id, i, 99), 1000) "
        f"/ 1000.0D - 0.5D) * {TWIN_NOISE}D, 0.0D) AS FLOAT))"
    )
    return both.select(
        "vec_id", F.expr(vec).alias("embedding")
    )


def main(sizes: list[int]) -> None:
    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "dim": DIM,
        "threshold": THRESHOLD,
        "iterations": ITERS,
        "vectors_per_cluster": VECTORS_PER_CLUSTER,
        "dup_every": DUP_EVERY,
        "host_start": host_snapshot(),
        "points": [],
    }
    for n in sizes:
        k = max(10, n // VECTORS_PER_CLUSTER)
        n_twins = n // DUP_EVERY
        truth = {(b, n + b // DUP_EVERY) for b in range(0, n, DUP_EVERY)}
        vecs = synth_corpus(spark, n).persist()
        total = vecs.count()  # materialize so the probe times the op
        point: dict = {
            "n_base": n,
            "n_total": total,
            "k": k,
            "host": host_snapshot(),
            "ms": {},
        }

        # blocking economics per m: Σ|block|² /2 candidate pairs
        _a, cents, _h = S.kmeans_fit(vecs, k=k, iterations=ITERS)
        base = vecs.select(
            F.col("vec_id").alias("id"),
            F.expr(S._quant("embedding")).alias("qv"),
        )
        for m in PROBE_MS:
            t0 = time.monotonic()
            got = {
                (r["id_a"], r["id_b"])
                for r in S.semdedup_pairs(
                    vecs, k=k, iterations=ITERS, m=m, threshold=THRESHOLD
                ).collect()
            }
            sec = round(time.monotonic() - t0, 2)
            sizes_m = (
                S.kmeans_assign_topm(base, cents, m=m)
                .groupBy("block")
                .count()
                .agg(
                    F.sum(
                        (F.col("count") * (F.col("count") - 1) / 2)
                    ).alias("p")
                )
                .collect()[0]["p"]
            )
            hit = len(got & truth)
            point["ms"][m] = {
                "sec_end_to_end": sec,
                "recall_vs_planted": round(hit / n_twins, 4),
                "planted_pairs": n_twins,
                "emitted_pairs": len(got),
                "candidate_pairs": int(sizes_m),
                "all_pairs": total * (total - 1) // 2,
                "uniform_model_pairs": int(
                    total * total * m * m / (2 * k)
                ),
                "pairs_per_sec": round(int(sizes_m) / sec),
            }
            print(json.dumps({"n": n, "m": m, **point["ms"][m]}))

        point["adaptive"] = {}
        for cap, r in PROBE_ADAPTIVE:
            t0 = time.monotonic()
            got = {
                (r_["id_a"], r_["id_b"])
                for r_ in S.semdedup_pairs(
                    vecs,
                    k=k,
                    iterations=ITERS,
                    m=cap,
                    threshold=THRESHOLD,
                    ratio=r,
                ).collect()
            }
            sec = round(time.monotonic() - t0, 2)
            sizes_a = (
                S.kmeans_assign_topm(base, cents, m=cap, ratio=r)
                .groupBy("block")
                .count()
                .agg(
                    F.sum(
                        (F.col("count") * (F.col("count") - 1) / 2)
                    ).alias("p")
                )
                .collect()[0]["p"]
            )
            hit = len(got & truth)
            key = f"r{r}_cap{cap}"
            point["adaptive"][key] = {
                "sec_end_to_end": sec,
                "recall_vs_planted": round(hit / n_twins, 4),
                "emitted_pairs": len(got),
                "candidate_pairs": int(sizes_a),
                "vs_fixed_m4_candidates": round(
                    int(sizes_a)
                    / max(point["ms"][4]["candidate_pairs"], 1),
                    4,
                ),
                "pairs_per_sec": round(int(sizes_a) / sec),
            }
            print(json.dumps({"n": n, "arm": key, **point["adaptive"][key]}))
        vecs.unpersist()
        out["points"].append(point)
    out["host_end"] = host_snapshot()
    Path(_REPO, "SEMDEDUP_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote SEMDEDUP_PROBE.json")


if __name__ == "__main__":
    sz = [int(float(s)) for s in sys.argv[1:]] or [
        100_000,
        300_000,
        1_000_000,
    ]
    main(sz)
