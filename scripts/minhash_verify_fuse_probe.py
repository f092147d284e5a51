#!/usr/bin/env python
"""A/B the MinHash verify-join shape at scale (round 14, VERDICT r13
#4): the shipped ``pair_payloads`` attaches payloads with a b-side
semi-filter plus an AQE-decided pair join (TWO candidate-mass
exchanges at corpus scale), versus a FUSED spelling — melt each pair
into (id_a, id_b, id, side) rows, one broadcast join against the
payload table, one groupBy(id_a, id_b) pivot — which moves the same
candidate-mass payload bytes through ONE exchange and no sort.

Both arms: identical verified pair set asserted (planted classes:
exactly docs/50 near-dup pairs at J ≥ 0.6), alternating reps, fresh
timed pass per rep (persists dropped), bench-style wall. sf0.1
fixture reading measured separately was a WASH (1.16 vs 1.20 s);
this probe decides the at-scale spelling.

Usage: python scripts/minhash_verify_fuse_probe.py [--docs 1000000]
Writes MINHASH_VERIFY_FUSE_PROBE.json.
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

from database_join_spark.operators import dedup as D  # noqa: E402
from database_join_spark.operators import text as T  # noqa: E402
from database_join_spark.queries.pipeline import (  # noqa: E402
    JACCARD_THRESHOLD,
    SHINGLE_N,
)
from database_join_spark.session import get_spark  # noqa: E402
from scripts.pipeline_e2e_probe import synth_corpus  # noqa: E402


def fused_pair_payloads(items, cand, id_col, payload_col):
    """The candidate spelling under test (see module docstring)."""
    from database_join_spark.session import track_persist

    cand = track_persist(cand)
    melted = cand.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a"),
                    F.col("id_b"),
                    F.col("id_a").alias(id_col),
                    F.lit(0).alias("side"),
                ),
                F.struct(
                    F.col("id_a"),
                    F.col("id_b"),
                    F.col("id_b").alias(id_col),
                    F.lit(1).alias("side"),
                ),
            )
        ).alias("m")
    ).select("m.*")
    joined = items.join(F.broadcast(melted), id_col)
    return joined.groupBy("id_a", "id_b").agg(
        F.first(
            F.when(F.col("side") == 0, F.col(payload_col)),
            ignorenulls=True,
        ).alias(f"{payload_col}_a"),
        F.first(
            F.when(F.col("side") == 1, F.col(payload_col)),
            ignorenulls=True,
        ).alias(f"{payload_col}_b"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    n = args.docs
    cls = n // 50

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="minhash-verify-fuse-probe")
    spark.sparkContext.setLogLevel("ERROR")

    raw = synth_corpus(spark, n).select(
        "doc_id",
        T.tokens("text").alias("toks"),
        T.token_count("text").alias("n_tokens"),
        T.fingerprint("text").alias("fp"),
    )
    toks = (
        D.dedup_exact(
            raw.filter(F.col("n_tokens") >= 20), ["fp"], "doc_id"
        )
        .select("doc_id", "toks")
        .persist()
    )
    assert toks.count() == n - 2 * cls

    def stage(attach):
        t0 = time.perf_counter()
        sh = toks.select(
            "doc_id",
            D.shingle_hashes_from_tokens("toks", SHINGLE_N).alias("sh"),
        ).persist()
        cand = D.lsh_candidate_pairs(
            sh, id_col="doc_id", shingle_col="sh",
            num_hashes=32, bands=16, prehashed=True,
        )
        verified = (
            attach(sh, cand, "doc_id", "sh")
            .select(
                "id_a", "id_b", D.jaccard("sh_a", "sh_b").alias("jac")
            )
            .filter(F.col("jac") >= JACCARD_THRESHOLD)
            .select("id_a", "id_b")
        )
        pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
        sec = round(time.perf_counter() - t0, 2)
        sh.unpersist()
        return pairs, sec

    arms = {
        "current": lambda i, c, idc, pc: D.pair_payloads(
            i, c, id_col=idc, payload_col=pc
        ),
        "fused": fused_pair_payloads,
    }
    out: dict = {
        "docs": n,
        "expected_pairs": cls,
        "threshold": JACCARD_THRESHOLD,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "arms": {k: {"walls_sec": []} for k in arms},
    }
    results: dict = {}
    for rep in range(args.reps):
        for name, attach in arms.items():
            pairs, sec = stage(attach)
            out["arms"][name]["walls_sec"].append(sec)
            prev = results.setdefault(name, pairs)
            assert prev == pairs
            assert len(pairs) == cls, (name, len(pairs), cls)
    assert results["current"] == results["fused"]
    out["identical_pair_sets"] = True
    for name in arms:
        out["arms"][name]["best_sec"] = min(
            out["arms"][name]["walls_sec"]
        )
        out["arms"][name]["verified_pairs"] = len(results[name])
    out["speedup_fused"] = round(
        out["arms"]["current"]["best_sec"]
        / out["arms"]["fused"]["best_sec"],
        3,
    )
    out["sf01_wash_note"] = (
        "same-session sf0.1 A/B medians: current 1.156 s, fused "
        "1.201 s — fixture wash; this probe decides by scale"
    )
    out["host_end"] = host_snapshot()
    Path(_REPO, "MINHASH_VERIFY_FUSE_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: out["arms"][k] for k in arms}, indent=1))
    print("speedup_fused:", out["speedup_fused"])
    spark.stop()


if __name__ == "__main__":
    main()
