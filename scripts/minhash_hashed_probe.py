#!/usr/bin/env python
"""MinHash-LSH retire stage: string vs hashed shingles (round 11).

The shared-tokens E2E arm left MinHash as its largest stage (28.0 s
of 89.5 at 1M docs). The string spelling pays three things the
hashed one does not: materializing ~98 shingle STRINGS per doc
(~20 B each), an extra xxhash64 pass string→int64 before the
signature fold (operators/dedup.shingle_hashes), and a pair-verify
shuffle whose payload is the string arrays (~2 KB/doc vs 784 B of
hashes). `shingle_hashes_from_tokens` builds the distinct int64
shingle set straight from the token columns — no string is ever
allocated — and `lsh_candidate_pairs(prehashed=True)` +
`jaccard` over the hash arrays complete the stage.

Exactness: Jaccard over hash sets differs from Jaccard over string
sets only if two DIFFERENT n-grams collide in 64 bits
(~shingles²/2⁶⁴ per pair); the probe asserts the VERIFIED PAIR SET
is identical between arms, so a fired collision is a loud failure,
not a silent mis-retire — the dedup_substring_hashed discipline.

Corpus: the E2E probe's planted classes (class 1 = near-dup of
id-1 with one divergent word → exactly n/50 verified pairs at
J ≥ 0.6).

Usage: python scripts/minhash_hashed_probe.py [--docs 1000000] [--quick]
Writes MINHASH_HASHED_PROBE.json at the repo root.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = 50_000 if args.quick else args.docs
    cls = n // 50

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="minhash-hashed-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # the E2E shared-arm STAGE-3 input: quality gate + exact dedup
    # first (raw corpus still holds class 3's exact copies, which
    # chain with class 1's near-dups into 3·cls verified pairs —
    # the composed pipeline removes them before MinHash, so this
    # stage probe must too)
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

    def stage(shingle_expr, prehashed: bool):
        """One full MinHash retire pass: shingle production →
        banded candidates → exact-Jaccard verify ≥ threshold.
        Returns (verified pair set, wall seconds)."""
        t0 = time.perf_counter()
        sh = toks.select(
            "doc_id", shingle_expr.alias("sh")
        ).persist()
        cand = D.lsh_candidate_pairs(
            sh, id_col="doc_id", shingle_col="sh",
            num_hashes=32, bands=16, prehashed=prehashed,
        )
        verified = (
            D.pair_payloads(
                sh, cand, id_col="doc_id", payload_col="sh"
            )
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

    out: dict = {
        "docs": n,
        "expected_pairs": cls,
        "num_hashes": 32,
        "bands": 16,
        "threshold": JACCARD_THRESHOLD,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "arms": {},
    }
    results = {}
    for name, expr, pre in (
        ("strings", D.shingles_from_tokens("toks", SHINGLE_N), False),
        (
            "hashed",
            D.shingle_hashes_from_tokens("toks", SHINGLE_N),
            True,
        ),
    ):
        walls = []
        for _ in range(args.reps):
            pairs, sec = stage(expr, pre)
            walls.append(sec)
        results[name] = pairs
        assert len(pairs) == cls, (name, len(pairs), cls)
        out["arms"][name] = {
            "walls_sec": walls,
            "best_sec": min(walls),
            "verified_pairs": len(pairs),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    assert results["hashed"] == results["strings"], (
        len(results["hashed"] - results["strings"]),
        len(results["strings"] - results["hashed"]),
    )
    out["identical_pair_sets"] = True
    out["speedup"] = round(
        out["arms"]["strings"]["best_sec"]
        / out["arms"]["hashed"]["best_sec"],
        3,
    )
    print(f"# speedup: {out['speedup']}x", file=sys.stderr)
    out["host_end"] = host_snapshot()
    toks.unpersist()
    Path(_REPO, "MINHASH_HASHED_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("host_start", "host_end")}))
    spark.stop()


if __name__ == "__main__":
    main()
