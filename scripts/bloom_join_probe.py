#!/usr/bin/env python
"""Scale probe for ``operators/bloom`` probe-side join pruning
(round 6): quantify what the manual Bloom prefilter buys on the
shape it exists for — a selective equi-join whose dim side is too
big to broadcast and whose fact side would otherwise ship its full
mass through the join exchange.

Shape: 1e8 fact rows with keys uniform over a 1e8 domain; dim = the
1e6 lowest keys (1% of fact rows match). Bitmap: 2^24 bits (2 MiB of
words → ~262k-entry one-row map, broadcast once), FP rate ≈
n_keys/bits ≈ 6% of the non-matching mass. Expected effect: the
fact side enters the shuffle at ~7% of its rows (1% matches + ~6%
FPs), and the exact join keeps the answer identical — the same
result both arms, asserted.

Usage: python scripts/bloom_join_probe.py [--reps 3]
Writes BLOOM_JOIN_PROBE.json at the repo root.
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

from database_join_spark.operators import bloom as B  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402

FACT_ROWS = 100_000_000
KEY_DOMAIN = 100_000_000
DIM_KEYS = 1_000_000
BITS = 1 << 24


def frames(spark, parts: int):
    fact = spark.range(0, FACT_ROWS, 1, parts).select(
        (F.pmod(F.xxhash64("id"), F.lit(KEY_DOMAIN)) + 1).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(1, DIM_KEYS + 1, 1, max(parts // 8, 1)).select(
        F.col("id").alias("dk"), (F.col("id") % 13).alias("w")
    )
    return fact, dim


def run_join(fact, dim):
    return (
        fact.join(dim.hint("shuffle_hash"), dim.dk == fact.k)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("s"),
        )
        .collect()[0]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="bloom-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    parts = 4 * cores

    out: dict = {
        "fact_rows": FACT_ROWS,
        "dim_keys": DIM_KEYS,
        "key_domain": KEY_DOMAIN,
        "bits": BITS,
    }

    # survivor mass (one pass, informational)
    fact, dim = frames(spark, parts)
    bitmap = B.bitmap_of(dim, "dk", BITS)
    survivors = B.prefilter(fact, "k", bitmap, BITS).count()
    matches = fact.join(
        dim, dim.dk == fact.k, "left_semi"
    ).count()
    out["matches"] = matches
    out["survivors"] = survivors
    out["survivor_frac"] = round(survivors / FACT_ROWS, 4)
    out["fp_frac_of_nonmatching"] = round(
        (survivors - matches) / (FACT_ROWS - matches), 4
    )

    results = {}
    for label, pre in [("plain", False), ("bloom_prefiltered", True)]:
        runs = []
        answer = None
        for _ in range(args.reps + 1):  # first = warm-up
            fact, dim = frames(spark, parts)
            t0 = time.perf_counter()
            if pre:
                fact = B.prefilter(
                    fact, "k", B.bitmap_of(dim, "dk", BITS), BITS
                )
            answer = run_join(fact, dim)
            runs.append(round(time.perf_counter() - t0, 4))
        results[label] = {
            "sec": min(runs[1:]),
            "runs": runs[1:],
            "n": answer["n"],
            "s": int(answer["s"]),
        }
        print(f"# {label}: {results[label]}", file=sys.stderr)
    assert results["plain"]["n"] == results["bloom_prefiltered"]["n"]
    assert results["plain"]["s"] == results["bloom_prefiltered"]["s"]
    out["arms"] = results
    out["speedup"] = round(
        results["plain"]["sec"] / results["bloom_prefiltered"]["sec"], 2
    )

    Path(_REPO, "BLOOM_JOIN_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
