#!/usr/bin/env python
"""Scaling probe: run the MinHash near-dup pipeline on synthetic
corpora of increasing size and report wall-clock per size.

The claim under test is the 100 TB posture of the dedup path —
cost ~linear in corpus size (signatures are one scan; the LSH bucket
join is ~linear in the duplicate mass) — which the sf fixtures are
too small to demonstrate. Corpora are generated with deterministic
expressions (no RNG state, same trick as datagen.py): ~100-word docs
from a 500-word vocabulary, with 2% planted exact-prefix duplicates.

Usage: python scripts/scale_probe.py [sizes...]   (default 10k 50k 100k)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark.operators import dedup as D  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402

# Vocabulary must be corpus-realistic: with a tiny vocab, RANDOM doc
# pairs share enough 3-gram shingles to co-bucket, and the candidate
# join degrades toward O(n²) — a property of the data (background
# Jaccard ≫ 0), not the operator. 50k words ≈ real text: background
# shingle overlap ~0, candidates ≈ the planted duplicates only.
VOCAB = 50_000
WORDS_PER_DOC = 100


def synth_docs(spark, n: int):
    """n deterministic docs; ids ≡ 1 (mod 50) duplicate their
    predecessor except for the last word → planted near-dups."""
    base = F.expr("IF(id % 50 = 1, id - 1, id)")
    words = F.expr(
        f"transform(sequence(0, {WORDS_PER_DOC - 1}), "
        f"i -> concat('w', pmod(xxhash64(IF(id % 50 = 1, id - 1, id), i), {VOCAB})))"
    )
    tail = F.expr("concat('t', pmod(id, 997))")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat_ws(" ", words), tail).alias("text"),
    )


def minhash_pairs(docs):
    """Returns (total verified pairs, planted pairs recovered).

    A planted pair is (id-1, id) with id ≡ 1 (mod 50) — counting how
    many of those survive LSH + exact-Jaccard verification gives
    recall directly, since the synthetic corpus contains no other
    near-dups at a 50k vocabulary (background Jaccard ≈ 0)."""
    from database_join_spark.operators import text as T

    sh = (
        docs.select("doc_id", T.tokens("text").alias("toks"))
        .select("doc_id", D.shingles_from_tokens("toks", 3).alias("sh"))
        .persist()
    )
    cand = D.lsh_candidate_pairs(
        sh, id_col="doc_id", shingle_col="sh", num_hashes=32, bands=16
    )
    out = (
        D.pair_payloads(sh, cand, id_col="doc_id", payload_col="sh")
        .select("id_a", "id_b", D.jaccard("sh_a", "sh_b").alias("jac"))
        .filter(F.col("jac") >= 0.6)
    )
    planted = (
        (F.greatest("id_a", "id_b") % 50 == 1)
        & (F.greatest("id_a", "id_b") - F.least("id_a", "id_b") == 1)
    )
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(planted.cast("long")).alias("hit"),
    ).collect()[0]
    sh.unpersist()
    return int(row["n"]), int(row["hit"] or 0)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [10_000, 50_000, 100_000]
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    minhash_pairs(synth_docs(spark, 2_000))  # JIT/codegen warm-up
    for n in sizes:
        t0 = time.perf_counter()
        pairs, hit = minhash_pairs(synth_docs(spark, n))
        dt = time.perf_counter() - t0
        expected = (n + 48) // 50  # ids ≡ 1 (mod 50) in [1, n)
        results.append(
            {
                "docs": n,
                "sec": round(dt, 2),
                "pairs": pairs,
                "recall": round(hit / expected, 4) if expected else None,
                "docs_per_sec": round(n / dt),
            }
        )
        print(
            f"# {n} docs: {dt:.2f} s, {pairs} dup pairs, "
            f"recall {hit}/{expected}",
            file=sys.stderr,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
