#!/usr/bin/env python
"""decontam_minhash scale probe (VERDICT r04 Next #5).

Mirrors scripts/scale_probe.py for the CROSS-corpus case: a growing
corpus (100k → 1M docs) checked against a FIXED 10k-doc benchmark
split with planted near-dup leaks (J ≈ 0.78 ≥ 0.6: 90 of 100 words
copied from a benchmark doc). Drives the exact operator code
(queries.pipeline.decontam_minhash_core) and records recall,
precision, docs/s, and the evidence that runtime scales with corpus
scan + collision mass, not corpus² — the benchmark side is broadcast
and constant, so doubling the corpus should ~double the time.

Corpus-realism note (same as scale_probe.py): a 50k-word vocabulary
keeps background cross-split shingle overlap ≈ 0, so candidates ≈
the planted leaks and precision is a meaningful 1.0, not an artifact
of a tiny vocab where everything collides.

Usage: python scripts/decontam_probe.py [sizes...] (default 100000 300000 1000000)
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
from database_join_spark.operators import text as T  # noqa: E402
from database_join_spark.queries.pipeline import (  # noqa: E402
    decontam_minhash_core,
)
from database_join_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
WORDS = 100
N_BENCH = 10_000
#: corpus ids ≡ 1 (mod 100) leak benchmark doc (id DIV 100) % N_BENCH
PLANT_MOD = 100
#: planted docs copy the first 90 of 100 words → shingle J ≈ 0.78
COPIED = 90
#: corpus word-hash seed offset keeps clean corpus text disjoint from
#: benchmark text
_OFF = 1_000_000_000


def bench_docs(spark):
    words = F.expr(
        f"transform(sequence(0, {WORDS - 1}), "
        f"i -> concat('w', pmod(xxhash64(id, i), {VOCAB})))"
    )
    return spark.range(N_BENCH).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def corpus_docs(spark, n: int):
    seed = (
        f"IF(id % {PLANT_MOD} = 1 AND i < {COPIED}, "
        f"(id DIV {PLANT_MOD}) % {N_BENCH}, id + {_OFF})"
    )
    words = F.expr(
        f"transform(sequence(0, {WORDS - 1}), "
        f"i -> concat('w', pmod(xxhash64({seed}, i), {VOCAB})))"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def _hashed(docs):
    return (
        docs.select("doc_id", T.tokens("text").alias("toks"))
        .select("doc_id", D.shingles_from_tokens("toks", 3).alias("sh"))
        .select("doc_id", D.shingle_hashes("sh").alias("hs"))
    )


def probe(spark, n: int) -> dict:
    ev = _hashed(bench_docs(spark)).persist()
    corpus = _hashed(corpus_docs(spark, n)).persist()
    t0 = time.perf_counter()
    flagged = {
        int(r["doc_id"])
        for r in decontam_minhash_core(corpus, ev).collect()
    }
    dt = time.perf_counter() - t0
    ev.unpersist()
    corpus.unpersist()
    planted = {i for i in range(1, n, PLANT_MOD)}
    hit = flagged & planted
    return {
        "corpus_docs": n,
        "bench_docs": N_BENCH,
        "sec": round(dt, 2),
        "docs_per_sec": round(n / dt),
        "flagged": len(flagged),
        "planted": len(planted),
        "recall": round(len(hit) / len(planted), 4),
        "precision": round(len(hit) / len(flagged), 4) if flagged else None,
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    spark = get_spark(app_name="decontam-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, 5_000)  # JIT/codegen warm-up
    points = []
    for n in sizes:
        point = probe(spark, n)
        points.append(point)
        print(f"# {point}", file=sys.stderr)
    if len(points) >= 2:
        a, b = points[0], points[-1]
        growth = {
            "size_ratio": round(b["corpus_docs"] / a["corpus_docs"], 2),
            "time_ratio": round(b["sec"] / a["sec"], 2),
        }
    else:
        growth = {}
    out = {"points": points, "growth": growth}
    Path(_REPO, "DECONTAM_PROBE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
