#!/usr/bin/env python
"""Scaling probe for the ExactSubstr family (VERDICT r05 #6):
``substring_spans_frame`` (find cross-doc duplicate spans) and
``substring_excise_frame`` (apply/excise them) on synthetic corpora
of increasing size, with planted cross-document duplicate spans.

Claims under test — the operator's 100 TB posture, which sf fixtures
cannot demonstrate:
  * runtime scales with CORPUS size (window count), not pair count —
    the window-key groupBy never enumerates doc pairs;
  * span recall 1.0 / zero background spans on a realistic-vocab
    corpus (50k words: background 8-token windows collide with
    probability ~0, same reasoning as scale_probe.py);
  * the excision round-trip holds at probe scale: re-running the
    finder on the excised corpus yields ZERO spans.

Corpus: ~100-word docs, deterministic expressions (no RNG state,
datagen.py's trick). Docs with id % 50 ∈ {0, 1} form pairs sharing a
verbatim 12-token run at positions 40..51 (tokens keyed to the pair
base id), so with k=8 the expected merged span per planted doc is
exactly [40, 51] with 5 covered windows.

Usage: python scripts/substr_probe.py [sizes...] (default 100k 300k 1M)
Writes SUBSTR_PROBE.json at the repo root.
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

from database_join_spark.queries.pipeline import (  # noqa: E402
    _SUBSTR_K,
    substring_excise_frame,
    substring_spans_frame,
)
from database_join_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
WORDS_PER_DOC = 100
SPAN_AT = 40      # planted span start (token position)
SPAN_LEN = 12     # planted span length in tokens


def synth_docs(spark, n: int):
    """n deterministic docs; ids with id % 50 ∈ {0,1} share a
    verbatim SPAN_LEN-token run keyed by the pair base (id - id%50)."""
    words = F.expr(
        f"transform(sequence(0, {WORDS_PER_DOC - 1}), i -> "
        f"CASE WHEN id % 50 < 2 AND i BETWEEN {SPAN_AT} "
        f"AND {SPAN_AT + SPAN_LEN - 1} "
        f"THEN concat('p', CAST(id - id % 50 AS STRING), 'x', "
        f"CAST(i - {SPAN_AT} AS STRING)) "
        f"ELSE concat('w', pmod(xxhash64(id, i), {VOCAB})) END)"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def probe_size(spark, n: int) -> dict:
    docs = synth_docs(spark, n)
    n_planted = len([i for i in range(n) if i % 50 < 2])
    span_end = SPAN_AT + SPAN_LEN - 1

    # -- find: span table over the planted corpus
    t0 = time.perf_counter()
    spans = substring_spans_frame(docs)
    row = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(
            (
                (F.col("span_start") == SPAN_AT)
                & (F.col("span_end") == span_end)
            ).cast("long")
        ).alias("exact"),
    ).collect()[0]
    find_sec = time.perf_counter() - t0
    n_spans, exact = int(row["n_spans"]), int(row["exact"] or 0)

    # -- apply: excision end-to-end (includes its own span pass)
    t0 = time.perf_counter()
    clean = substring_excise_frame(docs)
    crow = clean.agg(
        F.sum("n_tokens_removed").alias("removed"),
        F.count(F.lit(1)).alias("docs"),
    ).collect()[0]
    apply_sec = time.perf_counter() - t0

    # -- round-trip: the excised corpus must contain ZERO spans
    t0 = time.perf_counter()
    cleaned_docs = substring_excise_frame(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    rt_spans = substring_spans_frame(cleaned_docs).count()
    rt_sec = time.perf_counter() - t0

    windows = n * (WORDS_PER_DOC - _SUBSTR_K + 1)
    return {
        "docs": n,
        "windows": windows,
        "find_sec": round(find_sec, 2),
        "windows_per_sec": round(windows / find_sec),
        "spans": n_spans,
        "expected_spans": n_planted,
        "span_recall": round(exact / n_planted, 4) if n_planted else None,
        "background_spans": n_spans - exact,
        "apply_sec": round(apply_sec, 2),
        "tokens_removed": int(crow["removed"] or 0),
        "expected_tokens_removed": n_planted * SPAN_LEN,
        "roundtrip_spans": int(rt_spans),
        "roundtrip_sec": round(rt_sec, 2),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    spark = get_spark(app_name="substr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_size(spark, 2_000)  # JIT/codegen warm-up
    results = []
    for n in sizes:
        r = probe_size(spark, n)
        results.append(r)
        print(
            f"# {n} docs: find {r['find_sec']} s "
            f"({r['windows_per_sec']}/s), spans {r['spans']}/"
            f"{r['expected_spans']} (recall {r['span_recall']}, "
            f"bg {r['background_spans']}), apply {r['apply_sec']} s, "
            f"roundtrip {r['roundtrip_spans']} spans",
            file=sys.stderr,
        )
    payload = {
        "k": _SUBSTR_K,
        "words_per_doc": WORDS_PER_DOC,
        "vocab": VOCAB,
        "points": results,
    }
    Path(_REPO, "SUBSTR_PROBE.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
