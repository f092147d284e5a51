#!/usr/bin/env python
"""ExactSubstr window-key PRODUCTION probe (round 11).

After the tokenize-once recomposition, the composed pipeline's
dominant stage is still ExactSubstr (PIPELINE_E2E_PROBE
shared_tokens_arm: 25.2 of 66.4 s at 1M docs). The span plan consumes
the exploded window stream TWICE — the duplicate-window groupBy and
the hit probe — and because the probe side is a broadcast semi-join
(the dup-key set is output-bounded and small), there is NO exchange
for Spark to reuse: window-key production (k=8 ``element_at`` lookups
+ ``xxhash64`` per position, ~93 positions per 100-token doc) runs
end-to-end twice.

Three arms over the same planted corpus (substr_probe's verbatim
12-token pair runs), identical span sets asserted:

- ``recompute``  — status quo: ``substring_spans_from_tokens`` over a
  persisted ``(doc_id, toks)`` cache; both consumers re-derive keys
  from the token strings.
- ``key_arrays`` — persist ``substring_window_keys`` (one ``bigint``
  array per doc, ~8 B/window vs ~50 B of token text): production runs
  once, each consumer re-explodes the compact cached array.
- ``win_rows``   — persist the fully EXPLODED ``(doc_id, pos, win)``
  stream (~93M rows at 1M docs): even the explode is paid once, at
  ~3× the cache mass of ``key_arrays``.

Cache masses are read back from the storage API so the wall-vs-memory
trade is recorded, not guessed. Usage:
    python scripts/substr_wincache_probe.py [--docs 1000000] [--reps 2]
        [--quick]
Writes SUBSTR_WINCACHE_PROBE.json at the repo root.
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

from database_join_spark.operators import text as T  # noqa: E402
from database_join_spark.queries.pipeline import (  # noqa: E402
    _spans_from_windows,
    substring_spans_from_tokens,
    substring_spans_from_window_keys,
    substring_window_keys,
)
from database_join_spark.session import get_spark  # noqa: E402
from scripts.substr_probe import (  # noqa: E402
    SPAN_AT,
    SPAN_LEN,
    synth_docs,
)


def cached_bytes(spark) -> int:
    """Total in-memory bytes of every live cached RDD block."""
    sc = spark.sparkContext
    return sum(
        info.memSize()
        for info in sc._jsc.sc().getRDDStorageInfo()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--quick", action="store_true",
        help="100k-doc smoke of the full harness",
    )
    args = ap.parse_args()
    n = 100_000 if args.quick else args.docs

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="substr-wincache-probe")
    spark.sparkContext.setLogLevel("ERROR")

    toks = (
        synth_docs(spark, n)
        .select("doc_id", T.tokens("text").alias("toks"))
        .persist()
    )
    toks.count()
    toks_bytes = cached_bytes(spark)
    expected_docs = 2 * ((n + 49) // 50)

    out: dict = {
        "docs": n,
        "expected_span_docs": expected_docs,
        "reps": args.reps,
        "toks_cache_bytes": toks_bytes,
        "host_start": host_snapshot(),
        "arms": {},
    }

    def spans_recompute():
        return substring_spans_from_tokens(toks, hash_keys=True), None

    def spans_key_arrays():
        keys = substring_window_keys(toks, hash_keys=True).persist()
        keys.count()
        return substring_spans_from_window_keys(keys), keys

    def spans_win_rows():
        wins = (
            substring_window_keys(toks, hash_keys=True)
            .select("doc_id", F.posexplode("wkeys").alias("pos", "win"))
            .persist()
        )
        wins.count()
        return _spans_from_windows(wins), wins

    arms = (
        ("recompute", spans_recompute),
        ("key_arrays", spans_key_arrays),
        ("win_rows", spans_win_rows),
    )
    span_sets: dict[str, frozenset] = {}
    for name, build in arms:
        runs = []
        rows: frozenset = frozenset()
        extra_bytes = 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spans, cache = build()
            got = spans.collect()
            runs.append(round(time.perf_counter() - t0, 2))
            rows = frozenset(
                (r["doc_id"], r["span_start"], r["span_end"])
                for r in got
            )
            if cache is not None:
                extra_bytes = cached_bytes(spark) - toks_bytes
                cache.unpersist(blocking=True)
        span_sets[name] = rows
        exact = {
            s for s in rows
            if (s[1], s[2]) == (SPAN_AT, SPAN_AT + SPAN_LEN - 1)
        }
        out["arms"][name] = {
            "spans_sec": min(runs),
            "spans_runs": runs,
            "span_rows": len(rows),
            "exact_planted_spans": len(exact),
            "extra_cache_bytes": extra_bytes,
            "host": host_snapshot(),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    base = span_sets["recompute"]
    for name, rows in span_sets.items():
        assert rows == base, f"span set diverged in arm {name}"
    out["span_sets_identical"] = True
    out["host_end"] = host_snapshot()
    toks.unpersist()
    Path(_REPO, "SUBSTR_WINCACHE_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))
    spark.stop()


if __name__ == "__main__":
    main()
