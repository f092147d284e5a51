#!/usr/bin/env python
"""ExactSubstr window-key spelling probe: string vs hashed (round 10).

After the round-10 inlining fixes, the composed corpus pipeline's
dominant stage is ExactSubstr (PIPELINE_E2E_PROBE: 66 of 130 s at 1M
docs). Its window KEY crosses the wire twice — the duplicate-window
groupBy and the hit semi-join — and an 8-token window string is ~50
bytes where an xxhash64 of the same tokens is 8. This probe runs
`substring_spans_frame` both ways on substr_probe's planted corpus
(pairs sharing a verbatim 12-token run; recall/exactness ground
truth known) and `substring_excise_frame` end-to-end:

- spans must be IDENTICAL between spellings (collision probability
  ~windows²/2⁶⁴; a hit would excise a non-duplicated span — why the
  string key stays the library default);
- walls + exploded-window counts recorded per spelling, reps each.

Usage: python scripts/substr_hashkey_probe.py [--docs 1000000]
       [--reps 2] [--quick]
Writes SUBSTR_HASHKEY_PROBE.json at the repo root.
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

from database_join_spark.queries.pipeline import (  # noqa: E402
    substring_excise_frame,
    substring_spans_frame,
)
from database_join_spark.session import get_spark  # noqa: E402
from scripts.substr_probe import (  # noqa: E402
    SPAN_AT,
    SPAN_LEN,
    synth_docs,
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

    spark = get_spark(app_name="substr-hashkey-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n).persist()
    docs.count()
    # planted docs: id % 50 in {0, 1}; expected span [40, 51] each
    expected_docs = 2 * ((n + 49) // 50)

    out: dict = {
        "docs": n,
        "expected_span_docs": expected_docs,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "arms": {},
    }

    span_sets: dict[str, frozenset] = {}
    for name, hk in (("string_key", False), ("hashed_key", True)):
        runs, excise_runs = [], []
        rows = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            got = substring_spans_frame(docs, hash_keys=hk).collect()
            runs.append(round(time.perf_counter() - t0, 2))
            rows = frozenset(
                (r["doc_id"], r["span_start"], r["span_end"])
                for r in got
            )
            t0 = time.perf_counter()
            removed = (
                substring_excise_frame(docs, hash_keys=hk)
                .agg(F.sum("n_tokens_removed").alias("r"))
                .collect()[0]["r"]
            )
            excise_runs.append(round(time.perf_counter() - t0, 2))
        span_sets[name] = rows
        # planted ground truth: every pair doc carries exactly
        # [SPAN_AT, SPAN_AT+SPAN_LEN-1]
        exact = {
            s for s in rows
            if (s[1], s[2]) == (SPAN_AT, SPAN_AT + SPAN_LEN - 1)
        }
        out["arms"][name] = {
            "spans_sec": min(runs),
            "spans_runs": runs,
            "excise_sec": min(excise_runs),
            "excise_runs": excise_runs,
            "span_rows": len(rows),
            "exact_planted_spans": len(exact),
            "tokens_removed": int(removed),
            "host": host_snapshot(),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    assert span_sets["string_key"] == span_sets["hashed_key"], (
        "span sets diverged between key spellings"
    )
    out["span_sets_identical"] = True
    out["host_end"] = host_snapshot()
    docs.unpersist()
    Path(_REPO, "SUBSTR_HASHKEY_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))
    spark.stop()


if __name__ == "__main__":
    main()
