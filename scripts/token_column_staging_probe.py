#!/usr/bin/env python
"""Staged-parquet price of the carried token column (round 11).

The shared-tokens E2E arm (PIPELINE_E2E_PROBE) carries the token
array through PERSIST boundaries; a 100 TB pipeline carries it
through STAGED PARQUET instead — and the r10 verdict explicitly
asked whether parquet token-array I/O eats the tokenize-once win.
This probe prices that directly on the E2E corpus (1M docs,
post-gate post-exact-dedup, the stage-boundary shape):

- ``text``  — stage the classic (doc_id, text) table; the consumer
  re-tokenizes: read → tokens() → shingle-count.
- ``toks``  — stage (doc_id, toks array<string>); the consumer
  shingles the stored array directly.
- both arms record bytes-at-rest (columnar-compressed), write wall,
  and consumer wall (read + shingle + count, the decontam stage
  shape), with the shingle mass asserted identical.

Usage: python scripts/token_column_staging_probe.py [--docs 1000000]
       [--quick]
Writes TOKEN_STAGING_PROBE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark.operators import dedup as D  # noqa: E402
from database_join_spark.operators import text as T  # noqa: E402
from database_join_spark.queries.pipeline import _DECON_N  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402
from scripts.pipeline_e2e_probe import synth_corpus  # noqa: E402


def dir_bytes(path: str) -> int:
    return sum(
        f.stat().st_size for f in Path(path).rglob("*") if f.is_file()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = 50_000 if args.quick else args.docs

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="token-staging-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = synth_corpus(spark, n).persist()
    base.count()

    work = tempfile.mkdtemp(prefix=f"tok_stage_u{os.getuid()}_")
    out: dict = {"docs": n, "host_start": host_snapshot(), "arms": {}}
    counts = {}
    try:
        for name, stage_df, consume in (
            (
                "text",
                base.select("doc_id", "text"),
                lambda df: df.select(
                    "doc_id", T.tokens("text").alias("toks")
                ).select(
                    F.explode(
                        D.shingles_from_tokens("toks", _DECON_N)
                    ).alias("s")
                ),
            ),
            (
                "toks",
                base.select(
                    "doc_id", T.tokens("text").alias("toks")
                ),
                lambda df: df.select(
                    F.explode(
                        D.shingles_from_tokens("toks", _DECON_N)
                    ).alias("s")
                ),
            ),
        ):
            loc = os.path.join(work, name)
            t0 = time.perf_counter()
            stage_df.write.mode("overwrite").parquet(loc)
            write_sec = round(time.perf_counter() - t0, 2)
            stored = spark.read.parquet(loc)
            t0 = time.perf_counter()
            n_shingles = consume(stored).count()
            consume_sec = round(time.perf_counter() - t0, 2)
            counts[name] = n_shingles
            out["arms"][name] = {
                "write_sec": write_sec,
                "bytes_at_rest": dir_bytes(loc),
                "mb_at_rest": round(dir_bytes(loc) / 2**20, 1),
                "consume_sec": consume_sec,
                "shingles": n_shingles,
            }
            print(f"# {name}: {out['arms'][name]}", file=sys.stderr)
        assert counts["toks"] == counts["text"], counts
        out["identical_shingle_mass"] = True
        out["storage_ratio_toks_vs_text"] = round(
            out["arms"]["toks"]["bytes_at_rest"]
            / out["arms"]["text"]["bytes_at_rest"],
            3,
        )
        out["consume_speedup"] = round(
            out["arms"]["text"]["consume_sec"]
            / out["arms"]["toks"]["consume_sec"],
            3,
        )
        print(
            f"# storage {out['storage_ratio_toks_vs_text']}x, consumer "
            f"{out['consume_speedup']}x",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        base.unpersist()

    out["host_end"] = host_snapshot()
    Path(_REPO, "TOKEN_STAGING_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("host_start", "host_end")}))
    spark.stop()


if __name__ == "__main__":
    main()
