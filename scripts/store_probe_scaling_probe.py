#!/usr/bin/env python
"""Streaming near-dup store probe: CPU scaling proof (round 14,
VERDICT r13 #8, stretch).

Round 13 argued the cross-batch bucket-store probe's O(state) hash
scan is "fleet-distributable" — the store is scanned map-side with
the batch's buckets broadcast, so more cores should divide the wall.
This probe PROVES it: one parent process builds a real 2M-doc bucket
store (the exact `banded_buckets` output the ingest stage appends)
plus one 100k-doc batch's surviving buckets; two child processes at
``local[8]`` and ``local[32]`` then run the exact probe join from
``ingest_neardedup_batch`` (decoded-store-cache included) and time
the cached probe passes. Wall ∝ 1/cores within scheduler overhead =
the distributability claim, measured.

Usage: python scripts/store_probe_scaling_probe.py [--docs 2000000]
Writes STORE_PROBE_SCALING_PROBE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NUM_HASHES, BANDS, SHINGLE_N = 32, 16, 3


def child(store_dir: str, batch_dir: str, cpus: int, out_path: str):
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.session import get_spark
    from database_join_spark.streaming import _bucket_store_frame

    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"store-probe-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    surv_buckets = spark.read.parquet(batch_dir)

    def probe_once() -> tuple[float, int]:
        t0 = time.perf_counter()
        store_b = _bucket_store_frame(spark, store_dir)
        hits = (
            store_b.withColumnRenamed("doc_id", "rep_id")
            .join(F.broadcast(surv_buckets), ["band", "bucket"])
            .select("doc_id", "rep_id")
            .distinct()
            .count()
        )
        return time.perf_counter() - t0, hits

    first_sec, hits = probe_once()  # pays the store decode + cache
    runs = []
    for _ in range(5):
        sec, h = probe_once()
        assert h == hits
        runs.append(sec)
    # The O(state) term in isolation: a full pass over the cached
    # store (noop sink — every row materialized) WITHOUT the probe
    # join's per-action broadcast build, which is driver-serial and
    # fixed per batch. The distributability claim is about THIS
    # term; the full probe wall above carries the fixed build too.
    store_b = _bucket_store_frame(spark, store_dir)
    scans = []
    for _ in range(5):
        t0 = time.perf_counter()
        store_b.write.format("noop").mode("overwrite").save()
        scans.append(time.perf_counter() - t0)
    rec = {
        "cpus": cpus,
        "first_probe_sec": round(first_sec, 2),
        "cached_probe_runs_sec": [round(r, 3) for r in runs],
        "cached_probe_median_sec": round(statistics.median(runs), 3),
        "cached_scan_runs_sec": [round(r, 3) for r in scans],
        "cached_scan_median_sec": round(statistics.median(scans), 3),
        "hit_pairs": hits,
        "host": host_snapshot(),
    }
    Path(out_path).write_text(json.dumps(rec) + "\n")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--batch-docs", type=int, default=20_000)
    ap.add_argument("--child-store")
    ap.add_argument("--child-batch")
    ap.add_argument("--child-cpus", type=int)
    ap.add_argument("--child-out")
    args = ap.parse_args()

    if args.child_cpus:
        child(
            args.child_store,
            args.child_batch,
            args.child_cpus,
            args.child_out,
        )
        return

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators import dedup as D
    from database_join_spark.operators import text as T
    from database_join_spark.session import get_spark
    from scripts.pipeline_e2e_probe import synth_corpus

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="storeprobe_")
    store_dir, batch_dir = f"{tmp}/buckets", f"{tmp}/batch"
    spark = get_spark(app_name="store-probe-build")
    spark.sparkContext.setLogLevel("ERROR")

    def buckets_of(df):
        # tok_col-must-be-materialized contract
        # (dedup.shingle_hashes_from_tokens): localCheckpoint the
        # token frame so CollapseProject cannot re-inline the
        # tokenizer into every n-gram element_at (the round-10 19×
        # trap — the first run of this probe sat 17 min in stage 0
        # on exactly that)
        toks = (
            df.select("doc_id", T.tokens("text").alias("toks"))
            .localCheckpoint(eager=True)
            .select(
                "doc_id",
                D.shingle_hashes_from_tokens("toks", SHINGLE_N).alias(
                    "hs"
                ),
            )
        )
        return D.banded_buckets(
            toks,
            id_col="doc_id",
            shingle_col="hs",
            num_hashes=NUM_HASHES,
            bands=BANDS,
            prehashed=True,
        )

    # store = `docs` documents' bucket rows (what that many admitted
    # docs would have appended); batch = ONE ingest trigger's worth
    # (~4 files ≈ 20k docs — the real per-batch bound), drawn from
    # the store's own id range so the probe has a realistic
    # duplicate-heavy hit mass (a re-crawled slice). The first probe
    # run of this script used a 100k-doc batch: its 1.6M-row
    # broadcast build is driver-serial and dominated BOTH arms,
    # measuring the broadcast, not the scan.
    corpus = synth_corpus(spark, args.docs)
    buckets_of(corpus).select(
        "doc_id", "band", "bucket"
    ).write.mode("overwrite").parquet(store_dir)
    buckets_of(
        corpus.filter(F.col("doc_id") < args.batch_docs)
    ).select("doc_id", "band", "bucket").write.mode(
        "overwrite"
    ).parquet(batch_dir)
    store_rows = spark.read.parquet(store_dir).count()
    spark.stop()

    out: dict = {
        "store_docs": args.docs,
        "store_bucket_rows": store_rows,
        "batch_docs": args.batch_docs,
        "bands": BANDS,
        "host_start": host_snapshot(),
        "arms": {},
    }
    for cpus in (8, 32):
        out_path = f"{tmp}/arm_{cpus}.json"
        env = {**os.environ, "PYTHONPATH": _REPO}
        subprocess.run(
            [
                sys.executable,
                __file__,
                "--child-store",
                store_dir,
                "--child-batch",
                batch_dir,
                "--child-cpus",
                str(cpus),
                "--child-out",
                out_path,
            ],
            check=True,
            env=env,
        )
        out["arms"][str(cpus)] = json.loads(Path(out_path).read_text())
        print(json.dumps(out["arms"][str(cpus)]))
    a8 = out["arms"]["8"]["cached_probe_median_sec"]
    a32 = out["arms"]["32"]["cached_probe_median_sec"]
    out["speedup_8_to_32"] = round(a8 / a32, 2)
    s8 = out["arms"]["8"]["cached_scan_median_sec"]
    s32 = out["arms"]["32"]["cached_scan_median_sec"]
    out["scan_speedup_8_to_32"] = round(s8 / s32, 2)
    out["ideal"] = 4.0
    assert (
        out["arms"]["8"]["hit_pairs"] == out["arms"]["32"]["hit_pairs"]
    )
    out["host_end"] = host_snapshot()
    Path(_REPO, "STORE_PROBE_SCALING_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
