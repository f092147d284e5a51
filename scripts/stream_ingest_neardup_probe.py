#!/usr/bin/env python
"""Streaming ingest with CROSS-BATCH NEAR-DUP retirement (round 12,
VERDICT r11 #7).

STREAM_INGEST_PROBE (r11) proved the incremental twin of the corpus
pipeline's exact stage: quality gate → cross-batch fingerprint dedup.
But a crawl's near-dups arrive across batches too, and the exact
fingerprint (order-insensitive token set) cannot catch them. This
probe composes the round-12 stage that does —
``streaming.ingest_neardedup_batch``: per micro-batch, within-batch
MinHash-LSH + exact hashed-set Jaccard verify, then a probe of the
accumulated (band, bucket, doc_id) BUCKET STORE with verification
against the (doc_id, hs) SKETCH STORE, survivors appended to both
stores and the sink.

Planted classes per day (class = doc_id % 50, counts EXACT; every
dup/near-dup targets a class-0 BACKGROUND doc, so the pairwise
drop-the-later-arrival policy is closure-free by construction):

- class 2 — 10-word docs               → quality gate
- class 3 — same-day EXACT copy of id-3   → within-batch fp dedup
- class 4 — prev-day EXACT re-emit        → cross-batch fp state
  (day 0: unique, admitted)
- class 5 — same-day NEAR copy of id-5 (1 of 100 words replaced
  with a doc-unique token; hashed-shingle Jaccard ≈ 0.94)
                                        → within-batch NEAR dedup
- class 9 — prev-day NEAR re-emit (same perturbation)
                                        → CROSS-batch near-dup state
  (day 0: unique, admitted)

so the sink must hold exactly
``days·per_day − days·c(gate) − days·c(exact-same) −
(days−1)·c(exact-cross) − days·c(near-same) − (days−1)·c(near-cross)``
docs with c = per_day/50. Beyond the arithmetic, the probe replays
the WHOLE log as the batch pipeline's spelling — gate → exact min-id
dedup → MinHash near-dedup (identical hashed-shingle machinery,
identical threshold, drop the id_b side) — and asserts the retained
fingerprint SET equals the sink's in both directions (doc_id ==
arrival order here, so batch min-id == streaming first-arrival; the
planted graph has no dup-of-dup chains, so pairwise batch == greedy
streaming).

Also measured: per-batch seconds as BOTH stores grow (the flatness
claim), final bucket/sketch-store row counts vs admitted docs.

Usage: python scripts/stream_ingest_neardup_probe.py
       [--per-day 100000] [--days 20] [--quick]
Writes STREAM_INGEST_NEARDUP_PROBE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

VOCAB = 50_000
WORDS = 100
SCHEMA = "doc_id BIGINT, day INT, text STRING"
MIN_TOKENS = 20
SHINGLE_N = 3
NUM_HASHES, BANDS = 32, 16
THRESHOLD = 0.6


def synth_day(spark, day: int, per_day: int):
    """One day of documents; global doc_id = day·per_day + slot.
    Exact classes copy the target's word stream verbatim; near
    classes copy it with word 3 replaced by a doc-unique token."""
    from pyspark.sql import functions as F

    base = (
        "CASE "
        "WHEN id % 50 = 3 THEN id - 3 "
        f"WHEN id % 50 = 4 AND id >= {per_day} THEN id - 4 - {per_day} "
        "WHEN id % 50 = 5 THEN id - 5 "
        f"WHEN id % 50 = 9 AND id >= {per_day} THEN id - 9 - {per_day} "
        "ELSE id END"
    )
    near = (
        f"(id % 50 = 5 OR (id % 50 = 9 AND id >= {per_day}))"
    )
    word = (
        f"IF(i = 3 AND {near}, concat('z', CAST(id AS STRING)), "
        f"concat('w', pmod(xxhash64({base}, i), {VOCAB})))"
    )
    nw = f"IF(id % 50 = 2, 10, {WORDS})"
    return (
        spark.range(day * per_day, (day + 1) * per_day)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(day).alias("day"),
            F.expr(
                f"array_join(transform(sequence(0, {nw} - 1), "
                f"i -> {word}), ' ')"
            ).alias("text"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-day", type=int, default=100_000)
    ap.add_argument("--days", type=int, default=20)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--arm", default="broadcast_isin",
        help="artifact label for this store-probe spelling",
    )
    args = ap.parse_args()
    per_day = 5_000 if args.quick else args.per_day
    days = 5 if args.quick else args.days
    n_total = per_day * days
    c = per_day // 50

    from pyspark.sql import functions as F

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators import dedup as D
    from database_join_spark.operators import text as T
    from database_join_spark.session import get_spark
    from database_join_spark.streaming import (
        ROCKSDB_PROVIDER,
        corpus_ingest_dedup,
        ingest_neardedup_batch,
        rocksdb_state_store_confs,
    )

    spark = get_spark(app_name="stream-ingest-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    for k, v in rocksdb_state_store_confs().items():
        spark.conf.set(k, v)

    tmp = tempfile.mkdtemp(prefix="ingest_neardup_")
    src, sink = f"{tmp}/src", f"{tmp}/sink"
    ckpt, state = f"{tmp}/ckpt", f"{tmp}/neardup_state"
    out: dict = {
        "per_day": per_day,
        "days": days,
        "n_total": n_total,
        "threshold": THRESHOLD,
        "num_hashes": NUM_HASHES,
        "bands": BANDS,
        "host_start": host_snapshot(),
    }

    # ---- write day files (arrival order = doc_id order)
    for d in range(days):
        synth_day(spark, d, per_day).coalesce(4).write.mode(
            "append"
        ).parquet(f"{src}/day={d:03d}")

    def neardedup_and_append(batch_df, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        toks = batch_df.select(
            "doc_id", "day", "fp", "n_tokens",
            T.tokens("text").alias("toks"),
        )
        admitted = ingest_neardedup_batch(
            toks,
            state,
            id_col="doc_id",
            toks_col="toks",
            shingle_n=SHINGLE_N,
            num_hashes=NUM_HASHES,
            bands=BANDS,
            threshold=THRESHOLD,
        )
        admitted.select("doc_id", "day", "fp", "n_tokens").write.mode(
            "append"
        ).parquet(sink)

    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src + "/*")
    )
    q = (
        corpus_ingest_dedup(stream)
        .writeStream.foreachBatch(neardedup_and_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(7200)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    wall = round(time.perf_counter() - t0, 2)

    batch_secs = [
        p["durationMs"]["triggerExecution"] / 1e3
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    out["ingest"] = {
        "wall_sec": wall,
        "docs_per_sec": round(n_total / wall),
        "n_batches": len(batch_secs),
        "batch_sec": {
            "first": round(batch_secs[0], 2) if batch_secs else None,
            "min": round(min(batch_secs), 2),
            "p50": round(
                sorted(batch_secs)[len(batch_secs) // 2], 2
            ),
            "max": round(max(batch_secs), 2),
            "last": round(batch_secs[-1], 2) if batch_secs else None,
        },
    }
    print(f"# ingest: {out['ingest']}", file=sys.stderr)

    # ---- exact planted arithmetic
    admitted = spark.read.parquet(sink).persist()
    got = admitted.count()
    expect = (
        n_total
        - days * c          # gate
        - days * c          # exact same-day
        - (days - 1) * c    # exact cross-day
        - days * c          # near same-day
        - (days - 1) * c    # near cross-day
    )
    out["sink_docs"] = got
    out["sink_docs_expected"] = expect
    out["sink_exact"] = bool(got == expect)
    print(f"# sink: {got} (expect {expect})", file=sys.stderr)

    # per-class drop masses (admitted per class per scope)
    by_class = {
        int(r["cls"]): r["n"]
        for r in admitted.groupBy(
            (F.col("doc_id") % 50).alias("cls")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out["class_admitted"] = {
        "gate_cls2": by_class.get(2, 0),          # expect 0
        "exact_same_cls3": by_class.get(3, 0),    # expect 0
        "exact_cross_cls4": by_class.get(4, 0),   # expect c (day 0)
        "near_same_cls5": by_class.get(5, 0),     # expect 0
        "near_cross_cls9": by_class.get(9, 0),    # expect c (day 0)
    }
    out["class_exact"] = bool(
        out["class_admitted"]["gate_cls2"] == 0
        and out["class_admitted"]["exact_same_cls3"] == 0
        and out["class_admitted"]["exact_cross_cls4"] == c
        and out["class_admitted"]["near_same_cls5"] == 0
        and out["class_admitted"]["near_cross_cls9"] == c
    )

    # ---- state-store census vs admitted
    buckets = spark.read.parquet(f"{state}/buckets")
    sketches = spark.read.parquet(f"{state}/sketches")
    out["state"] = {
        "bucket_rows": buckets.count(),
        "bucket_rows_expected": got * BANDS,
        "sketch_rows": sketches.count(),
        "sketch_rows_expected": got,
    }
    out["state_exact"] = bool(
        out["state"]["bucket_rows"] == got * BANDS
        and out["state"]["sketch_rows"] == got
    )

    # ---- batch-pipeline replay parity (fp set, both directions)
    log = spark.read.schema(SCHEMA).parquet(src + "/*")
    gated = (
        log.withColumn("n_tokens", T.token_count("text"))
        .filter(F.col("n_tokens") >= MIN_TOKENS)
        .withColumn("fp", T.fingerprint("text"))
    )
    exact_surv = D.dedup_exact(gated, ["fp"], "doc_id").select(
        "doc_id", "fp", T.tokens("text").alias("toks")
    )
    hs = exact_surv.select(
        "doc_id",
        "fp",
        D.shingle_hashes_from_tokens("toks", SHINGLE_N).alias("hs"),
    ).persist()
    cand = D.lsh_candidate_pairs(
        hs, id_col="doc_id", shingle_col="hs",
        num_hashes=NUM_HASHES, bands=BANDS, prehashed=True,
    )
    near_dropped = (
        D.pair_payloads(hs, cand, id_col="doc_id", payload_col="hs")
        .filter(D.jaccard("hs_a", "hs_b") >= THRESHOLD)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    batch_fps = {
        r["fp"]
        for r in hs.join(near_dropped, "doc_id", "left_anti")
        .select("fp")
        .collect()
    }
    sink_fps = {r["fp"] for r in admitted.select("fp").collect()}
    out["parity"] = {
        "batch_retained": len(batch_fps),
        "sink_retained": len(sink_fps),
        "sink_minus_batch": len(sink_fps - batch_fps),
        "batch_minus_sink": len(batch_fps - sink_fps),
    }
    out["parity_exact"] = bool(sink_fps == batch_fps)
    print(f"# parity: {out['parity']}", file=sys.stderr)

    out["host_end"] = host_snapshot()
    out["all_exact"] = bool(
        out["sink_exact"]
        and out["class_exact"]
        and out["state_exact"]
        and out["parity_exact"]
    )
    # merge-on-write under an arm label so the round-12 store-probe
    # spellings sit side by side (the v1 shuffle-join arm measured
    # batch seconds GROWING with the store; the broadcast+pushed-
    # fetch arm is the fix under test)
    artifact = Path(_REPO, "STREAM_INGEST_NEARDUP_PROBE.json")
    existing = (
        json.loads(artifact.read_text()) if artifact.exists() else {}
    )
    if "ingest" in existing:  # flat v1 layout → relabel
        existing = {"arms": {"shuffle_join_v1": existing}}
    existing.setdefault("arms", {})[args.arm] = out
    artifact.write_text(json.dumps(existing, indent=1) + "\n")
    print(
        f"wrote STREAM_INGEST_NEARDUP_PROBE.json arm={args.arm} "
        f"all_exact={out['all_exact']}"
    )


if __name__ == "__main__":
    main()
