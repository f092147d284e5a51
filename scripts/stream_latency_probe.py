#!/usr/bin/env python
"""Live-trigger steady-state latency probe (round 10, VERDICT r09 #7).

STREAM_THROUGHPUT_PROBE prices availableNow REPLAY (catch-up mode);
no artifact prices what a live deployment feels: steady-state
trigger-to-commit latency under a continuous processingTime trigger
with files ARRIVING while the query runs. This probe feeds the
shipped dedup pipeline (`streaming.dedup_within_watermark`, the
every-event-writes-state worst case) one file at a time on a fixed
cadence and reads the latency distribution from the progress feed.

Per arm (events-per-file = the batch size a deployment chooses by
sizing its upstream file roll):

- start the query with trigger(processingTime='500ms') into a noop
  sink, RocksDB provider + measured tuning
  (`rocksdb_state_store_confs()`, the production posture for
  unbounded-depth state);
- drop N_FILES files at FILE_INTERVAL_SEC cadence (files are
  pre-generated into a staging dir and hard-linked in, so "arrival"
  is one atomic metadata op, not a Spark write);
- from each batch's progress: ``durationMs.triggerExecution`` =
  trigger-to-commit latency, plus addBatch/commitOffsets splits and
  processedRowsPerSecond. Report p50/p95/max over the non-empty
  batches, state rows at end, and the file→first-containing-batch
  pickup lag computed from arrival timestamps vs batch timestamps.

Usage: python scripts/stream_latency_probe.py [--files 20]
       [--interval 2.0] [--quick]
Writes STREAM_LATENCY_PROBE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark import streaming as ST  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402
from scripts.stream_throughput_probe import (  # noqa: E402
    BASE_EPOCH,
    SCHEMA,
)

#: events-per-file arms: the upstream-file-roll sizes a deployment
#: actually picks between (small = latency-shaped, large =
#: throughput-shaped)
ARMS = (10_000, 100_000, 1_000_000)


def gen_day_files(spark, per_file: int, n_files: int, stage_dir: str):
    """Pre-generate one parquet file per simulated day into
    ``stage_dir`` (same event shape as the throughput probe; the
    watermark walks day by day as files arrive)."""
    for d in range(n_files):
        (
            spark.range(d * per_file, (d + 1) * per_file)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    F.lit(BASE_EPOCH + d * 86400)
                    + (F.col("id") % per_file) * 86400 / per_file
                ).alias("ts"),
                (F.col("id") % 1_000_000).alias("user_id"),
                F.concat(
                    F.lit("type_"), (F.col("id") % 5).cast("string")
                ).alias("event_type"),
                ((F.col("id") % 997) / 10.0).alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"day{d:03d}"))
        )


def _pct(vals: list[float], p: float) -> float:
    if not vals:
        return 0.0
    s = sorted(vals)
    return s[min(len(s) - 1, int(p * len(s)))]


def run_arm(spark, per_file: int, n_files: int, interval: float) -> dict:
    stage = tempfile.mkdtemp(prefix="latency_stage_")
    src = tempfile.mkdtemp(prefix="latency_src_")
    ckpt = tempfile.mkdtemp(prefix="latency_ckpt_")
    try:
        gen_day_files(spark, per_file, n_files, stage)
        prev = {
            k: spark.conf.get(k, None)
            for k in ST.rocksdb_state_store_confs()
        }
        for k, v in ST.rocksdb_state_store_confs().items():
            spark.conf.set(k, v)
        try:
            stream = ST.dedup_within_watermark(
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream.writeStream.format("noop")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="500 milliseconds")
                .start()
            )
            arrivals: list[float] = []
            expected = 0
            try:
                for d in range(n_files):
                    day = Path(stage, f"day{d:03d}")
                    part = next(day.glob("part-*.parquet"))
                    # atomic arrival: link the finished file in
                    os.link(part, Path(src, f"day{d:03d}.parquet"))
                    arrivals.append(time.time())
                    expected += per_file
                    time.sleep(interval)
                # drain: wait until every event is through
                deadline = time.time() + 600
                while time.time() < deadline:
                    seen = sum(
                        json.loads(p.json).get("numInputRows", 0)
                        for p in q.recentProgress
                    )
                    if seen >= expected:
                        break
                    time.sleep(0.5)
                progress = [json.loads(p.json) for p in q.recentProgress]
            finally:
                q.stop()
        finally:
            for k, old in prev.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)

        busy = [p for p in progress if p.get("numInputRows", 0) > 0]
        trig = [p["durationMs"]["triggerExecution"] for p in busy]
        add = [p["durationMs"].get("addBatch", 0) for p in busy]
        rates = [p["processedRowsPerSecond"] for p in busy]
        # pickup lag: file arrival → end of the batch that consumed
        # it (batches are 1 file each under maxFilesPerTrigger=1 and
        # files arrive in order, so pair k-th busy batch with k-th
        # arrival)
        lags = []
        for arr, p in zip(arrivals, busy):
            end = datetime.strptime(
                p["timestamp"], "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=timezone.utc).timestamp() + (
                p["durationMs"]["triggerExecution"] / 1000.0
            )
            lags.append(round(end - arr, 3))
        state_rows = max(
            (
                s.get("numRowsTotal", 0)
                for p in progress
                for s in p.get("stateOperators", [])
            ),
            default=0,
        )
        total = sum(p.get("numInputRows", 0) for p in busy)
        return {
            "events_per_file": per_file,
            "files": n_files,
            "events_total": total,
            "drained_all": total >= expected,
            "batches_nonempty": len(busy),
            "trigger_to_commit_ms_p50": _pct(trig, 0.5),
            "trigger_to_commit_ms_p95": _pct(trig, 0.95),
            "trigger_to_commit_ms_max": max(trig, default=0),
            "add_batch_ms_p50": _pct(add, 0.5),
            "arrival_to_commit_sec_p50": _pct(lags, 0.5),
            "arrival_to_commit_sec_p95": _pct(lags, 0.95),
            "batch_rows_per_sec_med": round(_pct(rates, 0.5)),
            "state_rows_end": state_rows,
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--interval", type=float, default=2.0)
    ap.add_argument(
        "--quick", action="store_true",
        help="5-file smoke of the smallest arm",
    )
    args = ap.parse_args()

    from database_join_spark.hostinfo import host_snapshot

    spark = get_spark(app_name="stream-latency-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # a 500ms trigger emits mostly-empty progress updates between
    # arrivals; keep them all or the drain loop's recentProgress sum
    # undercounts once the buffer rotates past 100
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")

    arms = (ARMS[0],) if args.quick else ARMS
    n_files = 5 if args.quick else args.files

    out: dict = {
        "pipeline": "dedup_within_watermark + rocksdb(tuned)",
        "trigger": "processingTime=500ms",
        "file_interval_sec": args.interval,
        "host_start": host_snapshot(),
        "arms": {},
    }
    for per_file in arms:
        res = run_arm(spark, per_file, n_files, args.interval)
        out["arms"][f"f{per_file}"] = res
        print(f"# f{per_file}: {json.dumps(res)}", file=sys.stderr)
        assert res["drained_all"], res

    out["host_end"] = host_snapshot()
    Path(_REPO, "STREAM_LATENCY_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out["arms"]))
    spark.stop()


if __name__ == "__main__":
    main()
