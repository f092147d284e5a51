#!/usr/bin/env python
"""State-scale probe for the streaming gap-sessionizer (VERDICT r05
#7): replay a multi-hour event stream with a rolling active-user
population through ``sessionize_stateful(ttl_watermark="1 hour")``
and record, per micro-batch, the state store's row counts from the
query progress feed (``stateOperators[].numRowsTotal/-Updated/
-Removed``).

Claims under test — the EventTimeTimeout eviction added in round 5:
  * peak state rows PLATEAU at the concurrently-active session count
    (~2 cohorts deep under a 1-hour TTL), not at the total user
    count — a long-lived stream's state is bounded by activity;
  * planted stragglers (sessions that stay open across the whole
    span) survive every eviction wave;
  * eviction emits FINAL snapshots, so the min/max fold over the
    update-mode sink still equals the batch sessionizer
    (queries/extras.sessionize_frame) on the identical events —
    batch≡stream parity WITH TTL, given no beyond-watermark lateness
    (the documented TTL trade).

Synthetic stream: USERS users in COHORTS hourly cohorts (cohort c
active only during hour c, EV_PER_USER events 10 s apart → exactly
one session each); STRAGGLERS users additionally fire every 20 min
through all hours (one long session each; 20 min < the 30-min gap).
One parquet file per hour + maxFilesPerTrigger=1 → one micro-batch
per hour, so the watermark walks forward hour by hour exactly as a
live stream's would.

Usage: python scripts/session_state_probe.py [events] (default 1e7)
Writes SESSION_STATE_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from database_join_spark import streaming as ST  # noqa: E402
from database_join_spark.queries.extras import sessionize_frame  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402

COHORTS = 10
STRAGGLERS = 10
#: straggler cadence: 20 min < the 30-min session gap → one session
STRAG_PERIOD_S = 1200
STRAG_PER_HOUR = 3600 // STRAG_PERIOD_S
#: 2024-01-01 00:00 UTC. NOT zero: a row whose event time equals the
#: INITIAL watermark (epoch 0) is dropped by the late-row filter —
#: a degenerate boundary this probe must not sit on.
BASE_EPOCH = 1_704_067_200


def cohort_events(spark, c: int, cohort_users: int, ev_per_user: int):
    """Hour-c events: cohort c's users (10 s cadence) + stragglers
    (20 min cadence). event_id = user_id * 1e6 + global seq index."""
    base = F.lit(BASE_EPOCH + c * 3600)
    cohort = spark.range(cohort_users * ev_per_user).select(
        (F.lit(c * cohort_users) + F.col("id") % cohort_users).alias("uid"),
        (F.col("id") / cohort_users).cast("long").alias("j"),
    ).select(
        (F.col("uid") * 1_000_000 + F.col("j")).alias("event_id"),
        F.timestamp_seconds(base + F.col("j") * 10).alias("ts"),
        F.col("uid").alias("user_id"),
    )
    # stragglers live in user-id space above every cohort
    strag = spark.range(STRAGGLERS * STRAG_PER_HOUR).select(
        (F.lit(10_000_000) + F.col("id") % STRAGGLERS).alias("uid"),
        (F.col("id") / STRAGGLERS).cast("long").alias("j"),
    ).select(
        (
            F.col("uid") * 1_000_000
            + F.lit(c * STRAG_PER_HOUR)
            + F.col("j")
        ).alias("event_id"),
        F.timestamp_seconds(
            base + F.col("j") * STRAG_PERIOD_S
        ).alias("ts"),
        F.col("uid").alias("user_id"),
    )
    return cohort.unionAll(strag)


def main() -> None:
    total_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    # split events across cohorts; 100 events/user fixes users/cohort
    ev_per_user = 100
    cohort_users = max(total_events // (COHORTS * ev_per_user), 1)
    users = COHORTS * cohort_users + STRAGGLERS

    spark = get_spark(app_name="session-state-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="session_state_probe_"))
    src = work / "src"
    src.mkdir()
    out = str(work / "out")
    ckpt = str(work / "ckpt")

    t0 = time.perf_counter()
    for c in range(COHORTS):
        cohort_events(spark, c, cohort_users, ev_per_user).coalesce(
            4
        ).write.parquet(str(src / f"h{c:02d}"))
    gen_sec = time.perf_counter() - t0

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .option("maxFilesPerTrigger", 4)  # ≈ one cohort per batch
        .parquet(f"{src}/*")
    )
    t0 = time.perf_counter()
    q = (
        ST.sessionize_stateful(stream, ttl_watermark="1 hour")
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    stream_sec = time.perf_counter() - t0

    per_batch = []
    for p in progress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        per_batch.append(
            {
                "batch": p["batchId"],
                "input_rows": p.get("numInputRows"),
                "state_rows": ops[0].get("numRowsTotal"),
                "updated": ops[0].get("numRowsUpdated"),
                "removed": ops[0].get("numRowsRemoved"),
            }
        )
    peak = max(b["state_rows"] for b in per_batch)
    removed = sum(b["removed"] or 0 for b in per_batch)

    # -- parity: min/max fold over the update sink == batch recursion
    t0 = time.perf_counter()
    got = (
        spark.read.parquet(out)
        .groupBy("user_id", "session_seq")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_event").alias("first_event"),
            F.max("last_event").alias("last_event"),
            F.max("duration_sec").alias("duration_sec"),
        )
    )
    ev_all = spark.read.parquet(f"{src}/*").select(
        "user_id", "event_id", F.unix_micros("ts").alias("e")
    )
    want = sessionize_frame(ev_all)
    cols = sorted(set(got.columns) & set(want.columns))
    diff = (
        got.select(cols).exceptAll(want.select(cols)).count()
        + want.select(cols).exceptAll(got.select(cols)).count()
    )
    strag_rows = (
        got.filter(F.col("user_id") >= 10_000_000)
        .select("session_seq", "n_events")
        .collect()
    )
    parity_sec = time.perf_counter() - t0

    payload = {
        "events": total_events,
        "users": users,
        "cohorts": COHORTS,
        "cohort_users": cohort_users,
        "stragglers": STRAGGLERS,
        "ttl_watermark": "1 hour",
        "gen_sec": round(gen_sec, 1),
        "stream_sec": round(stream_sec, 1),
        "events_per_sec": round(total_events / stream_sec),
        "per_batch": per_batch,
        "peak_state_rows": peak,
        "total_removed": removed,
        "peak_over_total_users": round(peak / users, 4),
        "parity_diff_rows": diff,
        "straggler_sessions_ok": all(
            r["session_seq"] == 1 and r["n_events"] == COHORTS * STRAG_PER_HOUR
            for r in strag_rows
        )
        and len(strag_rows) == STRAGGLERS,
        "parity_check_sec": round(parity_sec, 1),
    }
    Path(_REPO, "SESSION_STATE_PROBE.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in payload.items() if k != "per_batch"}))
    for b in per_batch:
        print(f"# batch {b['batch']}: in={b['input_rows']} "
              f"state={b['state_rows']} upd={b['updated']} "
              f"rm={b['removed']}", file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
