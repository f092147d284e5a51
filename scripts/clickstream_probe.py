#!/usr/bin/env python
"""Clickstream sessionization scale probe.

The fixture events table is 1e5 rows; this probe generates a
deterministic synthetic clickstream (default 1e7 events / 1e5 users,
codegen'd — no IO) and measures ``sessionize_frame`` end-to-end on
local[32], then EXACT-checks the result for a sample of users against
an independent numpy sessionizer over the same rows.

Event times are a pure monotone function of (user, visit index):
each user's k-th event occurs at ``k·7 min + (k div m)·1 h ±
jitter``, where m is per-user (5..17) — every m-th visit jumps an
hour (a real session break), intermediate gaps are 7 min ± 2, and
the whole structure is closed-form (no running state in the
generator, so it stays one codegen'd projection) and identical for
every run and engine.

Writes CLICKSTREAM_PROBE.json; BASELINE.md cites it.

Usage: python scripts/clickstream_probe.py [--events 10000000]
       [--users 100000] [--reps 3] [--sample-users 50]
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

GAP_US = 30 * 60 * 1_000_000
_MIX = 2654435761  # Knuth multiplicative constant (public), as datagen


def synth_events(spark, n_events: int, n_users: int):
    """(user_id, event_id, e) with deterministic gap structure."""
    from pyspark.sql import functions as F

    i = F.col("id")
    user = i % n_users
    visit = (i / n_users).cast("long")  # k-th event of this user
    m = user % 13 + 5  # per-user session length, 5..17 visits
    jitter = (i * _MIX + 11) % 240 - 120  # ±2 min, s
    e = (
        (visit * 420 + (visit / m).cast("long") * 3600 + jitter)
        * 1_000_000
    ).alias("e")
    return spark.range(n_events).select(
        user.alias("user_id"), i.alias("event_id"), e
    )


def numpy_sessions(rows):
    """Independent sessionizer: rows = [(event_id, e)] for ONE user,
    returns {session_seq: (n, first_ev, last_ev, dur_sec)}."""
    out = {}
    seq = 0
    last_e = None
    for ev, e in sorted(rows, key=lambda r: (r[1], r[0])):
        if last_e is None or e - last_e > GAP_US:
            seq += 1
            out[seq] = [0, ev, ev, e, e]  # n, first, last, start, end
        s = out[seq]
        s[0] += 1
        s[1] = min(s[1], ev)
        s[2] = max(s[2], ev)
        s[4] = e
        last_e = e
    return {
        seq: (n, f, l, (end - start) // 1_000_000)
        for seq, (n, f, l, start, end) in out.items()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sample-users", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_join_spark.queries.extras import sessionize_frame
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="clickstream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(args.events).agg(F.sum("id")).collect()  # JIT warm

    runs = []
    n_sessions = 0
    for _ in range(args.reps + 1):  # first = codegen warm-up
        ev = synth_events(spark, args.events, args.users)
        t0 = time.perf_counter()
        n_sessions = sessionize_frame(ev).count()
        runs.append(time.perf_counter() - t0)
    timed = runs[1:]
    sec = min(timed)

    # exact check on sampled users, against an independent numpy
    # sessionizer over the same generated rows
    sample = [(u * 7919) % args.users for u in range(args.sample_users)]
    ev = synth_events(spark, args.events, args.users)
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["first_event"], r["last_event"],
            r["duration_sec"],
        )
        for r in sessionize_frame(ev.filter(F.col("user_id").isin(sample)))
        .collect()
    }
    raw = ev.filter(F.col("user_id").isin(sample)).collect()
    by_user: dict[int, list] = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append((r["event_id"], r["e"]))
    want = {
        (u, seq): stats
        for u, rows in by_user.items()
        for seq, stats in numpy_sessions(rows).items()
    }
    mismatches = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}

    out = {
        "events": args.events,
        "users": args.users,
        "sec": round(sec, 4),
        "runs": [round(r, 4) for r in timed],
        "events_per_sec": round(args.events / sec),
        "n_sessions": n_sessions,
        "sampled_users": len(by_user),
        "sampled_sessions": len(want),
        "mismatches": len(mismatches),
    }
    Path(_REPO, "CLICKSTREAM_PROBE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    assert not mismatches, sorted(mismatches)[:5]
    spark.stop()


if __name__ == "__main__":
    main()
