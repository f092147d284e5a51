#!/usr/bin/env python
"""Stream-stream interval-join throughput at volume (round 9).

STREAM_THROUGHPUT_PROBE (r08) priced the stateless / windowed-agg /
stateful-dedup pipelines; the interval join
(`streaming.click_to_purchase_join`, gated as
`stream_interval_join`) is the heaviest shipped streaming operator —
state on BOTH sides (each side buffers a watermark horizon of rows,
and every purchase probes the click buffer) — and had no volume
measurement. Same harness: one generated day-per-file event log,
availableNow → noop, micro (1 day per trigger) vs bulk (whole
backlog, one trigger).

Provider arms mirror the dedup finding and exercise the round-9
helper end-to-end: the in-memory provider runs the micro path; the
bulk path is RocksDB-only (a single trigger advances the watermark
only at the END, so BOTH sides' full backlog state is live at once
— the memory arm's skip arithmetic is recorded), and the RocksDB
arms run under `rocksdb_state_store_confs(tuned=True)` — changelog
checkpointing + sized write buffers, the engine's shipped
recommendation — with the conf set recorded in the artifact.

The generator's event types are type_0..type_4 — and its user_id is
``id % 1e6`` while type is ``id % 5``, which are perfectly
CORRELATED (1e6 ≡ 0 mod 5): every user carries exactly one type, so
a type-based click/purchase split joins NOTHING (measured rows_out 0
on the first smoke — a hollow benchmark with real state and no
matches). The pipeline therefore assigns click/purchase by an
event_id HASH draw (~20% each, independent of user), so users carry
mixed types and the join produces real matches (sink rows_out is
recorded and asserted non-zero). Second density requirement
(measured on a second hollow smoke): the generator spreads its 1e6
users across ids sequentially, so a user recurs every 1e6 events —
``events/days`` must exceed 1e6 or no user recurs within the 24 h
join window at all (the default 5e7/20 gives ~2.5 appearances per
user-day, ~9.6 h apart).
Note the arithmetic of the recorded rates: a stream-stream join
reads the SOURCE twice (one readStream per side), so `events` in
each arm is 2× the generated log and events_per_sec is
rows-read-per-second, comparable across arms but not directly with
the single-read pipelines in STREAM_THROUGHPUT_PROBE.

Usage: python scripts/stream_join_probe.py [events] [days]
       (defaults 5e7, 20)
Writes STREAM_JOIN_PROBE.json at the repo root.
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

from scripts.stream_throughput_probe import (  # noqa: E402
    gen_event_log,
    run_arm,
)


def interval_join_pipeline(stream):
    from database_join_spark import streaming as ST

    draw = F.pmod(F.xxhash64("event_id"), F.lit(5))
    mapped = stream.withColumn(
        "event_type",
        F.when(draw == 0, F.lit("click"))
        .when(draw == 1, F.lit("purchase"))
        .otherwise(F.col("event_type")),
    )
    return ST.click_to_purchase_join(mapped)


def main() -> None:
    from database_join_spark import streaming as ST
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.session import get_spark

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 50_000_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="stream-join-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rocks_confs = ST.rocksdb_state_store_confs(tuned=True)
    src_dir = tempfile.mkdtemp(prefix="stream_jp_")
    out: dict = {
        "events": n,
        "days": days,
        "pipeline": "click_to_purchase_join (stream-stream interval)",
        "rocksdb_confs": rocks_confs,
        "host_start": host_snapshot(),
        "arms": {},
    }
    try:
        t0 = time.perf_counter()
        gen_event_log(spark, n, days, src_dir)
        out["gen_sec"] = round(time.perf_counter() - t0, 1)

        def rocksdb_arm(mode: str) -> dict:
            prev = {k: spark.conf.get(k, None) for k in rocks_confs}
            for k, v in rocks_confs.items():
                spark.conf.set(k, v)
            try:
                # provider already in rocks_confs; pass None
                return run_arm(
                    spark, src_dir, interval_join_pipeline, mode,
                    "append", None,
                )
            finally:
                for k, old in prev.items():
                    if old is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, old)

        out["arms"]["join_memory_micro"] = run_arm(
            spark, src_dir, interval_join_pipeline, "micro", "append",
            None,
        )
        print(f"# join_memory_micro: {out['arms']['join_memory_micro']}",
              file=sys.stderr)
        out["arms"]["join_memory_bulk"] = {
            "skipped": (
                "a single availableNow trigger advances the watermark "
                "only at the end, so BOTH join sides buffer their "
                f"entire backlog ({n} events, ~40% retained as "
                "click/purchase state) live in one trigger - the "
                "in-JVM-memory provider cannot hold that in the "
                "default 8g heap; rocksdb is the bulk path (the "
                "dedup probe's measured arithmetic, same mechanism)"
            )
        }
        for mode in ("micro", "bulk"):
            r = rocksdb_arm(mode)
            r["host"] = host_snapshot()
            out["arms"][f"join_rocksdb_{mode}"] = r
            print(f"# join_rocksdb_{mode}: {r}", file=sys.stderr)
        for name, arm in out["arms"].items():
            if "skipped" not in arm:
                assert arm.get("rows_out", 0) > 0, (
                    f"{name}: hollow benchmark - join produced no rows"
                )
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)

    out["host_end"] = host_snapshot()
    Path(_REPO, "STREAM_JOIN_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
