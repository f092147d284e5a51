#!/usr/bin/env python
"""RocksDB state-store tuning on the micro-batch dedup arm (round 9,
VERDICT r08 #8 stretch).

STREAM_THROUGHPUT_PROBE (r08) measured the RocksDB provider's
live-path tax at 2.6× vs the in-memory provider on the 20-trigger
micro arm (260 vs 101 s at 1e8 events) — while also showing RocksDB
is the only provider that survives unbounded catch-up depth. This
probe asks how much of the 2.6× is recoverable with the provider's
own public knobs, all per-query SQL confs read at stream start:

- changelog checkpointing
  (`...rocksdb.changelogCheckpointing.enabled`): upload per-batch
  changelogs instead of full snapshots — the knob aimed exactly at
  many-trigger workloads;
- write-buffer sizing (`...rocksdb.writeBufferSizeMB` +
  `maxWriteBufferNumber`): fewer memtable flushes per batch;
- compaction on commit off is already the default; a block-cache
  arm is omitted because the dedup access pattern is write-dominant
  (every event is one get+put on a fresh key).

Arms share one JVM and one generated event log (same-session
comparability, host blocks embedded); the in-memory micro arm and
the UNTUNED RocksDB arm are re-measured in the same session as
controls, so the table stands alone without cross-day comparison to
the r08 artifact.

Usage: python scripts/rocksdb_tuning_probe.py [events] [days]
Writes ROCKSDB_TUNING_PROBE.json at the repo root.
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

from scripts.stream_throughput_probe import (  # noqa: E402
    _PROVIDER_CONF,
    _ROCKSDB,
    gen_event_log,
    run_arm,
)

_RDB = "spark.sql.streaming.stateStore.rocksdb."

#: arm -> extra confs (applied on top of the RocksDB provider; None
#: provider = in-memory control arm)
ARMS: dict[str, dict[str, str] | None] = {
    "memory_control": None,
    "rocksdb_untuned": {},
    "rocksdb_changelog": {
        _RDB + "changelogCheckpointing.enabled": "true",
    },
    "rocksdb_changelog_wb256": {
        _RDB + "changelogCheckpointing.enabled": "true",
        _RDB + "writeBufferSizeMB": "256",
        _RDB + "maxWriteBufferNumber": "4",
    },
    "rocksdb_wb256": {
        _RDB + "writeBufferSizeMB": "256",
        _RDB + "maxWriteBufferNumber": "4",
    },
}


def main() -> None:
    from database_join_spark import streaming as ST
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.session import get_spark

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="rocksdb-tuning-probe")
    spark.sparkContext.setLogLevel("ERROR")

    src_dir = tempfile.mkdtemp(prefix="rocksdb_tp_")
    out: dict = {
        "events": n,
        "days": days,
        "mode": "micro",
        "host_start": host_snapshot(),
        "arms": {},
    }
    try:
        t0 = time.perf_counter()
        gen_event_log(spark, n, days, src_dir)
        out["gen_sec"] = round(time.perf_counter() - t0, 1)
        for name, confs in ARMS.items():
            provider = None if confs is None else _ROCKSDB
            prev: dict[str, str | None] = {}
            if confs:
                for k, v in confs.items():
                    prev[k] = spark.conf.get(k, None)
                    spark.conf.set(k, v)
            try:
                r = run_arm(
                    spark,
                    src_dir,
                    ST.dedup_within_watermark,
                    "micro",
                    "append",
                    provider,
                )
            finally:
                for k, old in prev.items():
                    if old is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, old)
            r["host"] = host_snapshot()
            out["arms"][name] = r
            print(f"# {name}: {r}", file=sys.stderr)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)

    out["host_end"] = host_snapshot()
    Path(_REPO, "ROCKSDB_TUNING_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
