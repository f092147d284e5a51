#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Mirrors the reference's measurement discipline (``q4112_main.c:
113-132``: repeat each configuration 5×, log every run): each query
gets one un-timed warm-up (JIT + code cache + file listing, the
analogue of the reference's first-run page-fault warm-up) and
``BENCH_REPEATS`` timed runs; the reported figure is the median.
Execution is a noop-sink write — full pipeline runs, nothing is
collected to the driver, so the timing measures the engine and not
Arrow/driver transfer.

Output: {"metric": "bench_total_sec", "value": <sum of medians>,
"unit": "sec", "queries": {name: median_sec}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from database_join_spark.queries import load_all  # noqa: E402
from database_join_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. "sf0.1"
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.bench}
    spark = get_spark(app_name="database-join-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        _run_once(spec.fn, spark, SF_DIR)  # warm-up, untimed
        runs = [_run_once(spec.fn, spark, SF_DIR) for _ in range(REPEATS)]
        timings[name] = round(statistics.median(runs), 4)
        print(f"# {name}: {timings[name]} s {runs}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
