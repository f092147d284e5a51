#!/usr/bin/env python
"""The exchange-sizing rule firing AUTOMATICALLY in product code
(round 12, closing VERDICT r11 #2/#4's done-clause).

Round 11 calibrated ``plans.sizing.shuffle_partitions_for`` and the
scale sweep applied it BY HAND (env var into the child JVM). Round
12 wired it through the statistics catalog into the heavy registry
operators (``queries/pipeline._size_exchanges``: cached parquet-
footer row count × ~93 exchange rows/doc). This probe proves the
wiring end to end with ZERO hand configuration: it materializes a
1M-doc ``documents.parquet`` under a scratch sf_dir, then calls the
REGISTRY's ``dedup_substring_hashed`` exactly as the driver would —
``REGISTRY[id].fn(spark, sf_dir)`` — on a session left at the
default partition count, and records:

- ``spark.sql.shuffle.partitions`` before the call (the session
  default = cores) and after (what the operator set for itself);
- the planner's own prediction for the table (the assert: they must
  be equal — the conf came from the rule, not coincidence);
- that the rowcount statistic landed in the catalog (second build is
  a cache hit);
- the operator's wall and output mass at 1M docs — the shape the
  rule exists for (93M window rows; fixed-32 measured 1.5× in
  PIPELINE_SCALE_PROBE).

Usage: python scripts/sized_exchange_probe.py [--n 1000000] [--quick]
Writes SIZED_EXCHANGE_PROBE.json at the repo root.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--quick", action="store_true", help="100k smoke")
    args = ap.parse_args()
    n = 100_000 if args.quick else args.n

    from pyspark.sql import functions as F

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.plans.sizing import shuffle_partitions_for
    from database_join_spark.plans.stats import (
        cached_statistic,
        parquet_table_key,
    )
    from database_join_spark.plans.stats import (
        mean_tokens_per_doc_cached,
    )
    from database_join_spark.queries import load_all
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="sized-exchange-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    sf_dir = tempfile.mkdtemp(prefix="sized_exchange_sf_")
    # ~100-token docs (the calibration geometry): one parquet table
    # shaped like the fixtures' documents table
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.lit("web").alias("source"),
            F.expr(
                "array_join(transform(sequence(0, 99), "
                "i -> concat('w', pmod(xxhash64(id, i), 50000))), ' ')"
            ).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(f"{sf_dir}/documents.parquet")
    )

    # Round 13: the multiplier is MEASURED per table version (mean
    # tokens/doc from a sampled scan, VERDICT r12 #3) — the probe
    # predicts with the same catalog statistic the operator reads.
    rows_per_doc, _hit = mean_tokens_per_doc_cached(
        spark, f"{sf_dir}/documents.parquet"
    )
    out: dict = {
        "n_docs": n,
        "cores": cores,
        "rows_per_doc_estimate": rows_per_doc,
        "host_start": host_snapshot(),
    }
    predicted = shuffle_partitions_for(
        int(n * rows_per_doc), cores
    )
    out["planner_predicted_partitions"] = predicted

    # session at the default; the operator must turn the knob itself
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))
    out["conf_before"] = int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    registry = load_all()
    t0 = time.perf_counter()
    df = registry["dedup_substring_hashed"].fn(spark, sf_dir)
    out["conf_after_build"] = int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    rows = df.count()
    out["wall_sec"] = round(time.perf_counter() - t0, 2)
    out["span_rows"] = rows

    # the conf the operator set must BE the planner's number
    out["rule_fired"] = bool(out["conf_after_build"] == predicted)
    # and the statistic must now be catalog-cached (no recompute)
    _, hit = cached_statistic(
        parquet_table_key(f"{sf_dir}/documents.parquet"),
        "rowcount",
        lambda: -1,
    )
    out["rowcount_cached"] = bool(hit)

    out["host_end"] = host_snapshot()
    out["ok"] = bool(out["rule_fired"] and out["rowcount_cached"])
    Path(_REPO, "SIZED_EXCHANGE_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(
        json.dumps(
            {
                k: out[k]
                for k in (
                    "n_docs",
                    "conf_before",
                    "conf_after_build",
                    "planner_predicted_partitions",
                    "rule_fired",
                    "rowcount_cached",
                    "wall_sec",
                    "span_rows",
                    "ok",
                )
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
