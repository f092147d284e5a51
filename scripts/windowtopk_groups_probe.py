#!/usr/bin/env python
"""window_rank_topk spelling probe at high group counts (round 14,
VERDICT r13 #5): does a pre-aggregated top-k-per-group beat the
ranking window once groups reach 1e6–1e7?

The shipped spelling is row_number() over (partition by key order by
price desc, tiebreak) filtered to rnk ≤ 3 — Spark ≥3.5 plants a
WindowGroupLimit below the exchange, so each map task ships only its
local top-3 per group (the distributed top-k pattern). The candidate
is the aggregate spelling: groupBy(key) + array_sort(collect_list)
sliced to 3, exploded back with positions. Its partial aggregation
collects EVERY group row map-side (no top-k pruning exists for
collect_list), so first principles say it ships more and sorts
per-group arrays in the agg; the window needs one partition-wide
sort but prunes map-side. This probe measures both at n=2e7 rows ×
g ∈ {1e6, 1e7} groups, asserts identical results, and the winner
keeps the query.

Usage: python scripts/windowtopk_groups_probe.py [--rows 20000000]
Writes WINDOWTOPK_GROUPS_PROBE.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TOPK = 3


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--groups", default="1000000,10000000")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="windowtopk-groups-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def data(n: int, g: int):
        # deterministic synthetic lineitem-alike: key ~ supplier,
        # price/okey/lnum from xxhash64 (no RNG, retry-safe)
        return spark.range(n).select(
            F.expr(f"id % {g}").alias("key"),
            F.expr("pmod(xxhash64(id, 1), 1000000)").alias("price"),
            F.expr("pmod(xxhash64(id, 2), 100000000)").alias("okey"),
            F.expr("CAST(pmod(id, 7) AS INT)").alias("lnum"),
        )

    def window_arm(df):
        w = Window.partitionBy("key").orderBy(
            F.col("price").desc(), F.col("okey"), F.col("lnum")
        )
        return (
            df.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= TOPK)
            .select("key", "rnk", "okey", "lnum", "price")
        )

    def agg_arm(df):
        # struct sorts field-by-field ascending: negate price for the
        # DESC ordering; posexplode recovers rnk = position + 1
        return (
            df.groupBy("key")
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("price")).alias("np"),
                                F.col("okey"),
                                F.col("lnum"),
                            )
                        )
                    ),
                    1,
                    TOPK,
                ).alias("top")
            )
            .select("key", F.posexplode("top").alias("pos", "t"))
            .select(
                "key",
                (F.col("pos") + 1).cast("long").alias("rnk"),
                F.col("t.okey").alias("okey"),
                F.col("t.lnum").alias("lnum"),
                (-F.col("t.np")).alias("price"),
            )
        )

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict = {
        "rows": args.rows,
        "topk": TOPK,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "points": {},
    }
    for g in [int(x) for x in args.groups.split(",")]:
        df = data(args.rows, g)
        w_df, a_df = window_arm(df), agg_arm(df)
        # identity check on a deterministic sample of groups (full
        # collect at 1e7 groups × 3 = 3e7 rows is driver-hostile):
        # hash-compare aggregated per-arm checksums computed IN SPARK
        def checksum(frame):
            return frame.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64("key", "rnk", "okey", "lnum", "price")
                ).alias("h"),
            ).collect()[0]

        cw, ca = checksum(w_df), checksum(a_df)
        assert (cw.n, cw.h) == (ca.n, ca.h), (g, cw, ca)
        runs = {"window": [], "agg_topk": []}
        noop(w_df)
        noop(a_df)
        for _ in range(args.reps):
            runs["window"].append(noop(window_arm(data(args.rows, g))))
            runs["agg_topk"].append(noop(agg_arm(data(args.rows, g))))
        rec = {
            "groups": g,
            "result_rows": int(cw.n),
            "identical_checksum": True,
            "median_window_sec": round(
                statistics.median(runs["window"]), 2
            ),
            "median_agg_sec": round(
                statistics.median(runs["agg_topk"]), 2
            ),
            "runs": {
                k: [round(x, 2) for x in v] for k, v in runs.items()
            },
        }
        rec["window_speedup_vs_agg"] = round(
            rec["median_agg_sec"] / rec["median_window_sec"], 3
        )
        out["points"][str(g)] = rec
        print(json.dumps(rec))
    out["host_end"] = host_snapshot()
    Path(_REPO, "WINDOWTOPK_GROUPS_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
