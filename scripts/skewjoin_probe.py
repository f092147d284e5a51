#!/usr/bin/env python
"""JOIN-side skew: AQE skew-join vs manual salting vs no fix (round 9).

The engine ships `operators/skew.salted_join` (replicate-and-salt,
gated as `join_salted`) and the session enables
`spark.sql.adaptive.skewJoin` — but the repo has never measured the
two against each other at volume, which is the decision a deployment
actually faces: AQE splits a skewed shuffle partition at runtime for
free (no dim replication), so when does the manual salt earn its
|dim|·salts expansion at all?

Arms (one JVM, same generated frames, host snapshots embedded;
answers asserted identical across all skewed arms):

- ``uniform_control`` — the same join with no heavy hitter: the
  no-skew floor, prices the skew tax of every other arm.
- ``smj_noskewfix``   — heavy-hitter fact (with payload column),
  AQE skew-join OFF: the straggler baseline (one task sorts/joins
  the whole hot key).
- ``aqe_skewjoin``    — same plan, skew-join ON (default
  thresholds); the executed plan is checked for the ``skew=true``
  marker so the arm proves whether the split actually fired.
- ``aqe_skewjoin_tuned`` — skew-join ON with the detection gates
  opened: threshold 16m, ``skewedPartitionFactor`` 2.0 (vs default
  5.0), advisory split target 16m. The factor is the load-bearing
  knob, and the reason is structural (bisected at 1e8 rows:
  factor 5 and 3 never fire, 2 fires): detection compares
  COMPRESSED partition bytes, and the hot partition's join key is
  CONSTANT within it by definition — it lz4-compresses better per
  row than the uniform partitions, so an ~11× row skew surfaces as
  only ~2–3× in bytes. Byte-factor detection systematically
  underestimates row skew on exactly the partitions it exists to
  catch.
- ``salted``          — `salted_join(salts=8)`, skew-join OFF: the
  manual fix in isolation, paying dim×8 replication; the payload
  column gives the default row-hash salt its entropy.
- ``bare_*`` twins    — the fact stripped to its 8-byte join key,
  the first full run's accidental shape, kept deliberately for two
  recorded cliffs: (1) the constant hot key lz4-collapses to
  byte-nothing, so the DEFAULT gates are doubly blind to it (the
  16m/factor-5 arm of the first run never fired); the measured
  factor-2 gates DO fire on it — the factor gate, not byte
  detection as such, is the blindness. (2) `salted_join`'s default
  row-hash salt — xxhash64 of all fact columns — is CONSTANT per
  key when the key is the only column, so it disperses nothing,
  still pays dim replication, and measures WORSE than no fix at
  all; documented on the operator.

Shape: fact rows with key ~ heavy-hitter(p) over a 1e7-key dim
(too large to broadcast — the skewed-SMJ regime; AQE's skew split
only applies to sort-merge / shuffled-hash joins). The aggregate
after the join is a bare sum+count so the join dominates and the
answer is exact int64 (bounded by rows·dim_id_max < 2^62).

Usage: python scripts/skewjoin_probe.py [--rows 400000000]
       [--dim 10000000] [--hot-p 0.25] [--reps 2] [--quick]
Writes SKEWJOIN_PROBE.json at the repo root.
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

_SKEW_CONF = "spark.sql.adaptive.skewJoin.enabled"
_THRESH_CONF = (
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
)
_FACTOR_CONF = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
_ADVISORY_CONF = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def frames(spark, rows: int, dim_rows: int, hot_p: float):
    """Deterministic fact/dim pair: fact key is the hot key 0 with
    probability ``hot_p`` (xxhash64 draw, the datagen idiom), else
    uniform over the dim id space; dim carries its id as the value
    so the joined sum is independently checkable. The fact KEEPS its
    row id as a payload column (``pid``) — real fact rows carry
    payload, which matters twice here: it gives the hot shuffle
    partition bytes AQE's detector can see, and it gives
    `salted_join`'s default row-hash salt entropy beyond the join
    key (a key-only fact row makes that salt CONSTANT on the hot
    key — the documented trap the ``bare_*`` arms measure)."""
    from pyspark.sql import functions as F

    den = 1_000_000
    hot_num = int(hot_p * den)
    fact = spark.range(rows).select(
        F.col("id").alias("pid"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(den)) < hot_num,
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(dim_rows)))
        .alias("key"),
    )
    dim = spark.range(dim_rows).select(
        F.col("id").alias("key"), F.col("id").alias("dval")
    )
    return fact, dim


def _join_strategy(plan: str) -> str:
    for s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        if s in plan:
            return s
    return "other"


def run_arm(spark, joined_df) -> tuple[float, tuple, str]:
    """Time one materialization; return (sec, answer, executed plan)."""
    from pyspark.sql import functions as F

    agg = joined_df.agg(
        F.sum("dval").alias("s"), F.count(F.lit(1)).alias("n")
    )
    t0 = time.perf_counter()
    row = agg.collect()[0]
    sec = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return sec, (row["s"], row["n"]), plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000_000)
    ap.add_argument("--dim", type=int, default=10_000_000)
    ap.add_argument("--hot-p", type=float, default=0.25)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--quick", action="store_true",
        help="1e7-row smoke of the full harness",
    )
    args = ap.parse_args()
    rows = 10_000_000 if args.quick else args.rows
    dim_rows = 1_000_000 if args.quick else args.dim

    import os

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators.skew import salted_join
    from database_join_spark.session import get_spark

    # The no-fix straggler sorts the whole 1e8-row hot partition in
    # ONE task while 31 siblings hold their own sort buffers; the
    # default 8g heap OOMed in the salted arm of the first full run.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="skewjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")

    fact, dim = frames(spark, rows, dim_rows, args.hot_p)
    uni_fact, _ = frames(spark, rows, dim_rows, 0.0)
    fact_bare = fact.select("key")  # key-only rows: the first full
    # run's shape — pathologically compressible hot partition

    def plain(f):
        return f.join(dim, on="key")

    tuned = {
        _SKEW_CONF: "true",
        _THRESH_CONF: "16m",
        _FACTOR_CONF: "2.0",
        _ADVISORY_CONF: "16m",
    }
    arms = {
        "uniform_control": (lambda: plain(uni_fact), {_SKEW_CONF: "false"}),
        "smj_noskewfix": (lambda: plain(fact), {_SKEW_CONF: "false"}),
        "aqe_skewjoin": (lambda: plain(fact), {_SKEW_CONF: "true"}),
        "aqe_skewjoin_tuned": (lambda: plain(fact), tuned),
        "salted": (
            lambda: salted_join(fact, dim, "key", salts=args.salts),
            {_SKEW_CONF: "false"},
        ),
        # key-only fact rows: lz4 collapses the constant hot key to
        # byte-nothing, so byte-based skew detection cannot see it
        # at ANY sane threshold — recorded as its own pair
        "bare_noskewfix": (
            lambda: plain(fact_bare),
            {_SKEW_CONF: "false"},
        ),
        "bare_aqe_tuned": (lambda: plain(fact_bare), tuned),
        "bare_salted_rowhash": (
            # the doc trap: a key-only fact makes the default
            # row-hash salt CONSTANT per key — no dispersion, full
            # dim-replication cost
            lambda: salted_join(fact_bare, dim, "key", salts=args.salts),
            {_SKEW_CONF: "false"},
        ),
    }

    out: dict = {
        "rows": rows,
        "dim_rows": dim_rows,
        "hot_p": args.hot_p,
        "salts": args.salts,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "arms": {},
    }
    answers: dict[str, tuple] = {}
    for name, (mk, confs) in arms.items():
        prev = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            runs, plan, ans = [], "", None
            for _ in range(args.reps):
                sec, ans, plan = run_arm(spark, mk())
                runs.append(round(sec, 2))
        finally:
            for k, old in prev.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        answers[name] = ans
        out["arms"][name] = {
            "wall_sec": min(runs),
            "runs": runs,
            "confs": confs,
            "join_strategy": _join_strategy(plan),
            "skew_split_fired": "skew=true" in plan,
            "host": host_snapshot(),
        }
        print(f"# {name}: {out['arms'][name]}", file=sys.stderr)

    # all skewed arms must agree exactly (uniform control differs
    # by construction — different key draw)
    skewed = {k: v for k, v in answers.items() if k != "uniform_control"}
    assert len(set(skewed.values())) == 1, skewed
    out["answer_sum_count"] = list(answers["smj_noskewfix"])
    out["answers_identical"] = True
    out["host_end"] = host_snapshot()

    path = Path(_REPO, "SKEWJOIN_PROBE.json")
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
