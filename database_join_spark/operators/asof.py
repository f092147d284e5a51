"""As-of (point-in-time) join strategies.

Spark has no built-in ASOF join (the reference has no joins beyond
equi inner at all — ``q4112_hj.c:95-133``); both strategies here are
compositions of DataFrame operators with identical semantics:

    for each left row, the single right row with the same key and the
    greatest right_time <= left_time, ties broken by the caller's
    tiebreak column (descending), inner semantics (unmatched left
    rows drop).

Two physical strategies:

- :func:`asof_join_windowed` — equi+range join on (key, time <=) then
  argmax per left row. Simple, one shuffle pair — but the pre-window
  candidate set is ALL earlier right rows per key, so a hot key with
  many left and right rows produces a quadratic pair blow-up.
- :func:`asof_join_bucketed` — the 100 TB path. Both sides bucket by
  (key, floor(time / bucket)); candidates are (a) same-bucket right
  rows (time-filtered) and (b) exactly ONE carry-forward row: the
  latest right row from any strictly earlier bucket, computed with a
  running max over the per-(key, bucket) argmax table via a range
  frame ending at -1. Fan-in per left row = right rows in one bucket
  + 1, bounded by bucket width instead of history length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _candidate_struct(right_time: str, tiebreak: str, payload: list[str]) -> Column:
    """Candidate struct ordered so that the natural struct max IS the
    as-of winner: greatest right_time, then greatest tiebreak.

    Struct comparison in Spark (and DuckDB) is lexicographic by field
    position, so ``max(struct(t, k, payload...))`` picks exactly the
    row ``ROW_NUMBER() OVER (ORDER BY t DESC, k DESC) = 1`` would —
    as a plain aggregate, with map-side partial max, no window.
    """
    return F.struct(*[F.col(c) for c in [right_time, tiebreak, *payload]])


def _bucket(time_col: str, bucket_seconds: int) -> Column:
    # floor() (not DIV) so pre-1970 timestamps bucket correctly too
    return F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(bucket_seconds)
    ).cast("long")


def asof_join_windowed(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    payload: list[str],
) -> DataFrame:
    """As-of join via range join + per-left-row argmax aggregate.

    Returns ``left.* ++ [right_time, tiebreak, *payload]`` for matched
    left rows. Left rows must be distinct (they are the group key).
    """
    cand = right.select(
        F.col(right_key).alias("__rkey"),
        _candidate_struct(right_time, tiebreak, payload).alias("__cand"),
    )
    joined = left.join(
        cand,
        (left[left_key] == cand["__rkey"])
        & (cand["__cand"][right_time] <= left[left_time]),
    ).drop("__rkey")
    best = joined.groupBy(*[left[c] for c in left.columns]).agg(
        F.max("__cand").alias("__best")
    )
    return best.select(
        *left.columns,
        *[F.col(f"__best.{f}") for f in [right_time, tiebreak, *payload]],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    payload: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """As-of join with time-bucketed candidate generation (scale path).

    Identical output contract to :func:`asof_join_windowed` (property-
    tested equal in tests/test_extras.py, including hot-key skew).

    Shuffle story at 100 TB: right shuffles once on (key, bucket) for
    the per-bucket argmax (map-side combinable), once on key for the
    carry-forward running max (state = one row per touched bucket, not
    per right row); left shuffles on (key, bucket) for the two
    candidate joins and once on its own columns for the final argmax.
    Every stage's per-group fan-in is bounded by bucket width — a hot
    user with 1e6 orders against 1e6 events generates ~1e6 + buckets
    candidate rows, not 1e12 pairs.
    """
    lb = left.withColumn("__lb", _bucket(left_time, bucket_seconds))
    rb = right.select(
        F.col(right_key).alias("__rkey"),
        _bucket(right_time, bucket_seconds).alias("__rb"),
        _candidate_struct(right_time, tiebreak, payload).alias("__cand"),
    )

    # (a) same-bucket candidates, time-filtered inside the equi join
    in_bucket = lb.join(
        rb,
        (lb[left_key] == rb["__rkey"])
        & (lb["__lb"] == rb["__rb"])
        & (rb["__cand"][right_time] <= lb[left_time]),
    ).drop("__rkey", "__rb")

    # (b) carry-forward: latest right row from strictly earlier buckets.
    # Per-(key, bucket) argmax first, then a running max over the union
    # of right buckets and (distinct) left buckets; the range frame
    # ending at -1 excludes the current bucket, whose rows case (a)
    # already considered with the exact time predicate.
    last_per_bucket = rb.groupBy("__rkey", "__rb").agg(
        F.max("__cand").alias("__cand")
    )
    probe_buckets = (
        lb.select(
            F.col(left_key).alias("__rkey"), F.col("__lb").alias("__rb")
        )
        .distinct()
        .withColumn(
            "__cand",
            F.lit(None).cast(last_per_bucket.schema["__cand"].dataType),
        )
    )
    w = (
        Window.partitionBy("__rkey")
        .orderBy("__rb")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        last_per_bucket.unionByName(probe_buckets)
        .withColumn("__prev", F.max("__cand").over(w))
        # keep the probe rows (cand NULL marks left-origin) that found
        # an earlier-bucket order
        .where(F.col("__cand").isNull() & F.col("__prev").isNotNull())
        .select("__rkey", "__rb", F.col("__prev").alias("__cand"))
    )
    carried = lb.join(
        carry,
        (lb[left_key] == carry["__rkey"]) & (lb["__lb"] == carry["__rb"]),
    ).drop("__rkey", "__rb")

    best = (
        in_bucket.unionByName(carried)
        .groupBy(*[F.col(c) for c in left.columns])
        .agg(F.max("__cand").alias("__best"))
    )
    return best.select(
        *left.columns,
        *[F.col(f"__best.{f}") for f in [right_time, tiebreak, *payload]],
    )
