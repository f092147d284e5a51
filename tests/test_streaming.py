"""Batch ≡ stream equivalence proofs for the Structured Streaming
forms (SURVEY §5.2 risk 5: streaming state has no SQL oracle — replay
the finite fixture to completion and demand the batch answer)."""

from __future__ import annotations

import pandas as pd

from database_join_spark import streaming as ST
from database_join_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(by=cols, kind="mergesort")
        .reset_index(drop=True)
    )


def test_tumbling_stream_equals_batch(spark):
    batch = _sorted(REGISTRY["stream_tumbling"].fn(spark, SF_DIR).toPandas())
    ST.run_to_completion(
        ST.tumbling_counts(ST.events_stream(spark, SF_DIR)), "t_tumbling"
    )
    stream = _sorted(spark.table("t_tumbling").toPandas())
    pd.testing.assert_frame_equal(batch, stream)


def test_session_stream_equals_batch(spark):
    batch = _sorted(REGISTRY["stream_session"].fn(spark, SF_DIR).toPandas())
    ST.run_to_completion(
        ST.session_counts(ST.events_stream(spark, SF_DIR)), "t_session"
    )
    stream = _sorted(spark.table("t_session").toPandas())
    pd.testing.assert_frame_equal(batch, stream)


def test_streaming_dedup_keeps_distinct_ids(spark):
    ST.run_to_completion(
        ST.dedup_within_watermark(ST.events_stream(spark, SF_DIR)),
        "t_dedup",
        output_mode="append",
    )
    got = spark.table("t_dedup").count()
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert got == want


def test_stateful_running_totals(spark):
    """After replaying the whole stream, the per-user running totals
    must equal the batch group-by (update mode emits one final row
    per user per micro-batch; the last one carries the total)."""
    ST.run_to_completion(
        ST.running_user_totals(ST.events_stream(spark, SF_DIR)),
        "t_state",
        output_mode="update",
    )
    got = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg({"n_events": "max"})
        .withColumnRenamed("max(n_events)", "n_events")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_events")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events"]], want[["user_id", "n_events"]]
    )
