"""Structured Streaming forms of the windowed operators (#31–#32) and
custom stateful processing (#33's applyInPandasWithState surface).

The batch-equivalent forms in ``queries/streaming.py`` carry the
DuckDB oracles; this module carries the real ``readStream`` pipelines
with watermarks. tests/test_streaming.py proves batch ≡ stream on the
fixtures (replay-to-completion with an ``availableNow`` trigger), the
only sound oracle for streaming state (SURVEY §5.2 risk 5).

Scale notes: event-time windows + watermarks bound state size by the
lateness horizon, not stream length; session windows merge in the
state store; ``dropDuplicatesWithinWatermark`` keeps only the id set
inside the horizon. All state lives in the checkpointed state store,
partitioned by the grouping key — the streaming analogue of the
reference's per-thread aggregation caches (q4112.c:225-237).
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from database_join_spark.session import configure_session

#: Decimal-stable sum (FIXTURES.md rule 2), same spelling as batch.
_VSUM = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"

#: events.parquet physical schema: ts is INT64 nanos (TESTDATA.md);
#: streaming reads need an explicit schema, so we declare the nanos
#: column as LONG and rebuild a µs timestamp exactly like
#: catalog.table does for batch.
EVENTS_PHYSICAL_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-source stream (one-file replay).

    ``readStream.parquet`` over the fixture directory is the
    file-source pattern: at production scale the same code tails a
    bucket/directory as files land.
    """
    configure_session(spark)  # nanosAsLong et al. (RUNTIME_CONFS)
    # The file source wants a directory; the fixture is a single file,
    # so stream the directory with a glob pinned to it.
    return (
        spark.readStream.schema(EVENTS_PHYSICAL_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    )


def tumbling_counts(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming twin of queries.streaming.stream_tumbling."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(_VSUM).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "12 hours") -> DataFrame:
    """Streaming twin of queries.streaming.stream_session (session
    windows merge incrementally in the state store)."""
    return (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(_VSUM).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(stream: DataFrame) -> DataFrame:
    """Stateful streaming dedup on event_id, state bounded by the
    watermark horizon (#32's late-data surface)."""
    return stream.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_to_purchase_join(stream: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding 24 h.

    Both sides carry watermarks and the join condition bounds the
    event-time distance, so the state store can expire rows once the
    watermark passes the interval — the requirement that makes
    stream-stream joins tractable (unbounded state otherwise). The
    batch twin is the identical join on the static frame
    (tests/test_streaming.py proves equivalence).
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 day")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 day")
    )
    return purchases.join(
        clicks,
        F.expr(
            """
            p_user = c_user AND
            click_ts <= purchase_ts AND
            click_ts > purchase_ts - INTERVAL 24 HOURS
            """
        ),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-user running event count + value total across micro-batches.

    This is the arbitrary-state escape hatch (#33) — the semantics
    (monotone running totals per key) are NOT expressible as a
    windowed agg. State is one (count, sum) pair per user, updated
    per micro-batch; a production job would set a timeout to expire
    idle keys.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_totals_foreach_batch(
    stream: DataFrame, target_dir: str, checkpoint_dir: str
) -> None:
    """``foreachBatch`` sink: maintain per-user running totals in a
    parquet target by merging each micro-batch (read-modify-write
    keyed upsert — the pattern behind every 'streaming MERGE INTO'
    when no transactional table format is present).

    Each batch: aggregate the batch, full-outer-merge with the
    current target by key, atomically replace the target (write to a
    versioned subdir then repoint would be the production spelling;
    a direct overwrite into a staging+rename keeps this example
    dependency-free). State lives in the TARGET, not the state
    store — restarts resume from the checkpoint + last target.
    """
    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_totals = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        try:
            current = spark.read.parquet(target_dir)
            merged = (
                current.unionByName(batch_totals)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        except Exception:  # first batch: no target yet
            merged = batch_totals
        # materialize BEFORE overwriting the directory being read
        staged = merged.collect()
        spark.createDataFrame(
            staged, "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
        ).coalesce(1).write.mode("overwrite").parquet(target_dir)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()


def run_to_completion(
    sdf: DataFrame,
    table_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> None:
    """Replay the whole (finite) stream with an availableNow trigger
    into an in-memory sink — the batch≡stream proof harness.

    Pass a persistent ``checkpoint_dir`` to carry state (watermarks,
    aggregation/session state, seen files) across calls — that is how
    the late-data tests advance the watermark between micro-batches
    deterministically.
    """

    def _run(ckpt: str) -> None:
        q = (
            sdf.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    if checkpoint_dir is not None:
        _run(checkpoint_dir)
    else:
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            _run(ckpt)
