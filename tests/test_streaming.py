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


def test_streaming_dedup_rocksdb_provider_matches_default(spark):
    """The RocksDB state-store provider is the documented bulk /
    unbounded-catch-up path (STREAM_THROUGHPUT_PROBE.json: the
    in-memory provider cannot hold a single-trigger backlog's dedup
    state; RocksDB ran it holding all 1e8 rows). Pin at fixture
    scale that the provider swap — under the FULL tuned conf set the
    engine recommends (`rocksdb_state_store_confs()`: changelog
    checkpointing + sized write buffers, ROCKSDB_TUNING_PROBE.json's
    winning arm) — is result-IDENTICAL for the exact shipped
    pipeline, so neither the provider path nor the tuning can rot."""
    confs = ST.rocksdb_state_store_confs(tuned=True)
    assert confs["spark.sql.streaming.stateStore.providerClass"] == (
        ST.ROCKSDB_PROVIDER
    )
    assert (
        confs[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ]
        == "true"
    )
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        ST.run_to_completion(
            ST.dedup_within_watermark(ST.events_stream(spark, SF_DIR)),
            "t_dedup_rocks",
            output_mode="append",
        )
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    got = _sorted(spark.table("t_dedup_rocks").toPandas())
    want = _sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .dropDuplicates(["event_id"])
        .toPandas()
    )
    # row SET equality on event_id (either copy of a duplicate may
    # survive; the fixture's duplicates are exact copies anyway)
    assert list(got["event_id"]) == list(want["event_id"])
    assert len(got) == len(want)


def test_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream interval join must equal the
    same join on the static frame when the finite stream replays to
    completion."""
    from pyspark.sql import functions as F

    ST.run_to_completion(
        ST.click_to_purchase_join(ST.events_stream(spark, SF_DIR)),
        "t_ssj",
        output_mode="append",
    )
    stream = _sorted(spark.table("t_ssj").toPandas())
    from database_join_spark.catalog import table as _table

    ev = _table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = _sorted(
        purchases.join(
            clicks,
            F.expr(
                "p_user = c_user AND click_ts <= purchase_ts "
                "AND click_ts > purchase_ts - INTERVAL 24 HOURS"
            ),
        )
        .select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(batch, stream)


def test_watermark_drops_late_data(spark, tmp_path):
    """Planted late-data scenario: an event older than the watermark
    horizon arriving in a later micro-batch must be dropped, and its
    window must never be emitted in append mode.

    Three runs share one checkpoint so the watermark advances
    BETWEEN batches (state lives in the checkpoint): run 1 sets the
    watermark to 10:00, run 2 delivers an 08:30 straggler (dropped:
    2.5 h beyond the 1 h horizon) plus 11:30, run 3's 13:30 event
    pushes the watermark past every window so append mode emits them.
    """
    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(subdir: str, rows: list[tuple[int, str]]) -> None:
        spark.createDataFrame(rows, "event_id INT, ts_s STRING").select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).coalesce(1).write.parquet(str(src / subdir))

    def stream_df():
        return (
            spark.readStream.schema("event_id INT, ts TIMESTAMP")
            .parquet(f"{src}/*")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

    out = str(tmp_path / "out")

    def run_and_collect():
        # memory sink can't recover from a checkpoint; the parquet
        # sink can, and append mode only writes finalized windows
        q = (
            stream_df()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    def results() -> dict[str, int]:
        df = spark.read.schema("ws TIMESTAMP, n BIGINT").parquet(out)
        return {str(r["ws"]): r["n"] for r in df.collect()}

    write_batch("a", [(1, "2024-01-01 10:05:00"),
                      (2, "2024-01-01 10:55:00"),
                      (3, "2024-01-01 11:00:00")])
    run_and_collect()  # watermark → 10:00
    write_batch("b", [(4, "2024-01-01 08:30:00"),   # late → dropped
                      (5, "2024-01-01 11:30:00")])
    run_and_collect()  # watermark → 10:30
    write_batch("c", [(6, "2024-01-01 13:30:00")])
    run_and_collect()  # watermark → 12:30, emits closed windows

    got = results()
    assert "2024-01-01 08:00:00" not in got, got
    assert got.get("2024-01-01 10:00:00") == 2, got
    assert got.get("2024-01-01 11:00:00") == 2, got


def test_corpus_ingest_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming ingest front of the corpus pipeline (round 11):
    quality gate + cross-batch exact dedup must admit exactly one doc
    per unique GATED fingerprint, first arrival winning across
    micro-batches. The fingerprint set is the parity key against the
    batch replay — which doc_id of a same-batch duplicate pair
    survives is arrival order, so doc_ids are asserted only where
    batching makes them deterministic (the cross-batch loser)."""
    import time as _time

    from database_join_spark.operators import text as T

    long_a = " ".join(f"a{i}" for i in range(30))
    long_b = " ".join(f"b{i}" for i in range(30))
    long_c = " ".join(f"c{i}" for i in range(30))
    src = tmp_path / "docs_src"
    src.mkdir()

    def write_day(sub: str, rows: list[tuple[int, str]]) -> None:
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING"
        ).coalesce(1).write.parquet(str(src / sub))
        _time.sleep(1.1)  # file-source batches order by mod time

    write_day("d0", [(1, long_a), (2, long_a),     # same-batch dup
                     (3, long_b), (4, "too short")])
    write_day("d1", [(5, long_a),                  # cross-batch dup
                     (6, long_c)])

    out = str(tmp_path / "ingested")
    q = (
        ST.corpus_ingest_dedup(
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 4 not in admitted                  # quality-gated
    assert 5 not in admitted                  # cross-batch duplicate
    assert {3, 6} <= admitted                 # unique docs admitted
    assert len(admitted & {1, 2}) == 1        # one same-batch survivor
    assert len(admitted) == 3
    # fingerprint parity with the batch replay: gate → distinct fp
    batch_fps = {
        r.fp
        for r in spark.read.parquet(f"{src}/*")
        .withColumn("n_tokens", T.token_count("text"))
        .filter("n_tokens >= 20")
        .select(T.fingerprint("text").alias("fp"))
        .distinct()
        .collect()
    }
    stream_fps = {
        r.fp for r in spark.read.parquet(out).select("fp").collect()
    }
    assert stream_fps == batch_fps


def test_foreach_batch_upsert_equals_batch(spark, tmp_path):
    """The foreachBatch keyed-upsert sink must converge to the batch
    group-by after replaying the finite stream."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt_fb")
    ST.upsert_totals_foreach_batch(
        ST.events_stream(spark, SF_DIR), target, ckpt
    )
    got = _sorted(ST.read_upsert_target(spark, target).toPandas())
    want = _sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)

    # at-least-once replay: a FRESH checkpoint re-delivers the whole
    # stream as batch 0 again; the committed-version guard must skip
    # it instead of double-counting (ADVICE r01)
    ST.upsert_totals_foreach_batch(
        ST.events_stream(spark, SF_DIR), target, str(tmp_path / "ckpt_fb2")
    )
    replayed = _sorted(ST.read_upsert_target(spark, target).toPandas())
    pd.testing.assert_frame_equal(replayed, want)

    # crash mid-write: a half-written next version without a pointer
    # repoint must be invisible to readers
    import os

    junk = os.path.join(target, "v=99")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    crashed = _sorted(ST.read_upsert_target(spark, target).toPandas())
    pd.testing.assert_frame_equal(crashed, want)


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


def test_stateful_sessionize_equals_batch(spark):
    """Replayed streaming sessionization must equal the batch
    sessionize_events query exactly. Every emitted column is
    monotone within a (user_id, session_seq) key, so the final
    answer is min/max over the update-mode sink."""
    ST.run_to_completion(
        ST.sessionize_stateful(ST.events_stream(spark, SF_DIR)),
        "t_sessionize",
        output_mode="update",
    )
    got = (
        spark.table("t_sessionize")
        .groupBy("user_id", "session_seq")
        .agg(
            {"n_events": "max", "first_event": "min",
             "last_event": "max", "duration_sec": "max"}
        )
        .withColumnRenamed("max(n_events)", "n_events")
        .withColumnRenamed("min(first_event)", "first_event")
        .withColumnRenamed("max(last_event)", "last_event")
        .withColumnRenamed("max(duration_sec)", "duration_sec")
        .toPandas()
    )
    want = REGISTRY["sessionize_events"].fn(spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_stateful_sessionize_continues_sessions_across_batches(spark, tmp_path):
    """Cross-batch state is the hard part of sessionization: a
    session left OPEN at the end of one micro-batch must extend
    (same sequence number, growing stats) when the next batch's
    events arrive within the gap, and close only at a real gap.
    Three availableNow runs share one checkpoint; update-mode
    snapshots append to parquet via foreachBatch, and min/max over
    them is the final answer (monotone-column contract)."""
    from database_join_spark import streaming as ST

    src = tmp_path / "sess_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(subdir: str, rows: list[tuple[int, int, str]]) -> None:
        from pyspark.sql import functions as F

        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s STRING"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
        ).parquet(f"{src}/*")
        q = (
            ST.sessionize_stateful(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    # batch 1: user 7 opens session 1 (2 events); user 9 one event
    write_batch("a", [(1, 7, "2024-01-01 10:00:00"),
                      (2, 7, "2024-01-01 10:10:00"),
                      (3, 9, "2024-01-01 10:00:00")])
    run_once()
    # batch 2: 10:30 is within the 30-min gap of 10:10 → session 1
    # of user 7 must CONTINUE (n=3), not restart
    write_batch("b", [(4, 7, "2024-01-01 10:30:00")])
    run_once()
    # batch 3: 12:00 is a >30-min gap → session 2 opens
    write_batch("c", [(5, 7, "2024-01-01 12:00:00")])
    run_once()

    final = (
        spark.read.parquet(out)
        .groupBy("user_id", "session_seq")
        .agg(
            {"n_events": "max", "first_event": "min",
             "last_event": "max", "duration_sec": "max"}
        )
        .withColumnRenamed("max(n_events)", "n")
        .withColumnRenamed("min(first_event)", "first")
        .withColumnRenamed("max(last_event)", "last")
        .withColumnRenamed("max(duration_sec)", "dur")
        .toPandas()
        .set_index(["user_id", "session_seq"])
        .sort_index()
    )
    rows = {
        (u, s): (r["n"], r["first"], r["last"], r["dur"])
        for (u, s), r in final.iterrows()
    }
    assert rows == {
        (7, 1): (3, 1, 4, 1800),   # continued across batches 1→2
        (7, 2): (1, 5, 5, 0),      # re-opened after the 90-min gap
        (9, 1): (1, 3, 3, 0),
    }, rows


def test_stateful_sessionize_late_event_does_not_regress_cursor(
    spark, tmp_path
):
    """A cross-batch LATE arrival (event time before the open
    session's last seen event) must fold into the open session
    without regressing the gap cursor: the next event measured
    against the TRUE latest time must not see a spurious gap.
    Regression test for the max(last_e, e) cursor rule — with an
    unconditional `last_e = e` the 10:45 event below would sit
    40 min after the late 10:05 row and wrongly open session 2."""
    from database_join_spark import streaming as ST

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(subdir: str, rows: list[tuple[int, int, str]]) -> None:
        from pyspark.sql import functions as F

        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s STRING"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
        ).parquet(f"{src}/*")
        q = (
            ST.sessionize_stateful(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    write_batch("a", [(1, 7, "2024-01-01 10:00:00"),
                      (2, 7, "2024-01-01 10:20:00")])
    run_once()
    # LATE: 10:05 < the session's last event (10:20)
    write_batch("b", [(3, 7, "2024-01-01 10:05:00")])
    run_once()
    # 10:45 is 25 min after the true latest (10:20) → must CONTINUE
    write_batch("c", [(4, 7, "2024-01-01 10:45:00")])
    run_once()

    final = (
        spark.read.parquet(out)
        .groupBy("user_id", "session_seq")
        .agg({"n_events": "max", "duration_sec": "max"})
        .withColumnRenamed("max(n_events)", "n")
        .withColumnRenamed("max(duration_sec)", "dur")
        .toPandas()
        .set_index(["user_id", "session_seq"])
        .sort_index()
    )
    rows = {
        (u, s): (r["n"], r["dur"]) for (u, s), r in final.iterrows()
    }
    assert rows == {(7, 1): (4, 2700)}, rows


def test_stateful_dedup_drops_late_cross_batch_duplicate(spark, tmp_path):
    """Out-of-order replay for dropDuplicatesWithinWatermark (VERDICT
    r04 #7): a duplicate event_id redelivered in a LATER micro-batch
    with an earlier (late) timestamp must still be dropped — the
    dedup state restored from the checkpoint covers the watermark
    horizon — while a fresh late id within the horizon is kept."""
    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "dd_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_dd")
    out = str(tmp_path / "out_dd")

    def write_batch(subdir: str, rows: list[tuple[int, str]]) -> None:
        spark.createDataFrame(rows, "event_id BIGINT, ts_s STRING").select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP"
        ).parquet(f"{src}/*")
        q = (
            ST.dedup_within_watermark(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    write_batch("a", [(1, "2024-01-01 10:00:00"),
                      (2, "2024-01-01 10:30:00")])
    run_once()
    # b: id=1 redelivered LATE (10:05 < 10:30) across the batch
    # boundary → dropped; id=3 is new and late (09:00) but inside the
    # 1-day horizon → kept exactly once
    write_batch("b", [(1, "2024-01-01 10:05:00"),
                      (3, "2024-01-01 09:00:00")])
    run_once()

    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 2, 3], got


def test_rocksdb_changelog_checkpoint_restores_state_across_restarts(
    spark, tmp_path
):
    """Recovery path of the tuned RocksDB conf set
    (`rocksdb_state_store_confs(tuned=True)`): changelog
    checkpointing replaces full per-commit snapshots with changelog
    uploads, so a RESTART must reconstruct state as
    last-snapshot + changelog replay — the one mechanism the
    throughput probes never exercise (they run each arm in one
    process). Three checkpointed availableNow runs in three fresh
    query instances: the cross-batch duplicate in run 2 must be
    dropped by state restored through one changelog version, and the
    duplicate in run 3 through a deeper version chain — the
    memory-provider scenario above, extended by one more restart."""
    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "cl_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_cl")
    out = str(tmp_path / "out_cl")

    def write_batch(subdir: str, rows: list[tuple[int, str]]) -> None:
        spark.createDataFrame(rows, "event_id BIGINT, ts_s STRING").select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP"
        ).parquet(f"{src}/*")
        q = (
            ST.dedup_within_watermark(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    confs = ST.rocksdb_state_store_confs(tuned=True)
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        write_batch("a", [(1, "2024-01-01 10:00:00"),
                          (2, "2024-01-01 10:30:00")])
        run_once()
        # restart 1: state restored via snapshot + changelog; the
        # late cross-batch duplicate of id=1 must still be dropped
        write_batch("b", [(1, "2024-01-01 10:05:00"),
                          (3, "2024-01-01 09:00:00")])
        run_once()
        # restart 2: a deeper changelog chain; duplicate of id=3
        # (written in the PREVIOUS restart's batch) dropped, new id
        # kept — state carried through two recoveries
        write_batch("c", [(3, "2024-01-01 09:30:00"),
                          (4, "2024-01-01 11:00:00")])
        run_once()
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)

    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 2, 3, 4], got


def test_upsert_sink_with_upstream_dedup_ignores_late_duplicate(
    spark, tmp_path
):
    """Composition replay (VERDICT r04 #7): dedup-within-watermark
    feeding the keyed-upsert sink. A late duplicate delivery arriving
    across a batch boundary must not inflate the committed totals —
    the dedup state (restored from the shared checkpoint) absorbs it
    before the merge — while genuinely new events in the same batch
    still fold in."""
    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "up_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_up")
    target = str(tmp_path / "totals_up")

    def write_batch(
        subdir: str, rows: list[tuple[int, int, int, str]]
    ) -> None:
        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, value BIGINT, ts_s STRING"
        ).select(
            "event_id", "user_id", "value",
            F.col("ts_s").cast("timestamp").alias("ts"),
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, user_id BIGINT, value BIGINT, ts TIMESTAMP"
        ).parquet(f"{src}/*")
        ST.upsert_totals_foreach_batch(
            ST.dedup_within_watermark(stream), target, ckpt
        )

    write_batch("a", [(1, 7, 10, "2024-01-01 10:00:00"),
                      (2, 7, 5, "2024-01-01 10:30:00"),
                      (3, 8, 1, "2024-01-01 10:10:00")])
    run_once()
    # late duplicate of event 1 (earlier ts, later batch) + one real
    # new event for user 8
    write_batch("b", [(1, 7, 10, "2024-01-01 10:05:00"),
                      (4, 8, 2, "2024-01-01 10:40:00")])
    run_once()

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ST.read_upsert_target(spark, target).collect()
    }
    assert got == {7: (2, 15), 8: (2, 3)}, got


def test_sessionize_ttl_evicts_idle_user_state(spark, tmp_path):
    """100 TB state-eviction contract (round 5): with ttl_watermark
    set, once the watermark passes an idle user's last event + gap,
    the open session's final snapshot is emitted via EventTimeTimeout
    and the state is REMOVED — a later event for that user starts
    over at session_seq 1 (without eviction it would continue at 2),
    so a long-lived stream's state tracks the ACTIVE user set."""
    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "ttl_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_ttl")
    out = str(tmp_path / "out_ttl")

    def write_batch(subdir: str, rows: list[tuple[int, int, str]]) -> None:
        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s STRING"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
        ).parquet(f"{src}/*")
        q = (
            ST.sessionize_stateful(stream, ttl_watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, bid: df.withColumn(
                    "batch_id", F.lit(bid)
                ).write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    # user 7 opens a session (2 events)
    write_batch("a", [(1, 7, "2024-01-01 10:00:00"),
                      (2, 7, "2024-01-01 10:10:00")])
    run_once()
    # other-user traffic advances the watermark past 10:40 (last
    # event + 30 min gap) ...
    write_batch("b", [(3, 8, "2024-01-01 14:00:00")])
    run_once()
    # ... and the NEXT batch fires user 7's timeout: final snapshot
    # emitted without any user-7 data in the batch, state removed
    write_batch("b2", [(4, 8, "2024-01-01 14:05:00")])
    run_once()
    # user 7 re-appears: fresh state => session_seq restarts at 1
    write_batch("c", [(5, 7, "2024-01-01 14:30:00")])
    run_once()

    rows = spark.read.parquet(out).filter(F.col("user_id") == 7).collect()
    by_batch = sorted(rows, key=lambda r: (r["batch_id"], r["session_seq"]))
    # a timeout-emitted final snapshot exists in a batch that carried
    # no user-7 data: session 1 closed with both original events
    timed_out = [
        r for r in by_batch
        if r["n_events"] == 2 and r["first_event"] == 1
        and r["last_event"] == 2 and r["batch_id"] > 0
    ]
    assert timed_out, by_batch
    # the post-eviction event starts over at seq 1 with fresh stats
    last = by_batch[-1]
    assert (
        last["session_seq"], last["n_events"], last["first_event"]
    ) == (1, 1, 5), by_batch


def test_sessionize_ttl_drops_rows_behind_watermark(spark, tmp_path):
    """The OTHER ttl_watermark trade (ADVICE r05): with the input
    watermarked, a cross-batch row whose event time is behind the
    watermark is dropped BEFORE it reaches the update function —
    the no-TTL late-event contract (the 10:05 row folding into the
    open session in test_stateful_sessionize_late_event_does_not_
    regress_cursor) does not carry over to TTL mode. Here the same
    late-arrival shape loses the event: no user-7 snapshot ever
    counts it."""
    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "ttl_late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_ttl_late")
    out = str(tmp_path / "out_ttl_late")

    def write_batch(subdir: str, rows: list[tuple[int, int, str]]) -> None:
        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s STRING"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(src / subdir))

    def run_once() -> None:
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
        ).parquet(f"{src}/*")
        q = (
            ST.sessionize_stateful(stream, ttl_watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    # batch 1: user 7 opens a session; user-8 traffic at 12:00 puts
    # the post-batch watermark at 11:00 (max event time - 1h TTL)
    write_batch("a", [(1, 7, "2024-01-01 10:00:00"),
                      (2, 7, "2024-01-01 10:20:00"),
                      (3, 8, "2024-01-01 12:00:00")])
    run_once()
    # batch 2: event 4 at 10:05 is behind the 11:00 watermark — in
    # no-TTL mode it would fold into user 7's open session (n -> 3);
    # in TTL mode Structured Streaming drops it pre-operator
    write_batch("b", [(4, 7, "2024-01-01 10:05:00")])
    run_once()

    u7 = spark.read.parquet(out).filter(F.col("user_id") == 7).collect()
    assert u7, "user 7 produced no snapshots at all"
    # the late event never appears in any snapshot: every user-7 row
    # carries only the two in-order events
    assert all(r["n_events"] <= 2 for r in u7), u7
    assert all(r["last_event"] != 4 and r["first_event"] != 4 for r in u7), u7


def test_sessionize_ttl_state_bounded_across_restarts(spark, tmp_path):
    """Bounded-state contract across checkpointed restarts (VERDICT
    r05 #7): three availableNow runs share one checkpoint, each
    delivering a fresh hourly cohort of users; with ttl_watermark the
    state store must hold only the ACTIVE cohorts (watermark evicts
    each cohort once the next-but-one hour's events pass it), so the
    final run's state rows stay well under the cumulative user count.
    The probe twin (scripts/session_state_probe.py) runs the same
    shape at 1e7 events; this pins the mechanism at test scale."""
    import json as _json

    from pyspark.sql import functions as F

    from database_join_spark import streaming as ST

    src = tmp_path / "bounded_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_bounded")
    out = str(tmp_path / "out_bounded")
    users_per_cohort = 40

    def write_cohort(c: int) -> None:
        rows = [
            (
                (c * users_per_cohort + u) * 1000 + j,
                c * users_per_cohort + u,
                f"2024-01-01 {10 + c:02d}:00:{j * 10:02d}",
            )
            for u in range(users_per_cohort)
            for j in range(5)
        ]
        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s STRING"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(src / f"h{c}"))

    def run_once() -> tuple[int, int]:
        """(final numRowsTotal, numRowsRemoved summed) for this run."""
        stream = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
        ).parquet(f"{src}/*")
        q = (
            ST.sessionize_stateful(stream, ttl_watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        progress = [_json.loads(p.json) for p in q.recentProgress]
        q.stop()
        totals = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in progress
            if p.get("stateOperators")
        ]
        removed = sum(
            p["stateOperators"][0].get("numRowsRemoved", 0)
            for p in progress
            if p.get("stateOperators")
        )
        return (totals[-1] if totals else 0), removed

    states, removed_total = [], 0
    for c in range(3):
        write_cohort(c)
        state_rows, removed = run_once()
        states.append(state_rows)
        removed_total += removed

    # cumulative users = 120; bounded state must stay at the active
    # window (≤ 2 cohorts under the 1-hour TTL), with real evictions
    assert states[-1] <= 2 * users_per_cohort, states
    assert removed_total >= users_per_cohort, (states, removed_total)
    # and the evicted cohort's sessions were still emitted complete
    final = (
        spark.read.parquet(out)
        .filter(F.col("user_id") < users_per_cohort)
        .groupBy("user_id", "session_seq")
        .agg(F.max("n_events").alias("n"))
        .collect()
    )
    assert len(final) == users_per_cohort
    assert all(r["n"] == 5 and r["session_seq"] == 1 for r in final)


def test_ingest_neardedup_batch_cross_batch_masses(spark, tmp_path):
    """The round-12 cross-batch MinHash stage
    (streaming.ingest_neardedup_batch): planted same-batch and
    cross-batch NEAR-dups (one word of 50 replaced — hashed-shingle
    Jaccard ≈ 0.94) must retire with exact masses, the survivors'
    bucket/sketch stores must census exactly, and a third batch must
    still dedup against the FIRST batch's state (the store
    accumulates, not a sliding window)."""
    from pyspark.sql import functions as F

    from database_join_spark.operators import text as T
    from database_join_spark.streaming import ingest_neardedup_batch

    state = str(tmp_path / "state")
    n = 200  # per batch; class = id % 20 → 10 docs per class

    def day(d):
        base = (
            "CASE WHEN id % 20 = 5 THEN id - 5 "
            f"WHEN id % 20 = 9 AND id >= {n} THEN id - 9 - {n} "
            "ELSE id END"
        )
        word = (
            "IF(i = 3 AND (id % 20 = 5 OR (id % 20 = 9 AND "
            f"id >= {n})), concat('z', CAST(id AS STRING)), "
            f"concat('w', pmod(xxhash64({base}, i), 500)))"
        )
        return (
            spark.range(d * n, (d + 1) * n)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    f"array_join(transform(sequence(0, 49), "
                    f"i -> {word}), ' ')"
                ).alias("text"),
            )
            .select("doc_id", T.tokens("text").alias("toks"))
        )

    # day 0: class-5 near-dups (10) drop within-batch; class 9 has
    # no prior day → unique background, admitted
    a0 = ingest_neardedup_batch(day(0), state)
    assert a0.count() == n - 10
    # day 1: class 5 within-batch + class 9 vs day-0 state
    a1 = ingest_neardedup_batch(day(1), state)
    assert a1.count() == n - 20
    # day 2: same — and the state still holds day 0's docs
    a2 = ingest_neardedup_batch(day(2), state)
    assert a2.count() == n - 20

    admitted = (n - 10) + 2 * (n - 20)
    buckets = spark.read.parquet(f"{state}/buckets")
    sketches = spark.read.parquet(f"{state}/sketches")
    assert sketches.count() == admitted
    assert buckets.count() == admitted * 16  # default bands
    # dropped docs never entered state
    assert (
        sketches.filter((F.col("doc_id") % 20) == 5).count() == 0
    )
    # exactly day-0's class-9 background docs survive in state
    assert (
        sketches.filter((F.col("doc_id") % 20) == 9).count() == 10
    )
    # survivors pass through with their original columns
    assert set(a2.columns) == {"doc_id", "toks"}


def test_bucket_store_cache_incremental_and_lifecycle(spark, tmp_path):
    """Round-13 store-frame cache (VERDICT r12 #3-residual): the
    near-dup bucket store is append-only and probed in full each
    batch, so the cache must (a) return exactly the store's rows,
    (b) consume only NEW files on later calls (incremental union,
    not a re-read), (c) rebuild when the store is compacted under
    it, and (d) release everything on clear_neardedup_cache."""
    from database_join_spark.streaming import (
        _STORE_CACHE,
        _bucket_store_frame,
        clear_neardedup_cache,
    )

    store = tmp_path / "buckets"
    # empty dir → no frame
    store.mkdir()
    assert _bucket_store_frame(spark, str(store)) is None

    def append(lo, hi):
        spark.range(lo, hi).selectExpr(
            "CAST(id % 4 AS INT) AS band",
            "xxhash64(id) AS bucket",
            "id AS doc_id",
        ).coalesce(1).write.mode("append").parquet(str(store))

    try:
        append(0, 100)
        f1 = _bucket_store_frame(spark, str(store))
        assert f1.count() == 100
        _, seen1, unions1 = _STORE_CACHE[str(store)]
        assert unions1 == 0
        # same files → same frame object, no new cache entry state
        assert _bucket_store_frame(spark, str(store)) is f1
        # append → incremental union consumes only the delta
        append(100, 250)
        f2 = _bucket_store_frame(spark, str(store))
        assert f2.count() == 250
        _, seen2, unions2 = _STORE_CACHE[str(store)]
        assert unions2 == 1 and len(seen2) > len(seen1)
        assert {
            r["doc_id"] for r in f2.select("doc_id").collect()
        } == set(range(250))
        # compaction (rewrite) under the cache → full rebuild
        rows = spark.read.parquet(str(store))
        rows.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "compacted")
        )
        import shutil

        shutil.rmtree(store)
        shutil.move(str(tmp_path / "compacted"), str(store))
        f3 = _bucket_store_frame(spark, str(store))
        assert f3.count() == 250
        assert _STORE_CACHE[str(store)][2] == 0  # rebuilt, not unioned
    finally:
        clear_neardedup_cache()
    assert str(store) not in _STORE_CACHE
