"""Hypothesis property tests for the operator kernels, plus the
custom Python DataSource.

The generators feed arbitrary token lists / frames through the Spark
expressions and compare against straightforward Python-set/pandas
models — the operators must agree with their mathematical definitions
on ANY input, not just the fixtures.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

words = st.text(alphabet="abcde", min_size=1, max_size=4)
token_lists = st.lists(words, min_size=0, max_size=12)


@pytest.fixture(scope="module")
def sc_df(spark):
    """One reusable single-column frame factory (session is shared)."""
    return spark


@settings(max_examples=25, deadline=None)
@given(a=token_lists, b=token_lists)
def test_jaccard_matches_set_definition(spark, a, b):
    from database_join_spark.operators.dedup import jaccard

    df = spark.createDataFrame(
        [(a, b)], "sa array<string>, sb array<string>"
    ).select(
        F.array_distinct("sa").alias("sa"),
        F.array_distinct("sb").alias("sb"),
    )
    got = df.select(jaccard("sa", "sb").alias("j")).collect()[0]["j"]
    sa, sb = set(a), set(b)
    want = len(sa & sb) / len(sa | sb) if (sa | sb) else None
    if want is None:
        assert got is None or got != got  # NULL or NaN for 0/0
    else:
        assert got == pytest.approx(want)


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_exact_keeps_min_id_per_key(spark, rows):
    from database_join_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(rows, "k INT, id BIGINT").dropDuplicates(
        ["k", "id"]
    )
    got = (
        dedup_exact(df, ["k"], "id")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(set(rows), columns=["k", "id"])
        .groupby("k", as_index=False)["id"]
        .min()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "id": "int64"}),
        want.astype({"k": "int64", "id": "int64"}),
    )


def test_synthdocs_datasource(spark):
    """The custom Python DataSource must honor rows/partitions
    options, generate deterministically, and feed the dedup pipeline
    (planted dups recovered by fingerprint)."""
    from database_join_spark.operators.text import fingerprint
    from database_join_spark.sources.synthdocs import register

    register(spark)
    df = (
        spark.read.format("synthdocs")
        .option("rows", 2000)
        .option("partitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 2000
    # deterministic across reads
    a = df.orderBy("doc_id").limit(3).collect()
    b = (
        spark.read.format("synthdocs")
        .option("rows", 2000)
        .option("partitions", 3)
        .load()
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    assert [r.text for r in a] == [r.text for r in b]
    # ids ≡ 1 (mod 50) share their predecessor's word multiset except
    # the trailing salt — near-dups, not identical: distinct texts
    assert df.select("text").distinct().count() == 2000


def test_synthdocs_stream_reader_equals_batch(spark, tmp_path):
    """The streaming form of the custom Python DataSource (round 6:
    DataSourceStreamReader with an id-cursor offset) must replay to
    completion under availableNow in MULTIPLE micro-batches and
    produce exactly the batch reader's rows — per-language counts
    AND full row-set equality (the source's batch ≡ stream
    contract)."""
    from pyspark.sql import functions as F

    import time

    from database_join_spark.sources.synthdocs import register

    register(spark)
    rows, per_batch = 5_000, 1_000
    out = str(tmp_path / "synthstream_out")
    q = (
        spark.readStream.format("synthdocs")
        .option("rowsPerBatch", per_batch)
        .option("maxRows", rows)
        .option("partitions", 6)
        .load()
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_synthstream"))
        .start()
    )
    # default trigger, NOT availableNow: Spark snapshots latestOffset
    # once for availableNow, which would collapse the cursor-per-
    # trigger admission into a single batch; the continuous trigger
    # exercises the real incremental protocol. Poll until the bounded
    # stream drains (total input rows across progress == maxRows).
    deadline = time.time() + 240
    while time.time() < deadline:
        done = sum(p.numInputRows for p in q.recentProgress) >= rows
        if done:
            break
        time.sleep(1)
    n_batches = len([p for p in q.recentProgress if p.numInputRows > 0])
    q.stop()
    # the cursor advances one batch per trigger: a real multi-batch
    # replay, not one monolithic swallow
    assert n_batches >= 5, n_batches

    got = spark.read.parquet(out)
    want = (
        spark.read.format("synthdocs")
        .option("rows", rows)
        .option("partitions", 6)
        .load()
    )
    assert got.count() == rows
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    counts = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 1000, "es": 1000, "fr": 1000, "de": 1000, "zh": 1000}


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(-1_000_000, 1_000_000), min_size=1, max_size=60),
    probes=st.lists(st.integers(-1_000_000, 1_000_000), min_size=1, max_size=120),
)
def test_bloom_prefilter_never_false_negative(spark, keys, probes):
    """operators/bloom invariant on ARBITRARY key sets: every probe
    row whose key is in the bitmap's key set survives prefilter
    (false negatives impossible), and survivors are a subset of the
    probe rows (schema preserved, no duplication)."""
    from database_join_spark.operators import bloom as B

    key_df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    probe_df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(probes)], "rid BIGINT, k BIGINT"
    )
    bits = 1 << 10  # small bitmap: force real FP pressure
    surv = B.prefilter(probe_df, "k", B.bitmap_of(key_df, "k", bits), bits)
    got = {(r["rid"], r["k"]) for r in surv.collect()}
    key_set = set(keys)
    must_keep = {(i, p) for i, p in enumerate(probes) if p in key_set}
    assert must_keep <= got, (must_keep - got)
    all_rows = {(i, p) for i, p in enumerate(probes)}
    assert got <= all_rows
