"""Heavy-hitter-key stress for the window-heavy pipeline ops
(VERDICT r02 #9).

``pack_sequences`` and ``dedup_first_event`` partition their windows
by lang / (user_id, event_type). At fixture scale every key is tiny;
these tests plant ONE key owning 50% of all rows — the shape that
turns a window into a single-task straggler at 100 TB — and assert:

- results stay EXACT (independent DuckDB oracle over the same rows);
- the first-event plan stays WindowGroupLimit-pruned (a partial
  prune makes the shape skew-immune: the hot key crosses the wire as
  one row per map task, not 50% of the input);
- the running-sum packing shape, which has NO partial prune by
  nature, still computes exactly — the salting escape hatch for the
  pathological one-key-exceeds-a-task case is documented in the
  operator docstrings and ``operators/skew.py``.
"""

from __future__ import annotations

import re

import duckdb

from pyspark.sql import functions as F

from database_join_spark import plans as P
from database_join_spark.queries.pipeline import (
    first_event_frame,
    pack_sequences_frame,
)
from tests.compare import assert_frames_match

N_EVENTS = 40_000
N_DOCS = 30_000


def _skewed_events(spark):
    """50% of events belong to user 7; the rest spread over ~400
    users. Timestamps are a deterministic non-monotonic shuffle of
    the id space with planted exact-ts ties (the row_number tiebreak
    must decide them identically in both engines)."""
    return spark.range(N_EVENTS).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % 397 + 100)
        .cast("long")
        .alias("user_id"),
        ((F.col("id") / 2).cast("long") % 4).alias("event_type"),
        F.col("id").alias("event_id"),
        # ties: ts collides for id and id+8192 within a user stripe
        ((F.col("id") * 2654435761) % 8192).cast("long").alias("ts"),
    )


def _skewed_docs(spark):
    """50% of docs in lang 'hot'; the rest over 6 cold langs."""
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 6).cast("string")))
        .alias("lang"),
        ((F.col("id") * 37) % 97 + 1).cast("long").alias("n_tokens"),
    )


def test_first_event_exact_under_50pct_hot_key(spark):
    ev = _skewed_events(spark)
    got = first_event_frame(ev).toPandas()

    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = con.execute(
        """
        SELECT user_id, event_type, event_id AS first_event_id,
               ts AS first_ts
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS rn FROM ev)
        WHERE rn = 1
        """
    ).df()
    # the hot key must actually dominate: 4 (user 7, event_type) rows
    # out in a result whose input was 50% user 7
    assert (want["user_id"] == 7).sum() == 4
    assert_frames_match(got, want, "first_event_skew")


def test_first_event_plan_stays_group_limit_pruned_under_skew(spark):
    """The skew immunity claim IS the partial prune — pin it on the
    skewed frame itself, plus the single-exchange shape."""
    plan = P.plan_string(first_event_frame(_skewed_events(spark)))
    assert "WindowGroupLimit" in plan, plan
    assert len(re.findall(r"\bExchange \(\d+\)", plan)) == 1, plan


def test_pack_sequences_exact_under_50pct_hot_lang(spark):
    toks = _skewed_docs(spark)
    got = pack_sequences_frame(toks, budget=512).toPandas()

    con = duckdb.connect()
    con.register("toks", toks.toPandas())
    want = con.execute(
        """
        WITH cum AS (
          SELECT doc_id, lang, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
          FROM toks)
        SELECT lang, CAST(tok_before // 512 AS BIGINT) AS seq_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM cum GROUP BY lang, seq_id
        """
    ).df()
    # the hot lang owns ~50% of the token mass → ~50% of sequences
    hot = want[want["lang"] == "hot"]
    assert len(hot) > 0.4 * len(want), (len(hot), len(want))
    assert_frames_match(got, want, "pack_sequences_skew")


def test_pack_sequences_single_exchange_under_skew(spark):
    """Window + groupBy must reuse ONE lang-keyed exchange even on
    the skewed frame — a second shuffle would double the hot
    partition's wire cost."""
    plan = P.plan_string(pack_sequences_frame(_skewed_docs(spark)))
    assert len(re.findall(r"\bExchange \(\d+\)", plan)) == 1, plan


def test_skewjoin_detection_confs_shape():
    """The measured AQE skew-visibility gates (SKEWJOIN_PROBE.json):
    factor 2.0 is the load-bearing change — 5.0 and 3.0 never fire
    on the probe's 11×-row-skew shape because detection reads
    compressed bytes and the constant hot key compresses better
    than the uniform partitions (bisected). Pin the helper's
    contract so the encoded rule cannot drift from the artifact."""
    from database_join_spark.operators.skew import (
        skewjoin_detection_confs,
    )

    confs = skewjoin_detection_confs()
    assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert (
        confs["spark.sql.adaptive.skewJoin.skewedPartitionFactor"]
        == "2.0"
    )
    assert (
        confs[
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes"
        ]
        == "16m"
    )
    # parameterizable without changing the conf keys
    loose = skewjoin_detection_confs(factor=4.0, threshold="64m")
    assert (
        loose["spark.sql.adaptive.skewJoin.skewedPartitionFactor"]
        == "4.0"
    )
    assert set(loose) == set(confs)
