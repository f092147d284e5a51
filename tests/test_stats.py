"""Pins for the statistics catalog (plans/stats.py, VERDICT r07 #4):
the HLL estimate must be paid once per table version and read from
the catalog thereafter, the decision must always be re-derived from
the cached statistic, and version drift (new key) must recompute."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from database_join_spark.plans.sizing import FAST_MAP_MIN_BIT
from database_join_spark.plans.stats import (
    cached_statistic,
    parquet_table_key,
    plan_for_cached,
)


def test_cached_statistic_computes_once(tmp_path):
    path = tmp_path / "stats.json"
    calls = []

    def compute():
        calls.append(1)
        return 42

    v1, hit1 = cached_statistic("t1", "groups", compute, path=path)
    v2, hit2 = cached_statistic("t1", "groups", compute, path=path)
    assert (v1, hit1) == (42, False)
    assert (v2, hit2) == (42, True)
    assert len(calls) == 1
    # a different table version (key) recomputes
    v3, hit3 = cached_statistic("t1-v2", "groups", compute, path=path)
    assert (v3, hit3) == (42, False)
    assert len(calls) == 2


def test_torn_catalog_file_is_empty_not_fatal(tmp_path):
    path = tmp_path / "stats.json"
    path.write_text("{ not json")
    v, hit = cached_statistic("t", "s", lambda: 7, path=path)
    assert (v, hit) == (7, False)
    # and the recompute repaired the file
    assert json.loads(path.read_text())["t|stat=s"] == 7


def test_plan_for_cached_skips_scan_on_hit(spark, tmp_path):
    path = tmp_path / "stats.json"
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("g"), F.col("id").alias("v")
    )
    s1, hit1 = plan_for_cached(df, ["g"], "tbl:v1", path=path)
    assert hit1 is False
    assert s1.capacity_bit == FAST_MAP_MIN_BIT  # 50 groups: default
    # hit path: a df whose scan would EXPLODE proves no scan happens
    bomb = spark.range(10).select(
        F.raise_error(F.lit("scan must not run")).alias("g")
    )
    s2, hit2 = plan_for_cached(bomb, ["g"], "tbl:v1", path=path)
    assert hit2 is True
    assert s2 == s1  # decision re-derived from the cached statistic


def test_parquet_table_key_tracks_version(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"aaaa")
    k1 = parquet_table_key(str(d))
    assert "part-0.parquet:4:" in k1
    f.write_bytes(b"aaaaaa")  # rewrite -> new size -> new key
    assert parquet_table_key(str(d)) != k1


def test_parquet_table_key_sub_second_rewrite_rotates(tmp_path):
    """ADVICE r08: a rewrite preserving names and sizes within the
    same wall-clock second must still rotate the key — the
    fingerprint uses st_mtime_ns, not whole seconds."""
    import os

    d = tmp_path / "tbl"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"aaaa")
    k1 = parquet_table_key(str(d))
    # same content length, same second, different nanosecond mtime
    st = f.stat()
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert parquet_table_key(str(d)) != k1


def test_cached_statistic_concurrent_writers_no_lost_update(tmp_path):
    """ADVICE r08: the merge runs under an exclusive lock, so two
    near-simultaneous writers both land their entries (the lock-free
    spelling could drop one, silently re-paying its scan later)."""
    from database_join_spark.plans.stats import cached_statistic

    path = tmp_path / "cache.json"
    seen = []

    def compute_a():
        # interleave: while A's compute runs, B completes fully
        v, hit = cached_statistic("tb", "s", lambda: 2, path=path)
        seen.append(("b", v, hit))
        return 1

    va, hita = cached_statistic("ta", "s", compute_a, path=path)
    seen.append(("a", va, hita))
    assert ("b", 2, False) in seen and ("a", 1, False) in seen
    # both survive in the catalog
    va2, hita2 = cached_statistic("ta", "s", lambda: 99, path=path)
    vb2, hitb2 = cached_statistic("tb", "s", lambda: 99, path=path)
    assert (va2, hita2) == (1, True)
    assert (vb2, hitb2) == (2, True)


def test_host_snapshot_shape():
    """hostinfo.host_snapshot (round 9, VERDICT r08 #5) returns the
    JSON-ready drift-adjudication block every artifact embeds."""
    from database_join_spark.hostinfo import host_snapshot

    s = host_snapshot()
    assert {"unix_time", "loadavg", "cpu_mhz_mean",
            "mem_available_gb"} <= set(s)
    assert s["mem_available_gb"] is None or s["mem_available_gb"] > 0
    la = s["loadavg"]
    assert la is None or (len(la) == 3 and all(x >= 0 for x in la))


def test_plan_skewjoin_cached_skips_estimates_on_hit(spark, tmp_path):
    """VERDICT r10 #4: the skew-join decision's two estimate inputs
    (sampled top share, dim count) read through the catalog — the
    hit path must run NO job on either frame, and the decision is
    re-derived from the statistics (a live conf change still takes
    effect on a warm catalog)."""
    from database_join_spark.plans.stats import plan_skewjoin_cached

    path = tmp_path / "stats.json"
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k")
    )
    dim = spark.range(0, 1_000).select(F.col("id").alias("k"))
    p1, hit1 = plan_skewjoin_cached(
        fact, "k", dim, "fact:v1", "dim:v1", path=path
    )
    assert hit1 is False
    assert p1.strategy == "broadcast"  # 1k-row dim fits the budget
    # hit path: frames whose scan would EXPLODE prove no job runs
    bomb_fact = spark.range(1).select(
        F.raise_error(F.lit("fact scan must not run")).alias("k")
    )
    bomb_dim = spark.range(1).select(
        F.raise_error(F.lit("dim scan must not run")).alias("k")
    )
    p2, hit2 = plan_skewjoin_cached(
        bomb_fact, "k", bomb_dim, "fact:v1", "dim:v1", path=path
    )
    assert hit2 is True
    assert p2 == p1
    # decision stays LIVE on cached statistics: disabling
    # auto-broadcast flips the same cached inputs off broadcast
    conf_key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(conf_key)
    try:
        spark.conf.set(conf_key, "-1")
        p3, hit3 = plan_skewjoin_cached(
            bomb_fact, "k", bomb_dim, "fact:v1", "dim:v1", path=path
        )
        assert hit3 is True and p3.strategy != "broadcast"
    finally:
        spark.conf.set(conf_key, old)
    # version rotation recomputes (fresh keys → estimates re-run)
    p4, hit4 = plan_skewjoin_cached(
        fact, "k", dim, "fact:v2", "dim:v2", path=path
    )
    assert hit4 is False and p4.strategy == "broadcast"
