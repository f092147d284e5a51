"""Property tests for the non-oracled extras (approx sketches)."""

from __future__ import annotations

from database_join_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def test_approx_quantile_within_bound_of_exact(spark):
    exact = {
        r["l_returnflag"]: (r["q25"], r["q50"], r["q95"], r["n"])
        for r in REGISTRY["agg_quantile_exact"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: (r["q25"], r["q50"], r["q95"])
        for r in REGISTRY["agg_quantile_approx"].fn(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, (q25, q50, q95, n) in exact.items():
        spread = q95 - q25 or 1.0
        for got, want in zip(approx[flag], (q25, q50, q95)):
            # GK with accuracy=1000 → rank error ≤ n/1000; generous
            # value-space bound of 10% of the IQR-ish spread
            assert abs(got - want) <= 0.1 * spread + 1e-9, (
                flag, got, want
            )


def test_asof_bucketed_equals_windowed_on_skew(spark):
    """The bucketed as-of strategy must be bit-equal to the windowed
    one on a hot-key workload (the pair-blow-up case it exists for),
    across bucket widths — including a bucket wider than the whole
    history (degenerates to pure carry-forward + one giant in-bucket)
    and one so narrow most matches cross buckets."""
    from datetime import datetime, timedelta

    from database_join_spark.operators.asof import (
        asof_join_bucketed,
        asof_join_windowed,
    )

    base = datetime(2024, 1, 1)
    events, orders = [], []
    # hot user 1: dense events and orders interleaved over 10 days
    for i in range(400):
        events.append((1000 + i, 1, base + timedelta(minutes=37 * i)))
    for j in range(300):
        orders.append((5000 + j, 1, base + timedelta(minutes=53 * j), float(j)))
    # exact-timestamp tie with order 5010 → tiebreak picks key 9001
    orders.append((9001, 1, base + timedelta(minutes=53 * 10), 999.0))
    # user 2: event precedes every order → must drop (inner semantics)
    events.append((1, 2, base))
    orders.append((9100, 2, base + timedelta(days=5), 1.0))
    # user 3: lone order 400 days earlier → carry-forward across many
    # empty buckets (and a pre-1970-safe floor bucket path)
    events.append((2, 3, base + timedelta(days=9)))
    orders.append((9200, 3, base - timedelta(days=400), 2.0))

    ev = spark.createDataFrame(
        events, "event_id bigint, user_id bigint, ts timestamp"
    )
    od = spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_totalprice double",
    )
    kw = dict(
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        tiebreak="o_orderkey",
        payload=["o_totalprice"],
    )
    want = sorted(map(tuple, asof_join_windowed(ev, od, **kw).collect()))
    # every hot event matches (order j=0 coincides with event i=0),
    # user 3's lone event matches, user 2's drops
    assert len(want) == 401
    for bucket_seconds in (3600, 86400, 10**9):
        got = sorted(
            map(
                tuple,
                asof_join_bucketed(
                    ev, od, bucket_seconds=bucket_seconds, **kw
                ).collect(),
            )
        )
        assert got == want, f"bucket={bucket_seconds}"


def test_approx_distinct_within_rsd_of_exact(spark):
    """#10's HLL++ estimate must sit inside its declared rsd of the
    exact distinct count (the FM-estimate's 'right power of two'
    contract, q4112.c:336-377, restated probabilistically)."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    est = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("e")
    ).collect()[0]["e"]
    assert abs(est - exact) / exact < 0.1


def test_hll_sketch_estimates_within_bound_and_union_consistent(spark):
    """distinct_hll_sketch: per-type estimates within the lgConfigK=12
    HLL error bound (~1.6% rsd; allow 5%) of exact distinct counts,
    and the unioned sketch within bound of the GLOBAL exact distinct
    — the mergeability contract that makes sketches scale."""
    got = {
        r["event_type"]: r["n_distinct_est"]
        for r in REGISTRY["distinct_hll_sketch"].fn(spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert got.keys() == exact.keys() | {"ALL"}
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, 0.05 * n), (k, got[k], n)


def test_join_bloom_prefilter_prunes_but_never_drops_matches(spark):
    """join_bloom_prefilter's bitmap must PRUNE (survivors well under
    the fact row count — not a vacuous pass-through) while keeping
    every matching row (false negatives impossible): survivors ≥ the
    exact matching mass, and the final result is oracle-checked by
    test_oracle_parity. Also pins the FP envelope: survivors ≤
    matches + the ~n/2^17-rate slack over non-matching rows."""
    from pyspark.sql import functions as F

    from database_join_spark.operators import bloom as B

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dim = part.filter(F.col("p_size") <= 5).select("p_partkey")
    fact = li.select("l_partkey")
    total = fact.count()
    matches = fact.join(
        dim, dim.p_partkey == fact.l_partkey, "left_semi"
    ).count()
    survivors = B.prefilter(
        fact, "l_partkey", B.bitmap_of(dim, "p_partkey")
    ).count()
    assert matches <= survivors, (matches, survivors)
    # real pruning: the selective dim keeps well under half the fact
    assert survivors < 0.6 * total, (survivors, total)
    # FP envelope: n_keys/2^17 rate over the non-matching mass, with
    # 3x slack for hash variance at fixture scale
    n_keys = dim.distinct().count()
    fp_budget = 3 * (n_keys / (1 << 17)) * (total - matches) + 50
    assert survivors - matches <= fp_budget, (survivors, matches, fp_budget)
