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
