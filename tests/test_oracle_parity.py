"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 — the local replica of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from database_join_spark.queries import load_all
from tests.compare import assert_frames_match, run_both
from tests.conftest import SF_DIR

REGISTRY = load_all()
ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_duckdb_oracle(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf, duck_pdf = run_both(spec, spark, duck, SF_DIR)
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["avg_of_avgs"] > 0
    # idempotence: a second call on the same session must return the
    # identical result (the driver may call entry() repeatedly)
    assert e.entry(spark).collect() == rows
