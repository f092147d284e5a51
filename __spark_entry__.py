"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``database_join_spark`` package; this
module only adapts its registry to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from database_join_spark.queries import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "agg_avg_of_avgs"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Part 2, avg of per-group integer
    averages) on sf0.001; driver checks rows>0 and a stable schema."""
    registry = load_all()
    return registry[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver gates at most 50 ids per round (CORRECTNESS_r01 cut the
    then-60-entry registry at exactly 50 rows); exactly 50 queries are
    ``gated``, rotated each round (VERDICT r02 #6, r03 #4, r04 #1,
    r05 #1) so every oracled id earns a driver CORRECTNESS row across
    rounds. Since round 6 the rotation is a single table —
    ``database_join_spark.queries.DRIVER_GATE`` — instead of a flag on
    every ``@query`` call site; see its docstring for this round's
    composition (first rows for ALL r05/r06-born ids + every id whose
    newest driver row was r02/r03 + the 11-id SURVEY §2 headline set).
    Everything rotated out holds a green r04-or-newer row and stays
    hash-compared by the identical check in pytest
    (tests/test_oracle_parity.py runs gated and ungated alike).
    """
    return {
        name: spec.fn for name, spec in load_all().items() if spec.gated
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible gated query id."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.gated and spec.oracle is not None
    }
