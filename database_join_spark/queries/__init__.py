"""Query registry: every operator from SURVEY.md §2 as a named query.

Each :class:`QuerySpec` pairs a PySpark implementation
``fn(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) an
exact DuckDB oracle statement over the fixture views. The driver runs
both at sf0.01 and hash-compares; our pytest suite does the same at
sf0.001. Queries without an oracle (approximate / streaming-stateful /
ML ops) get rows-only checks from the driver plus property tests here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: Exposed to the correctness driver via ``__spark_entry__``. The
    #: driver gates at most 50 queries per round (CORRECTNESS_r01 cut
    #: the registry's tail at exactly 50 rows), so the registry keeps
    #: the full surface but exposes exactly the 50 highest-value ids:
    #: every SURVEY §2 id, every TPC-H query, and the strongest
    #: extras. Ungated queries keep their oracle and stay verified by
    #: tests/ (same hash-compare, run under pytest instead).
    gated: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    gated: bool = True,
):
    """Register a query implementation under a SURVEY §2 query id."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
            gated=gated,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from database_join_spark.queries import (  # noqa: F401
        core,
        extras,
        pipeline,
        relational,
        streaming,
        tpch,
    )

    return REGISTRY
