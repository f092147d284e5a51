"""Physical-plan inspection and assertion helpers.

The reference hand-picks its physical plan at link time (one
``q4112_run`` per binary, ``Makefile:7-22``); on Spark the plan comes
from Catalyst, so the engineering duty inverts: ASSERT that the
optimizer produced the plan the operator was designed for — the
broadcast actually broadcast, the filter actually reached the scan,
the pipeline actually fused into WholeStageCodegen. These helpers make
those properties testable (tests/test_plans.py) instead of hoped-for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (same output as
    ``df.explain(mode)``, captured instead of printed)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode  # noqa: SLF001
    )


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    """Assert every needle appears in the physical plan; returns the
    plan text for further checks."""
    plan = plan_string(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = plan_string(df)
    for needle in needles:
        assert needle not in plan, f"unwanted {needle!r} in plan:\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    """The join must be a broadcast hash join (dimension-sized build
    side never shuffles the fact table)."""
    return assert_in_plan(df, "BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> str:
    """No accidental cross products (the O(n·m) trap; only the
    explicitly-labeled NLJ baselines may contain one)."""
    return assert_not_in_plan(df, "CartesianProduct")


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters that reached the parquet scan (predicate pushdown
    proof: a filter NOT in this list runs post-scan on every row)."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from each parquet scan (column
    pruning proof: a 2-column projection must not read 16 columns)."""
    plan = plan_string(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """WholeStageCodegen span ids — the fused pipeline segments (the
    analogue of the reference's hand-fused probe+multiply+aggregate
    loop, q4112_hj_1.c:53-73). Under AQE the codegen spans only exist
    in the FINAL plan, so this executes the DataFrame's own query
    execution (collect — a noop write would spawn a separate
    execution and leave this one un-finalized) and reads the ``*(n)``
    markers from the materialized adaptive plan."""
    df.collect()
    plan = plan_string(df, mode="simple")
    return sorted(set(re.findall(r"\*\((\d+)\)", plan)))


def heavy_inferred_filters(df: DataFrame, max_len: int = 200) -> list[str]:
    """Filter lines in the OPTIMIZED plan whose condition embeds a
    heavy generated expression — the round-10 Catalyst inlining-trap
    signature (InferFiltersFromGenerate / constraint inference +
    CollapseProject re-inlining a tokenizer, a k-centroid distance
    pass, or a signature fold into a per-row filter; measured 2.4–19×
    on the affected families). The heuristic is the regression pin's:
    a Filter containing ``split(`` or ``transform(`` longer than
    ``max_len`` chars — short single-tokenize gates (length filters)
    pass. Returns the offending lines (empty = clean); scanned
    registry-wide by scripts/plan_audit.py into PLANS.md and hard-
    gated by tests/test_pipeline.test_no_inferred_expensive_filters."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = []
    for line in plan.splitlines():
        s = line.strip()
        if not (s.startswith("+- Filter") or s.startswith("Filter")):
            continue
        if ("split(" in s or "transform(" in s) and len(s) > max_len:
            bad.append(s)
    return bad
