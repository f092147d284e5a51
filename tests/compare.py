"""Spark-vs-DuckDB result comparison, mirroring the driver's gate:
row-count + schema(column names) + order-insensitive value equality.

Stricter than a hash: on mismatch it shows the first differing rows.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, object-normalized frame."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, Decimal):
            return str(v.normalize()) if v != 0 else "0"
        if isinstance(v, float):
            return float(v)
        if isinstance(v, (pd.Timestamp,)):
            return v.to_pydatetime().replace(tzinfo=None)
        if hasattr(v, "item"):  # numpy scalar → python
            return v.item()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    out = df.map(norm)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    def is_null(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for col in s.columns:
        sv, dv = list(s[col]), list(d[col])
        for i, (a, b) in enumerate(zip(sv, dv)):
            if is_null(a) and is_null(b):
                continue
            if a != b:
                raise AssertionError(
                    f"{name}: value mismatch col={col} row={i}: "
                    f"spark={a!r} ({type(a).__name__}) vs "
                    f"duck={b!r} ({type(b).__name__})\n"
                    f"spark head:\n{s.head(5)}\nduck head:\n{d.head(5)}"
                )


def run_both(spec, spark, duck, sf_dir: str):
    """Execute a QuerySpec on Spark and its oracle on DuckDB."""
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    return spark_pdf, duck_pdf
