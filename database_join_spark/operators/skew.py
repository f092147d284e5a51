"""Skew-handling patterns: salted joins and two-phase salted
aggregation.

The reference's skew story is its thread-local pre-aggregation cache
(``q4112.c:225-237``) plus the observation that maximum skew actually
got FASTER with local caches (``README-2.txt:41-43``). Spark's
built-in analogues are map-side partial aggregation and AQE skew-join
splitting — which handle most cases and should be tried FIRST. These
explicit patterns are for the cases AQE cannot fix:

- a *broadcast-ineligible* dimension joined on a key where a handful
  of values dominate the fact side (AQE splits skewed SMJ partitions,
  but replication lets you pre-commit to a bounded fan-out);
- high-cardinality group-bys where one key exceeds a single task's
  memory even after partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 8,
    salt_src: str | Column | None = None,
) -> DataFrame:
    """Inner equi-join with the dimension replicated ``salts``× and
    the fact side salted, so a heavy-hitter key spreads over
    ``salts`` tasks instead of one straggler.

    The fact's salt must be deterministic but uncorrelated with the
    key: derived from ``salt_src`` (default: xxhash64 of the entire
    fact row, which is deterministic for deterministic input). The
    dimension is exploded once per salt value — at 100 TB that costs
    |dim|·salts rows, the explicit price of de-skewing; keep salts
    small and target only the skewed keys in a production split-join.
    """
    if salt_src is None:
        salt_col = F.pmod(F.xxhash64(*fact.columns), F.lit(salts))
    else:
        src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
        salt_col = F.pmod(F.xxhash64(src), F.lit(salts))
    salted_fact = fact.withColumn("__salt", salt_col.cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    return salted_fact.join(salted_dim, on=[key, "__salt"]).drop("__salt")


def salted_groupby_sum(
    df: DataFrame,
    keys: list[str],
    sum_col: str,
    out_col: str,
    salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation: SUM grouped by (keys, salt) then
    re-aggregated by keys.

    Spark's partial aggregation already combines map-side, but a
    single giant group still funnels all its partials into ONE
    reducer; the salt inserts an intermediate fan-in of ``salts``
    reducers. Only associative aggregates (sum/count/min/max) can be
    staged this way — avg must be decomposed into sum+count first
    (exactly how the reference stages its averages,
    q4112.c:75-76,326).
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(sum_col).alias("__partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__partial").alias(out_col))
