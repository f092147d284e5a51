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


def skewjoin_detection_confs(
    threshold: str = "16m", factor: float = 2.0, advisory: str = "16m"
) -> dict[str, str]:
    """Per-query SQL confs that make AQE's skew-join split actually
    SEE row skew (measured, SKEWJOIN_PROBE.json).

    AQE detects a skewed partition by COMPRESSED shuffle bytes:
    fire iff size > max(threshold, factor · median-partition-size).
    Both gates systematically under-read row skew, for a structural
    reason: within the hot partition the join key is CONSTANT by
    definition, so its rows lz4-compress better than the uniform
    partitions they are compared against. Measured at 4e8 rows /
    hot key = 25% of the fact: an ~11× ROW skew surfaced as only
    ~2–3× in bytes — the default factor 5.0 never fires (nor does
    3.0; bisected factor 2.0 fires). With these gates the split
    fires even on the pathological key-only fact whose hot
    partition compresses to byte-nothing (`bare_aqe_tuned` arm),
    and the probe's bottom line is decisive: tuned-AQE min-of-3 ran
    20.2 s vs 59.0 s blind-default AQE, 45.7 s no-fix, 33.0 s
    salted, against a 12.4 s uniform floor. Factor 2.0 is the
    load-bearing change; 16m threshold/advisory keep small-shuffle
    queries untouched and split the hot partition finely enough to
    feed all cores.

    Apply per-query around a known-skewed join (the session default
    keeps Spark's stock gates — lowering the factor globally would
    split mild, harmless skew everywhere); `salted_join` remains
    for joins AQE's split cannot touch (non-shuffle plans, or when
    build-side conf control is unavailable) and for pre-committed
    bounded fan-out.
    """
    return {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            threshold
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(factor),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
    }


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

    TRAP (measured, SKEWJOIN_PROBE.json ``bare_salted_rowhash``
    arm): the default row-hash salt needs the fact row to carry
    entropy BEYOND the join key. A fact projected down to the key
    alone makes xxhash64(row) constant per key — every hot-key row
    lands on ONE salt, so nothing disperses and the dim×salts
    replication is pure cost (measured slower than no fix at all).
    Pass an explicit per-row ``salt_src`` (a row id, or any payload
    column) whenever the projected fact is key-only. Also measured
    there: when to salt at all — AQE's skew-join split handles SMJ
    stragglers for free once its byte-based detection gates are
    opened to where row skew is visible, and then BEATS salting
    (20.2 vs 33.0 s min-of-3 at 4e8 rows; no dim replication):
    :func:`skewjoin_detection_confs` has the measured gates and the
    constant-key compression mechanism. Salting remains for joins
    the split cannot touch and for pre-committed bounded fan-out.
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
