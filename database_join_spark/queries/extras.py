"""Extended relational surface beyond SURVEY §2's inventory: as-of
join, pivot, and the Python UDTF surface.

These round out the 'a reference user could switch' completeness bar:
time-series point-in-time joins (the operator Spark famously lacks as
a builtin), wide-format reshaping, and table-valued functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_join_spark.catalog import table
from database_join_spark.queries import query
from database_join_spark.session import configure_session

#: events.event_type domain (fixtures; FIXTURES.md §B) — pivot needs
#: the column set pinned up front to keep the schema deterministic
#: (Spark's inferring pivot runs an extra distinct job AND its column
#: order would float with the data).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# join_asof / join_asof_bucketed — point-in-time (as-of) join
# --------------------------------------------------------------------------
#: Shared oracle: both physical strategies compute the same relation,
#: so both hash-compare against the one DuckDB spelling (with an
#: explicit (o_orderdate, o_orderkey) DESC tiebreak, because DuckDB's
#: native ASOF JOIN picks an arbitrary row on time ties and an oracle
#: must not be arbitrary).
_ASOF_ORACLE = """
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM ranked WHERE rn = 1
    """


def _asof_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return ev, orders


_ASOF_ARGS = dict(
    left_key="user_id",
    right_key="o_custkey",
    left_time="ts",
    right_time="o_orderdate",
    tiebreak="o_orderkey",
    payload=["o_totalprice"],
)


@query(
    "join_asof",
    # rotated out of the 50-slot driver gate (green r01 row; the
    # bucketed scale variant below holds the gated slot, and pytest
    # hash-parity still runs the identical check here)
    gated=False,
    oracle=_ASOF_ORACLE,
    tags=("extras", "join"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order at-or-before the
    event time for that user (operators/asof.py windowed strategy).

    Spark has no built-in ASOF; this strategy is equi+range join on
    (key, time ≤ ts) then argmax per event. No broadcast: orders is a
    FACT table — the equi component keys a shuffle join. Correct at
    any scale, but a hot user's candidate set is ALL their earlier
    orders per event; join_asof_bucketed bounds that fan-in.
    """
    from database_join_spark.operators.asof import asof_join_windowed

    configure_session(spark)
    ev, orders = _asof_inputs(spark, sf_dir)
    return asof_join_windowed(ev, orders, **_ASOF_ARGS).select(
        "event_id", "user_id", "o_orderkey", "o_totalprice"
    )


@query("join_asof_bucketed", oracle=_ASOF_ORACLE, tags=("extras", "join"),
    gated=False,  # rotated out of the 50-slot gate r03 (green r02 row; pytest hash-compares)
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, time-bucketed strategy — the 100 TB path promised
    by round 1's docstring, now implemented (operators/asof.py).

    Both sides bucket by (user, 30-day window); candidates per event =
    same-bucket orders (time-filtered in the equi join) plus exactly
    one carry-forward row — the latest order from strictly earlier
    buckets, computed as a running max over the per-(user, bucket)
    argmax table (range frame ending at -1). Fan-in per event is
    bounded by bucket width instead of order history length, so a hot
    user cannot create a quadratic pair blow-up. Gated against the
    SAME oracle as join_asof: the two strategies must be bit-equal.
    """
    from database_join_spark.operators.asof import asof_join_bucketed

    configure_session(spark)
    ev, orders = _asof_inputs(spark, sf_dir)
    return asof_join_bucketed(
        ev, orders, bucket_seconds=30 * 24 * 3600, **_ASOF_ARGS
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# pivot_wide — long→wide reshaping with a pinned column domain
# --------------------------------------------------------------------------
@query(
    "pivot_wide",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS n_{t}"
               for t in EVENT_TYPES
           )},
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                AS DOUBLE) AS purchase_value
    FROM events GROUP BY user_id
    """,
    tags=("extras",),
    gated=False,  # driver gates 50 ids; pytest hash-compares this one
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per event type, plus a
    pivoted decimal-stable value sum.

    The pivot value list is pinned (EVENT_TYPES) so the schema is
    deterministic and Spark skips the extra distinct-values job — at
    100 TB an unpinned pivot is both a schema hazard and a full extra
    scan. Under the hood this is exactly one hash aggregation with
    conditional sums, which is what the oracle spells out.
    """
    configure_session(spark)
    ev = table(spark, sf_dir, "events")
    counts = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred;
    # the wide contract wants 0, and column names need the n_ prefix
    for t in EVENT_TYPES:
        counts = counts.withColumnRenamed(t, f"n_{t}").withColumn(
            f"n_{t}", F.coalesce(F.col(f"n_{t}"), F.lit(0)).cast("long")
        )
    pv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("purchase_value")
        )
    )
    return counts.join(pv, "user_id", "left").withColumn(
        "purchase_value", F.coalesce(F.col("purchase_value"), F.lit(0.0))
    )


# --------------------------------------------------------------------------
# agg_salted — two-phase salted aggregation (skew pattern, in the gate)
# --------------------------------------------------------------------------
@query(
    "agg_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("extras", "skew"),
    gated=False,  # rotated out of the 50-slot gate r03 (green r01 row; pytest hash-compares)
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted SUM grouped by a 3-value (maximally skewed)
    key — the de-skew pattern as a gated query.

    Must be bit-equal to the plain GROUP BY (associative aggregate,
    deterministic salt), which is exactly what the oracle asserts.
    The salt stage fans the 3 giant groups over salts×3 reducers
    before the final 3-row merge (operators/skew.py; the reference's
    thread-local-cache motivation, q4112.c:225-237, README-2.txt:41-43).
    """
    from database_join_spark.operators.skew import salted_groupby_sum

    configure_session(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.floor("l_quantity").cast("long").alias("q")
    )
    return salted_groupby_sum(li, ["l_returnflag"], "q", "sum_qty", salts=8)


# --------------------------------------------------------------------------
# source_synthdocs — custom Python DataSource in the gate
# --------------------------------------------------------------------------
@query(
    "source_synthdocs",
    oracle="""
    SELECT CASE range % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'es'
           WHEN 2 THEN 'fr' WHEN 3 THEN 'de' ELSE 'zh' END AS lang,
           COUNT(*) AS n_docs
    FROM range(0, 2000) GROUP BY 1
    """,
    tags=("extras", "source"),
    gated=False,  # driver gates 50 ids; pytest hash-compares this one
)
def source_synthdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource (sources/synthdocs)
    and aggregate — proves the connector works inside the driver's
    own session, not just under pytest.

    The oracle reproduces the source's lang assignment (doc_id mod 5
    over the requested row count) in pure SQL; sf_dir is unused (the
    source generates its input, like the reference's q4112_gen).
    """
    from database_join_spark.sources.synthdocs import register

    configure_session(spark)
    register(spark)
    docs = (
        spark.read.format("synthdocs")
        .option("rows", 2000)
        .option("partitions", 8)
        .load()
    )
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# agg_quantile_exact / agg_quantile_approx — distribution statistics
# --------------------------------------------------------------------------
@query(
    "agg_quantile_exact",
    gated=False,  # rotated out of the 50-slot driver gate (green r01 row / pytest hash-parity)
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.95) AS q95,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("extras", "agg"),
)
def agg_quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group.

    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (type-7 linear
    interpolation, a + (b−a)·f on the two order statistics — IEEE
    ops on identical inputs, so hash-stable without decimal games).
    Exact quantiles need the full sorted group; the 100 TB path is
    the approx variant below.
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("q50"),
        F.expr("percentile(l_quantity, 0.95)").alias("q95"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_quantile_approx", tags=("extras", "agg", "no-oracle"),
    gated=False,  # rotated out of the 50-slot gate r03 (green r02 row; pytest hash-compares)
)
def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald–Khanna sketch) per group —
    the mergeable, bounded-memory scale path (the quantile analogue
    of #10's Flajolet–Martin cardinality sketch, q4112.c:86-117).

    No DuckDB oracle (sketch internals differ between engines);
    tests/test_extras.py pins each approx value within the accuracy
    bound of the exact quantiles.

    The three quantiles are projected to scalar columns via
    ``element_at`` (one shared sketch, three probes) — the driver's
    canonicalizer sorts result columns with pandas, which cannot hash
    an ``array<double>`` cell (CORRECTNESS_r01's only hard failure).
    """
    configure_session(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(l_quantity, array(0.25, 0.5, 0.95), 1000)"
        ).alias("approx_q"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag",
        F.expr("element_at(approx_q, 1)").alias("q25"),
        F.expr("element_at(approx_q, 2)").alias("q50"),
        F.expr("element_at(approx_q, 3)").alias("q95"),
        "n",
    )


# --------------------------------------------------------------------------
# higher_order_funcs — array lambda surface (filter/exists/aggregate…)
# --------------------------------------------------------------------------
@query(
    "higher_order_funcs",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    per_doc AS (
      SELECT lang,
             len(list_filter(toks, x -> strlen(x) > 4)) AS n_long,
             CASE WHEN len(list_filter(toks, x -> strlen(x) > 8)) > 0
                  THEN 1 ELSE 0 END AS has_xlong,
             CAST(list_sum(list_transform(toks, x -> strlen(x)))
                  AS BIGINT) AS total_len
      FROM t
    )
    SELECT lang,
           CAST(SUM(n_long) AS BIGINT) AS sum_long_tokens,
           CAST(SUM(has_xlong) AS BIGINT) AS docs_with_xlong,
           CAST(SUM(total_len) AS BIGINT) AS sum_char_len
    FROM per_doc GROUP BY lang
    """,
    tags=("extras", "functions"),
    gated=False,  # driver gates 50 ids; pytest hash-compares this one
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter / exists / aggregate over
    token arrays, per language.

    The lambda surface (filter, exists, aggregate — transform and
    zip_with are exercised by the similarity/dedup operators) runs
    entirely inside codegen; DuckDB's list lambdas mirror each
    construct exactly, so the whole pack is oracle-checked. Tokens
    materialize as a column before the three lambdas touch them
    (the recompute lesson, operators/dedup.py).
    """
    from database_join_spark.operators.text import tokens as _tokens

    configure_session(spark)
    docs = table(spark, sf_dir, "documents").select(
        "lang", _tokens("text").alias("toks")
    )
    per_doc = docs.select(
        "lang",
        F.expr("size(filter(toks, x -> length(x) > 4))").alias("n_long"),
        F.expr(
            "IF(exists(toks, x -> length(x) > 8), 1, 0)"
        ).alias("has_xlong"),
        F.expr(
            "aggregate(toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
        ).alias("total_len"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_long").cast("long").alias("sum_long_tokens"),
        F.sum("has_xlong").cast("long").alias("docs_with_xlong"),
        F.sum("total_len").cast("long").alias("sum_char_len"),
    )


# --------------------------------------------------------------------------
# window_distribution — distribution window functions (ntile etc.)
# --------------------------------------------------------------------------
@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey,
           s_nationkey,
           ntile(4) OVER w AS quartile,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist() OVER w, 9) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("extras", "window"),
    gated=False,  # driver gates 50 ids; pytest hash-compares this one
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / rank / percent_rank /
    cume_dist per nation over account balance.

    Completes the window surface beyond ranking-top-k (#21) and
    frames/lag (#22). percent_rank and cume_dist are ratios of row
    positions — exact rationals in double — rounded to 9 decimals to
    keep last-ulp division differences out of the hash (same guard
    as cosine). The frame is totally ordered via the s_suppkey
    tiebreak so every position, and hence every value, is unique.
    """
    configure_session(spark)
    sup = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


# --------------------------------------------------------------------------
# udtf_surface — Python user-defined table function (lateral)
# --------------------------------------------------------------------------
@query(
    "udtf_surface",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))
               AS token
      FROM documents
    )
    SELECT doc_id, token, COUNT(*) AS n
    FROM toks GROUP BY doc_id, token
    HAVING COUNT(*) >= 5
    """,
    tags=("extras", "udf"),
    gated=False,  # driver gates 50 ids; pytest hash-compares this one
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: explode each document into (token, count) rows for
    frequent tokens (count ≥ 5).

    The table-function surface (#33) — one input row yields many
    output rows, with arbitrary Python in between. The tokenizer
    matches the engine contract (lowercase, trim, whitespace split =
    operators/text.py TOKENS_SQL) so the DuckDB unnest oracle is
    exact. UDTFs are Arrow-batched per partition: no shuffle, linear
    scan, same scale posture as mapInPandas.
    """
    from pyspark.sql.functions import lit, udtf

    configure_session(spark)

    @udtf(returnType="doc_id bigint, token string, n bigint")
    class FrequentTokens:
        def eval(self, doc_id: int, text: str):
            from collections import Counter

            counts = Counter(text.strip().lower().split())
            for token, n in sorted(counts.items()):
                if n >= 5:
                    yield doc_id, token, n

    spark.udtf.register("frequent_tokens", FrequentTokens)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.token, t.n "
        "FROM __docs_udtf, LATERAL frequent_tokens(doc_id, text) t"
    )
