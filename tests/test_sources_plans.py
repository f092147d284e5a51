"""Connector round-trips and physical-plan property pins.

The plan tests are the scale-correctness suite: they fail if a code
change silently loses predicate pushdown, column pruning, a broadcast,
or introduces a cartesian product — the regressions that stay
invisible at fixture scale and catastrophic at 100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_join_spark import plans as P
from database_join_spark import sources as S
from database_join_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


# --------------------------------------------------------------------------
# sources: round-trips
# --------------------------------------------------------------------------
def test_parquet_partitioned_roundtrip(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "li")
    S.write_parquet(li, out, partition_by=["l_returnflag"])
    back = S.read_parquet(spark, out)
    assert back.count() == li.count()
    # partition pruning: filtering on the partition key scans only
    # that directory — no l_returnflag filter survives to post-scan
    pruned = back.filter(F.col("l_returnflag") == "R")
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert pruned.count() == want
    assert "PartitionFilters" in P.plan_string(pruned)


def test_csv_roundtrip(spark, tmp_path):
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / "nation_csv")
    S.write_csv(nation, out)
    back = S.read_csv(
        spark,
        out,
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    out = str(tmp_path / "docs_jsonl")
    S.write_jsonl(docs, out)
    back = S.read_jsonl(
        spark, out, schema="doc_id BIGINT, lang STRING, text STRING"
    )
    assert back.count() == docs.count()
    assert back.filter(F.col("text").isNull()).count() == 0


# --------------------------------------------------------------------------
# plans: the scale properties, pinned
# --------------------------------------------------------------------------
def test_broadcast_join_is_broadcast(spark):
    df = REGISTRY["join_broadcast"].fn(spark, SF_DIR)
    P.assert_broadcast_join(df)
    P.assert_no_cartesian(df)


def test_sortmerge_join_is_sortmerge(spark):
    df = REGISTRY["join_sortmerge"].fn(spark, SF_DIR)
    P.assert_in_plan(df, "SortMergeJoin")


def test_predicate_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey")
    pushed = P.pushed_filters(df)
    assert any("l_quantity" in f for f in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    schemas = P.read_schema_columns(df)
    assert schemas and all(len(cols) <= 2 for cols in schemas), schemas
    # the flagship query must also prune: lineitem has 11 columns,
    # the query needs 3
    flag = REGISTRY["agg_avg_of_avgs"].fn(spark, SF_DIR)
    assert all(len(cols) <= 3 for cols in P.read_schema_columns(flag))


def test_flagship_fuses_into_codegen(spark):
    df = REGISTRY["agg_avg_of_avgs"].fn(spark, SF_DIR)
    assert len(P.wholestage_codegen_ids(df)) >= 1


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and "nlj" not in n and n != "dedup_ngram_jaccard"
    ),
)
def test_no_cartesian_anywhere(spark, name):
    """Every oracled query except the explicit NLJ/O(n²) baselines
    must be cartesian-free."""
    P.assert_no_cartesian(REGISTRY[name].fn(spark, SF_DIR))
