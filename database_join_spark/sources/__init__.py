"""Source/sink connectors: schema-explicit readers and partitioned
writers.

The reference's only 'source' is an in-process generator filling
malloc'd arrays (``q4112_main.c:100-104``) and its only 'sink' is a
CSV log line (``q4112_main.c:128-131``). A real engine needs real
connectors; these wrap Spark's columnar readers/writers with the
engine's conventions:

- **schemas are explicit** (no sampling-based inference in production
  paths — inference reads data twice and can drift between runs);
- **writes are partitioned** by low-cardinality keys so downstream
  scans get partition pruning (the disk analogue of the reference's
  hash-partitioned bitmaps, ``q4112.c:110-115``);
- every reader is a vectorized columnar scan with predicate pushdown
  and column pruning intact (verified by ``database_join_spark.plans``
  assertions in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Vectorized parquet scan; optional schema enforcement (fails on
    drift instead of silently widening)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV reader. Schema is REQUIRED: header-only naming plus
    explicit types; never inferSchema (a full extra pass at 100 TB).
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON-lines reader with explicit schema (one doc per line — the
    interchange format of most LLM corpus tooling)."""
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink.

    ``partition_by`` should be low-cardinality (date, lang, source):
    one directory per value gives downstream partition pruning, but
    high-cardinality keys explode into millions of tiny files — the
    classic small-files failure at scale. ``max_records_per_file``
    bounds file size without an extra repartition job.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV sink (interchange/debug; parquet is the scale format)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink for corpus interchange."""
    df.write.mode(mode).json(path)
