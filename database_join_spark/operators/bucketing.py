"""Bucketed-table layout discipline.

Spark's bucketed write emits one file per (writer-task × bucket)
pair: a W-partition DataFrame written with ``bucketBy(B)`` fragments
the table into up to W·B files. Each fragment pays per-file parquet
overhead (footer parse, dictionary init, first-page latency) on
every subsequent scan, and at W=128, B=128 the ~16k fragments made
the cold co-located join FILE-bound, inverting the bucket-count win
(LI_BUCKET_SWEEP.json: fragmented B=128 cold 5.4 s vs aligned
0.57 s at inner=1e7 / outer=1e8).

:func:`write_bucketed_aligned` is the fix, as an operator: it
repartitions by the bucket keys to exactly B partitions before the
bucketed write, so each bucket is ONE file (sorted within, when
``sort_cols`` keep the default). The repartition exchange replaces
the write-side fan-out, so the build is no slower than the
fragmented spelling — and the join plans downstream are identical
(bucketed ``outputPartitioning``, Exchange-free when both sides
share the layout; pinned in tests/test_scale_patterns.py).

This mirrors the reference's layout obligations, split across
Spark's write/read boundary: the reference builds its shared hash
table partition-aligned with the probe split at query time
(q4112_hj.c:73-74,158-170); a shared-nothing engine must instead
bake the alignment into the TABLE at write time, once, and every
subsequent join inherits it. Bucket-count guidance from the same
sweep: size B so each task's build side (build_rows / B entries)
fits in per-core cache — the partitioned analogue of the
reference's fastHashMap capacityBit ablation (README-2.txt:10-11).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_aligned(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed table with exactly one data file
    per bucket.

    ``sort_cols`` defaults to ``bucket_cols`` (sorted buckets keep
    the merge spelling of downstream joins sort-free too).
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    cols = list(bucket_cols)
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    sort = list(sort_cols) if sort_cols is not None else cols
    (
        df.repartition(buckets, *cols)
        .write.bucketBy(buckets, cols[0], *cols[1:])
        .sortBy(sort[0], *sort[1:])
        .mode(mode)
        .saveAsTable(table)
    )


def write_partitioned_aligned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partition-column parquet layout
    (``partitionBy``) with exactly one data file per partition value.

    The same fragmentation disease as the bucketed write, in the
    partitioned-write spelling: ``partitionBy(cols)`` from a
    W-partition frame emits one file per (writer-task × touched
    value) — a 1M-row IVF index written from a 32-task frame over 64
    cells fragmented into ~2k files, and the stored-index scan at
    full cell coverage became FILE-bound, reading 3× slower than the
    un-stored in-memory arm it was meant to beat (ANN_PROBE 1M/200q
    stored-IVF regression, BASELINE.md §ANN). Repartitioning by the
    partition columns first routes each value to exactly one writer
    task ⇒ one file per value.

    Trade documented rather than hidden: one task per value also
    caps write parallelism at the number of distinct values and
    makes a skewed value a straggler file. That is the right default
    for index/dimension tables (few values, scan-dominated); a
    skewed fact table wants a salt column added to the repartition
    (several aligned files per value) — at which point use
    ``df.repartition(F.col(c), F.col(salt))`` directly.
    """
    cols = list(partition_cols)
    if not cols:
        raise ValueError("partition_cols must be non-empty")
    (
        df.repartition(*cols)
        .write.partitionBy(*cols)
        .mode(mode)
        .parquet(path)
    )


def data_file_count(spark: SparkSession, table: str) -> int:
    """Number of data files backing a saved table (layout audit:
    an aligned bucketed table reports exactly its bucket count)."""
    import glob

    location = None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row.col_name == "Location":
            location = row.data_type.removeprefix("file:")
            break
    if location is None:
        raise ValueError(f"no Location for table {table!r}")
    return len(glob.glob(f"{location}/part-*"))
