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
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed table with exactly one data file
    per bucket.

    ``sort_cols`` defaults to ``bucket_cols`` (sorted buckets keep
    the merge spelling of downstream joins sort-free too). Pass an
    explicit EMPTY sequence to skip the per-file sort: for a
    consumer that only needs the co-location (e.g. an exchange-free
    hash aggregate, which cannot exploit order), the sort is build
    cost with no query-side return — measure both
    (BUCKETED_AGG_PROBE.json records the trade at 1e9 rows).

    ``path`` makes the table EXTERNAL at that location (bucket
    metadata stays in the catalog — Spark's bucketed layout is
    catalog state, which is why this writes through ``saveAsTable``
    and not ``parquet(path)``). That is both the 100 TB spelling
    (bucketed tables live at object-store locations, registered in
    a shared metastore) and what lets a caller keep the data files
    out of the session's warehouse directory.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    cols = list(bucket_cols)
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    sort = list(sort_cols) if sort_cols is not None else cols
    writer = df.repartition(buckets, *cols).write.bucketBy(
        buckets, cols[0], *cols[1:]
    )
    if sort:
        writer = writer.sortBy(sort[0], *sort[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.mode(mode).saveAsTable(table)


def write_partitioned_aligned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    files_per_value: int = 1,
) -> None:
    """Write ``df`` as a partition-column parquet layout
    (``partitionBy``) with a controlled file count: exactly one data
    file per partition value at the default, and up to
    ``files_per_value`` per value otherwise (hash placement of the
    salt groups; collisions can merge a value's groups when the
    shuffle space is small relative to values × files_per_value).

    The same fragmentation disease as the bucketed write, in the
    partitioned-write spelling: ``partitionBy(cols)`` from a
    W-partition frame emits one file per (writer-task × touched
    value) — a 1M-row IVF index written from a 32-task frame over 64
    cells fragmented into ~2k uncontrolled files. Repartitioning by
    the partition columns (plus a deterministic hash salt when
    ``files_per_value > 1``) first routes each value to exactly that
    many writer tasks ⇒ a controlled file count.

    WHEN to align — measured both ways (IVF_LAYOUT_PROBE.json, one
    session, only the layout varied). For SCAN-DOMINATED consumers
    alignment wins twice: value-sorted files compress better (the 1M
    IVF index shrank 270 → 157 MB) and pure decode ran 3–4× faster
    (diagnostic section of the artifact). For COMPUTE-HEAVY
    consumers the scan's split structure becomes the downstream
    stage's task structure, and compaction measured as a REGRESSION:
    the stored-IVF scoring stage at full cell coverage ran 58.8 s on
    the natural ~2k-file layout vs 80.8 s at 1 file/cell and 111.4 s
    at salted ×8 — keep the natural write there (decode was ~1 s in
    every layout; the spread is all task structure). The
    ``files_per_value`` knob exists for layouts that need BOTH a
    bounded file count and multiple splits per value (e.g. a metadata
    store quota); it controls files, not downstream speed — measure
    the consumer before compacting under it.
    """
    cols = list(partition_cols)
    if not cols:
        raise ValueError("partition_cols must be non-empty")
    if files_per_value < 1:
        raise ValueError(
            f"files_per_value must be >= 1, got {files_per_value}"
        )
    if files_per_value == 1:
        aligned = df.repartition(*cols)
    else:
        from pyspark.sql import functions as F

        # deterministic salt from the non-partition columns: same
        # rows ⇒ same layout, no RNG in the write path
        rest = [c for c in df.columns if c not in cols] or list(cols)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in rest]),
            F.lit(files_per_value),
        )
        # explicit numPartitions: an un-pinned repartition is subject
        # to AQE partition coalescing, which merges the salt groups
        # back together and silently undoes the parallelism (measured
        # in this operator's pytest at fixture scale). One extra
        # column-pruned distinct-count job at write time is the
        # ANALYZE-grade price of a write-once index layout.
        n_values = df.select(*cols).distinct().count()
        aligned = df.repartition(
            n_values * files_per_value, *[F.col(c) for c in cols], salt
        )
    (
        aligned.write.partitionBy(*cols)
        .mode(mode)
        .parquet(path)
    )


def compute_bound_read_confs(
    max_partition_bytes: str = "1m", open_cost: str = "64k"
) -> dict[str, str]:
    """Per-query scan confs for a stored table feeding a
    COMPUTE-bound consumer (measured, IVF_SPLIT_PROBE.json).

    A scan's partition count — and with it the task structure of
    every exchange-free stage built on top — is sized by
    ``spark.sql.files.maxPartitionBytes`` (128m) plus a per-file
    ``openCostInBytes`` pad (4m). Those defaults are tuned for
    scan-bound reads; a consumer doing real work per row (ANN
    rescoring, GEMM scoring, decode) starves: the stored-IVF
    full-coverage query ran 58.4 s over the 66 default-sized splits
    of its 2048-file index but 16.5 s over 409 conf-sized splits —
    overturning the r08 conclusion that no stored layout approaches
    the inline arm (26.1 s same-session). The same sweep measured
    the FLOOR of this lever: splits cannot subdivide a parquet ROW
    GROUP, so the one-file-per-value aligned layout (single big row
    group per cell) stayed at 74+ s under every conf — its extra
    "partitions" were empty byte-ranges. Rule: for compute-bound
    consumers keep many small row groups (the natural fragmented
    write) and open the read gates; reserve the aligned compact
    layout for scan-bound readers (its own measured regime,
    LI_BUCKET_SWEEP / write_partitioned_aligned docstring).

    Apply per-query (set around the read, restore after): these
    gates are wrong for genuinely scan-bound tables, where per-file
    and per-task overheads dominate.
    """
    return {
        "spark.sql.files.maxPartitionBytes": max_partition_bytes,
        "spark.sql.files.openCostInBytes": open_cost,
    }


def data_file_count(spark: SparkSession, table: str) -> int:
    """Number of data files backing a saved table (layout audit:
    an aligned bucketed table reports exactly its bucket count).

    The glob is recursive so partitionBy-style layouts (data files
    nested under ``col=value/`` directories) are counted too — a
    top-level-only glob returned 0 for them, which would let a
    layout audit vacuously pass (ADVICE r08)."""
    import glob

    location = None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row.col_name == "Location":
            location = row.data_type.removeprefix("file:")
            break
    if location is None:
        raise ValueError(f"no Location for table {table!r}")
    return len(glob.glob(f"{location}/**/part-*", recursive=True))
