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

JVM expressions (zip_with/aggregate) everywhere EXCEPT the SemDeDup
within-block scorer, which is an Arrow-batched tiled numpy GEMM
(``_block_scorer`` — the one place the matrix-product shape beats
any per-row SQL spelling by orders of magnitude; exactness argument
in its docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Fixed-point quantization scale: floor(x·10⁷) → BIGINT. Unit-scale
#: float32 coordinates quantize to |q| ≤ 1e7+ε; element products are
#: ≤ ~1e14 and a 64-dim dot sum ≤ ~6.4e15 — far inside int64. The
#: int64 fold is exact and associative → partition-order-independent
#: and bit-identical across engines (the float→double cast, the ×1e7
#: double multiply, and FLOOR are all IEEE-defined and identical in
#: Spark and DuckDB). The ~1e-7 quantization error is documented
#: operator semantics; int64 folds are ~10× cheaper than the
#: DECIMAL(32,18) fold they replaced.
QUANT_SCALE = 10_000_000


def _quant(vec: str) -> str:
    return (
        f"transform({vec}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE}.0) AS BIGINT))"
    )


def dot_q7(a: str, b: str) -> Column:
    """Exact quantized dot product of two array<float> columns
    (int64 fold over floor(x·10⁷) fixed-point coordinates)."""
    return F.expr(
        f"""
        aggregate(
          zip_with({_quant(a)}, {_quant(b)}, (x, y) -> x * y),
          CAST(0 AS BIGINT),
          (acc, v) -> acc + v
        )
        """
    )


def norm2_q7(a: str) -> Column:
    """Exact quantized squared L2 norm (int64 fold)."""
    return dot_q7(a, a)


def cosine(dot_col: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from exact int64 fixed-point parts, rounded to 9
    decimals.

    The int64 parts are < 2^53 so their double casts are exact in
    both engines; rounding to 9 decimals additionally absorbs any
    engine difference in round-to-nearest of the quotient (the same
    guard that fixed a 1-ulp Spark/DuckDB divergence in the earlier
    decimal-fold variant). Ordering uses the rounded value + a
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
        norm2_q7(vec_col).alias("q_n2"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_q7(vec_col).alias("c_n2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                dot_q7("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2")
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

    Hyperplane coordinates are seeded-PRNG constants generated ON THE
    DRIVER and embedded as array literals — they are query constants,
    and the earlier per-row xxhash64 derivation re-generated all
    bits×dim coordinates for every row (measured ~2× the whole ANN
    query's cost). Sign-only use makes the dot precision-insensitive.
    """
    import random

    planes = []
    for j in range(bits):
        rng = random.Random((table_id << 16) | j)
        coords = ", ".join(
            f"{rng.uniform(-1.0, 1.0):.9f}D" for _ in range(dim)
        )
        # h_j · v, folded in double (sign only → precision-insensitive)
        dot = (
            f"aggregate(zip_with({vec_col}, array({coords}), "
            f"(x, h) -> CAST(x AS DOUBLE) * h), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        planes.append(
            f"IF({dot} > 0, shiftleft(CAST(1 AS BIGINT), {j}), CAST(0 AS BIGINT))"
        )
    return F.expr(" + ".join(planes))


def _centroid_fingerprint(
    centroids: list[tuple[int, list[float]]],
) -> str:
    """Deterministic fingerprint of an IVF centroid set. JSON float
    serialization is repr-based, so the value survives the
    write-to-sidecar/read-back round trip the stored-index path uses
    (probe + tests both store centroids as JSON)."""
    import hashlib
    import json

    normalized = [
        [int(cid), [float(x) for x in vec]] for cid, vec in centroids
    ]
    return hashlib.sha256(
        json.dumps(normalized).encode()
    ).hexdigest()[:16]


def _require_index_fingerprint(
    df: DataFrame, col: str, expected: dict, what: str
) -> None:
    """Validate the parameter fingerprint embedded in a stored index
    table's column metadata (ADVICE r08: a stored table built with
    different knobs — or assembled from mismatched halves — silently
    yields wrong/degraded top-k; the fingerprint turns that into a
    loud error). Raises ``ValueError`` on a missing or mismatched
    fingerprint."""
    try:
        meta = dict(df.schema[col].metadata or {})
    except KeyError:
        raise ValueError(
            f"{what}: expected fingerprint column {col!r} is absent "
            f"from the stored index (columns: {df.columns})"
        )
    actual = {k: meta.get(k) for k in expected}
    if actual != expected:
        raise ValueError(
            f"{what}: stored-index fingerprint mismatch — expected "
            f"{expected}, stored {actual}. Rebuild the index with "
            f"the same parameters you query with (a missing "
            f"fingerprint means the table predates fingerprinting "
            f"or was not built by this operator)."
        )


def ivf_index(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Build the IVF index state: the cell-assigned corpus table
    ``(neighbor_id, c_vec, cell, c_n2)`` plus the centroid list.

    This is the ONE-per-corpus pass that :func:`ivf_topk` otherwise
    re-pays per query batch (KMeans fit + assignment + norms). The
    100 TB posture is to MATERIALIZE it: write the returned frame
    with ``.write.partitionBy("cell").parquet(...)`` so each probe
    is a dynamic-partition-pruned scan, and keep the centroids with
    the table metadata — then every query batch costs only its
    probed cells (ANN_PROBE's stored arms measure exactly this).
    Layout note (IVF_LAYOUT_PROBE.json, same-session A/B): keep the
    natural per-writer-task file layout. The scoring stage inherits
    the scan's split structure, and compacting to one (or few
    salted) files per cell REDUCED its parallelism and measured
    slower at full cell coverage (58.8 s natural vs 80.8 aligned /
    111.4 salted; decode itself is ~1 s in every layout) — file-count
    alignment is for scan-dominated consumers
    (``operators.bucketing.write_partitioned_aligned``), not for
    this compute-heavy one. At FULL cell coverage no stored layout
    beats the in-memory inline arm (31.2 s same session): a
    high-coverage batch should score against a cached corpus or use
    the stored-LSH surface instead."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_fv = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col)).alias("fv"),
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="fv", predictionCol="cell"
    ).fit(corpus_fv.select("fv"))
    centroids = [
        (int(cid), [float(x) for x in center])
        for cid, center in enumerate(model.clusterCenters())
    ]
    # Parameter fingerprint rides in the schema metadata of a DATA
    # column (c_n2, not cell: partitionBy("cell") strips the
    # partition column from the data files, so its field metadata
    # does not survive the stored round trip). Spark persists column
    # metadata in the parquet footer schema, so the stored table
    # carries its own build provenance; ivf_topk validates it
    # against the centroid half of the index (ADVICE r08).
    fp_meta = {
        "ivf_n_centroids": n_centroids,
        "ivf_seed": seed,
        "ivf_centroid_fp": _centroid_fingerprint(centroids),
    }
    corpus = model.transform(corpus_fv).select(
        "neighbor_id",
        "c_vec",
        "cell",
        norm2_q7("c_vec").alias("c_n2", metadata=fp_meta),
    )
    return corpus, centroids


def ivf_topk(
    vectors: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: tuple[DataFrame, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """ANN top-k via IVF (inverted-file) coarse quantization.

    A KMeans coarse quantizer (spark.ml, seeded) partitions the
    corpus into ``n_centroids`` cells; each query probes its
    ``n_probe`` nearest cells and rescores exactly (quantized cosine)
    only within them — expected cost |corpus|·n_probe/n_centroids per
    query. At 100 TB: train the quantizer on a sample, store the cell
    id as a partition column so a probe is a partition-pruned scan;
    centroids are driver-side constants (n_centroids × dim floats),
    broadcast implicitly as literals.

    Pass ``index`` (from :func:`ivf_index`, possibly read back from
    its stored parquet) to skip the per-corpus fit/assign pass —
    the stored-index regime where ANN beats brute force even at
    small query counts. The stored corpus carries a build
    fingerprint in its schema metadata; it is validated against the
    centroid half here, so a corpus paired with centroids from a
    different build (or a table not written by :func:`ivf_index`)
    raises instead of silently returning degraded top-k.

    Stored-read sizing (round 9, IVF_SPLIT_PROBE.json): the scoring
    stage's parallelism follows the stored table's SCAN partitioning,
    and default split confs starve it — read the index under
    ``bucketing.compute_bound_read_confs()`` (1m splits / 64k open
    cost). With that, the stored index runs the full-cell-coverage
    batch 16.5 s vs 26.1 s inline — the regime it previously LOST
    2× now wins; keep the natural fragmented write (many small row
    groups), since splits cannot subdivide a parquet row group and
    the compacted aligned layout pins its own floor at 74+ s."""
    from pyspark.sql import Window

    if index is None:
        if vectors is None:
            raise ValueError(
                "ivf_topk: pass either a corpus `vectors` DataFrame "
                "or a prebuilt `index` from ivf_index()"
            )
        corpus, centroids = ivf_index(
            vectors,
            n_centroids=n_centroids,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
        )
    else:
        corpus, centroids = index
        _require_index_fingerprint(
            corpus,
            "c_n2",
            {
                "ivf_n_centroids": len(centroids),
                "ivf_centroid_fp": _centroid_fingerprint(centroids),
            },
            what="ivf_topk",
        )

    # centroid table as literals (driver-side constants, like the LSH
    # hyperplanes); n_probe nearest cells per query via a tiny window
    cent_df = queries.sparkSession.createDataFrame(
        centroids, "cell INT, centroid ARRAY<DOUBLE>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_q7(vec_col).alias("q_n2"),
    )
    d2 = F.expr(
        "aggregate(zip_with(q_vec, centroid, "
        "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("cell"))
    probed = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2)
        .withColumn("cr", F.row_number().over(wq))
        .filter(F.col("cr") <= n_probe)
        .select("query_id", "q_vec", "q_n2", "cell")
    )
    scored = (
        corpus.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                dot_q7("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2")
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


def lsh_corpus_buckets(
    df: DataFrame,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "neighbor_id",
) -> DataFrame:
    """The corpus-side LSH state: ``(out_id, tid, bucket)`` — one row
    per (vector, table). This is the one-per-corpus signature pass
    :func:`lsh_topk` otherwise re-pays per query batch; the 100 TB
    posture is to MATERIALIZE it once (``.write.parquet(...)``,
    optionally bucketed by (tid, bucket)) and hand it back via
    ``lsh_topk(..., corpus_buckets=...)``. The hyperplanes are
    seeded constants, so a stored table stays valid until the corpus
    itself changes."""
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
    # Parameter fingerprint in the bucket column's schema metadata
    # (persisted in the parquet footer): a stored bucket table built
    # with different bits/tables/dim would silently miss every
    # candidate (signatures keyed differently); lsh_topk validates
    # this against its own knobs and raises instead (ADVICE r08).
    fp_meta = {"lsh_bits": bits, "lsh_tables": tables, "lsh_dim": dim}
    return df.select(
        F.col(id_col).alias(out_id), F.explode(sigs).alias("tb")
    ).select(
        out_id,
        "tb.tid",
        F.col("tb.bucket").alias("bucket", metadata=fp_meta),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_buckets: DataFrame | None = None,
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

    Pass ``corpus_buckets`` (from :func:`lsh_corpus_buckets`, read
    back from its stored table) to skip the corpus signature pass —
    it must have been built with the SAME bits/tables/dim (the
    hyperplanes are seeded by (table_id, bit), so equal knobs ⇒
    equal signatures). The build knobs ride in the stored table's
    schema metadata and are VALIDATED here — a mismatched table
    raises instead of silently missing every candidate.
    """
    from pyspark.sql import Window

    if corpus_buckets is None:
        corpus_buckets = lsh_corpus_buckets(
            vectors, bits, tables, dim, id_col, vec_col
        )
    else:
        _require_index_fingerprint(
            corpus_buckets,
            "bucket",
            {"lsh_bits": bits, "lsh_tables": tables, "lsh_dim": dim},
            what="lsh_topk",
        )
    cand = (
        corpus_buckets.join(
            F.broadcast(
                lsh_corpus_buckets(
                    queries, bits, tables, dim, id_col, vec_col, "query_id"
                )
            ),
            on=["tid", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_q7(vec_col).alias("q_n2"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_q7(vec_col).alias("c_n2"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                dot_q7("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2")
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


# --------------------------------------------------------------------------
# k-means clustering (exact fixed-point) — topic/style bucketing
# --------------------------------------------------------------------------
def _literal_dists_sql(centroids: list[list[int]]) -> str:
    """The k-centroid exact-int64 squared-distance array as ONE SQL
    expression string. The previous spelling built the same tree via
    k·dim ``F.lit`` Column calls — each a py4j round trip, measured
    ~0.3 s of pure driver time per assign construction at k=10/dim=64
    (SEMDEDUP_SF01_WALL_PROBE.json build_plan phase); one ``F.expr``
    parse of a few-KB string is milliseconds for the identical
    analyzed expression (int64 literals, same fold, same result)."""
    per_cent = ",".join(
        "aggregate(zip_with(qv, array("
        + ",".join(f"{int(c)}L" for c in cent)
        + "), (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        "(acc, v) -> acc + v)"
        for cent in centroids
    )
    return f"array({per_cent})"


def kmeans_assign(
    base: DataFrame,
    centroids: list[list[int]],
    impl: str = "auto",
) -> DataFrame:
    """Assign every row of ``base`` (columns ``id``, ``qv`` — a
    quantized int64 vector from :func:`_quant`) to its nearest
    centroid by EXACT integer squared distance.

    Centroids ride into the plan as literal int64 arrays (k·dim
    constants — plan-size-bounded, no join, no shuffle); the
    distance fold ``Σ(x−y)²`` stays inside int64 for unit-scale
    q7-quantized coordinates (diff ≤ 2·10⁷, square ≤ 4·10¹⁴, ×64
    dims ≈ 2.6·10¹⁶ < 2⁶³). ``array_position(…, array_min(…))``
    takes the FIRST minimum, so distance ties break to the lowest
    cluster index deterministically. ``impl`` as in
    :func:`kmeans_assign_topm`: past :data:`LITERAL_ASSIGN_MAX_K`
    centroids ``"auto"`` switches to the bit-identical
    broadcast/GEMM spelling (:func:`kmeans_assign_np`), and past
    :data:`~database_join_spark.plans.sizing.TWOLEVEL_ASSIGN_MIN_K`
    to the two-level quantizer (:func:`kmeans_assign_np_2l`, n·√k
    work — identical wherever the coarse probe covers the true
    nearest cell), which is what keeps the FIT loop sub-n·k under
    :func:`~database_join_spark.plans.sizing.k_for`'s k ∝ n.
    """
    if impl not in ("auto", "literal", "np", "np2l"):
        raise ValueError(
            f"impl must be auto|literal|np|np2l, got {impl!r}"
        )
    if impl == "np2l" or (
        impl == "auto" and len(centroids) >= _twolevel_min_k()
    ):
        return kmeans_assign_np_2l(base, centroids)
    if impl == "np" or (
        impl == "auto" and len(centroids) > LITERAL_ASSIGN_MAX_K
    ):
        return kmeans_assign_np(base, centroids)
    dists = F.expr(_literal_dists_sql(centroids))
    return base.withColumn("dists", dists).select(
        "id",
        "qv",
        F.expr("CAST(array_position(dists, array_min(dists)) AS INT)")
        .alias("cluster"),
        F.array_min("dists").alias("sqdist"),
    )


#: Cell budget (rows × dim) under which the Lloyd loop runs on the
#: DRIVER over one bounded collect instead of as iterations×2 Spark
#: jobs. Rationale: the fit input is bounded BY DESIGN — callers fit
#: on ``fit_sample_mod_for``'s ~100-rows-per-centroid hash sample —
#: and the round-13 sf0.1 wall probe (SEMDEDUP_SF01_WALL_PROBE.json)
#: measured the distributed loop at 3.7 s of the dedup_semantic
#: bench row's 4.44 s: per-iteration plan analysis + codegen of the
#: k·dim literal centroid tree plus two tiny jobs, pure fixed
#: overhead at sample scale. 2²² int64 cells = 32 MiB collected —
#: e.g. 65k rows at dim 64 (k ≈ 650 under the 100-rows/centroid
#: rule) — far inside driver memory and maxResultSize; above the
#: budget the distributed loop is unchanged. The numpy loop is
#: BIT-IDENTICAL (pinned, tests/test_pipeline.py): same k-lowest-id
#: seed, exact int64 distances via :func:`_np_sqdists`, argmin's
#: first-minimum tie break == ``array_position(array_min)``, and the
#: same floor-div centroid update the distributed path computes.
DRIVER_FIT_MAX_CELLS = 1 << 22


def _kmeans_lloyd_np(
    rows: list,
    k: int,
    iterations: int,
    track_inertia: bool,
) -> tuple[list[list[int]], list[int]]:
    """Driver-side exact-int64 Lloyd loop over collected (id, qv)
    rows — the bit-identical small-sample spelling of the
    distributed loop in :func:`kmeans_fit` (see
    :data:`DRIVER_FIT_MAX_CELLS`). Returns (centroids, history)."""
    import numpy as np

    ordered = sorted(rows, key=lambda r: r.id)
    q = np.array([list(r.qv) for r in ordered], dtype=np.int64)
    k = min(k, q.shape[0])
    cents = q[:k].copy()  # k lowest-id seeds, id order
    history: list[int] = []
    for _ in range(iterations):
        n2c = np.einsum("ij,ij->i", cents, cents)
        # tile rows so the (chunk × k) distance matrix stays inside
        # the same cell budget as the Arrow assign (_ASSIGN_TILE_CELLS)
        step = max(1, _ASSIGN_TILE_CELLS // max(1, k))
        assign = np.empty(q.shape[0], dtype=np.int64)
        d2min = np.empty(q.shape[0], dtype=np.int64)
        for lo in range(0, q.shape[0], step):
            d2 = _np_sqdists(q[lo : lo + step], cents, n2c)
            assign[lo : lo + step] = np.argmin(d2, axis=1)
            d2min[lo : lo + step] = np.min(d2, axis=1)
        if track_inertia:
            history.append(sum(int(v) for v in d2min))
        new = cents.copy()
        for j in range(k):
            members = q[assign == j]
            if len(members):
                # Python-int floor div == the distributed path's
                # ``s // n`` update (sums bounded: |q| ≤ ~1e7 × the
                # ≤ DRIVER_FIT_MAX_CELLS rows collected « 2^63)
                new[j] = members.sum(axis=0, dtype=np.int64) // len(
                    members
                )
        cents = new
    return [[int(c) for c in row] for row in cents], history


#: :func:`_driver_fit_rows` sentinels — distinguish "the input was
#: collected and exceeds the row cap" (size PROVEN > max_rows ≥ k
#: whenever k·dim fits the budget) from "no collect was attempted"
#: (k·dim alone over budget, or the caller's n_hint proves the input
#: over the cap) so callers with a minimum-rows decision to make
#: (semdedup_pairs' degenerate-sample guard) know whether the probe
#: already answered it.
_PROBE_OVER_BUDGET = "over_budget"
_PROBE_SKIPPED = "skipped"


def _driver_fit_rows(
    base: DataFrame,
    k: int,
    n_hint: int | None = None,
    dim_hint: int | None = None,
) -> list | str:
    """Bounded driver-fit probe (see :data:`DRIVER_FIT_MAX_CELLS`):
    collect the fit input iff it provably fits the driver cell
    budget. One ``head()`` job for the dimension plus at most one
    ≤32 MiB collect — the row cap is ``DRIVER_FIT_MAX_CELLS // dim``
    with NO ``max(k, …)`` escape hatch (ADVICE r13: the old cap let
    a k=110k/dim=768 fit collect ~0.7 GB to the driver only to fall
    back anyway); when ``k·dim`` alone exceeds the budget the driver
    loop could not hold the centroid matrix either, so the probe
    skips without collecting. ``n_hint`` (ADVICE r13) is the
    caller's known row count for ``base``: when it proves the input
    over the cap the collect is skipped outright — large fits pay
    zero probe jobs beyond the head.

    ``dim_hint`` (round 14) is the caller's known vector
    dimensionality — the engine's embedding tables are fixed-dim by
    construction, so one cached catalog value (``parquet_list_dim``)
    stands for the whole column and the per-run ``head(1)``
    dim-discovery job is skipped: the row cap is computed from the
    hint and emptiness falls out of the collect itself. A trusted
    statistic like n_hint: both come from the same table catalog.

    Returns the collected rows (possibly empty), or
    :data:`_PROBE_OVER_BUDGET` / :data:`_PROBE_SKIPPED`.
    """
    if dim_hint is not None:
        dim = max(1, dim_hint)
    else:
        head = base.select("qv").head(1)
        if not head:
            return []
        dim = max(1, len(head[0].qv))
    if k * dim > DRIVER_FIT_MAX_CELLS:
        return _PROBE_SKIPPED
    max_rows = DRIVER_FIT_MAX_CELLS // dim
    if n_hint is not None and n_hint > max_rows:
        return _PROBE_SKIPPED
    rows = base.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        return _PROBE_OVER_BUDGET
    return rows


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iterations: int = 5,
    track_inertia: bool = False,
    assign_impl: str = "auto",
    fit_mode: str = "auto",
    n_hint: int | None = None,
    dim_hint: int | None = None,
) -> tuple[DataFrame, list[list[int]], list[int]]:
    """Lloyd's k-means over an embedding column in EXACT fixed-point
    integer arithmetic — every distance, assignment, and centroid
    update is an int64 computation, so the fit is bit-deterministic
    across runs, partitionings, and re-orderings (a float k-means
    is not: parallel double sums drift with partition order, and a
    point near a Voronoi boundary can flip clusters run-to-run).

    Per iteration: one map-stage assignment (:func:`kmeans_assign`,
    no shuffle — literal centroids at fixture k, broadcast/GEMM past
    :data:`LITERAL_ASSIGN_MAX_K`, and the two-level n_s·√k quantizer
    past ``TWOLEVEL_ASSIGN_MIN_K``, which under k_for's k ∝ n is
    what keeps the fit's per-iteration work sub-n·k), then one
    vocabulary-bounded aggregation — posexplode to (cluster, pos,
    val) and sum/count — whose exchange carries at most k·dim
    groups after map-side partial aggregation. The driver holds
    ONLY the k·dim centroid matrix (the same scalar-bounded loop
    contract as connected_components): rows never collect. New
    centroid coordinate = floor mean ``Σq DIV n`` (exact int64 to
    ~10¹¹ members per cluster at q7 scale); a cluster that loses
    all members keeps its previous centroid. Init = the k
    lowest-id vectors (deterministic, no RNG).

    Returns (final assignment DataFrame, final centroids, inertia
    history — empty unless ``track_inertia``, which adds one extra
    job per iteration and exists for the monotone-objective
    property test; the production path leaves it off).

    ``n_hint`` (round 14, ADVICE r13): the caller's known row count
    for ``df`` — when it proves the input over the driver-fit row
    cap the probe's bounded collect is skipped outright, so large
    fits pay one head() job instead of head + a ≤32 MiB collect.
    A hint, never a limit: absent or small hints change nothing.

    Driver/distributed bit-parity is scoped to the EXACT-assign
    regime (k below ``TWOLEVEL_ASSIGN_MIN_K`` under
    ``assign_impl='auto'``, or an explicit exact impl): past it the
    distributed loop's per-iteration assign runs the two-level
    quantizer, whose bounded deviation (measured 2e-6 at 1M/k=1000,
    SEMDEDUP_TWOLEVEL_PROBE.json) can move a boundary vector between
    clusters, while the driver loop's numpy argmin is always exact —
    so fit_mode='driver' vs 'distributed' can diverge there (ADVICE
    r13). Fixture-scale k never enters that regime.
    """
    base, cents, history = _fit_centroids(
        df,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        iterations=iterations,
        track_inertia=track_inertia,
        assign_impl=assign_impl,
        fit_mode=fit_mode,
        n_hint=n_hint,
        dim_hint=dim_hint,
    )
    return kmeans_assign(base, cents, impl=assign_impl), cents, history


def _fit_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iterations: int = 5,
    track_inertia: bool = False,
    assign_impl: str = "auto",
    fit_mode: str = "auto",
    n_hint: int | None = None,
    dim_hint: int | None = None,
) -> tuple[DataFrame, list[list[int]], list[int]]:
    """:func:`kmeans_fit` minus the returned assignment — the
    centroids-only core, split out (round 14) for callers that
    discard the assignment (``semdedup_pairs`` blocks on its OWN
    full-corpus frame): constructing the k·dim literal assign tree
    costs real Catalyst analysis time that a centroids-only caller
    never executes. Returns (quantized persisted base, centroids,
    inertia history)."""
    from database_join_spark.session import track_persist

    # Persisted: the loop reads ``base`` iterations+1 times (one
    # assign + one stats aggregation per iteration, plus the returned
    # assignment) and each read otherwise re-runs the scan + sample
    # filter + quantization from parquet — at the sampled-fit scale
    # (fit_sample_mod keeps ~100·k rows) the cached frame is
    # ~dim·8 B/row while the un-cached replay is a full-corpus scan
    # per iteration. Routed through track_persist so the next gated
    # query's configure_session drains it.
    if fit_mode not in ("auto", "driver", "distributed"):
        raise ValueError(
            f"fit_mode must be auto|driver|distributed, got {fit_mode!r}"
        )
    base = track_persist(
        df.select(
            F.col(id_col).alias("id"),
            F.expr(_quant(vec_col)).alias("qv"),
        )
    )
    if fit_mode != "distributed":
        # Bounded driver fit (round 13, see DRIVER_FIT_MAX_CELLS /
        # _driver_fit_rows): if the input exceeds the cell budget the
        # collect is abandoned (or, with n_hint / k·dim over budget,
        # never attempted) and the distributed loop below runs
        # unchanged (its cost at that scale dwarfs the probe's).
        rows = _driver_fit_rows(
            base, k, n_hint=n_hint, dim_hint=dim_hint
        )
        if isinstance(rows, list) and rows:
            cents, history = _kmeans_lloyd_np(
                rows, k, iterations, track_inertia
            )
            return base, cents, history
        if fit_mode == "driver":
            if isinstance(rows, list):
                # Empty input under the strict mode used to fall
                # through silently to the distributed seed/loop
                # (ADVICE r13) — fail like the over-budget case does.
                raise ValueError(
                    "fit_mode='driver' on an empty input: nothing "
                    "to fit"
                )
            raise ValueError(
                f"fit_mode='driver' but input exceeds the driver "
                f"cell budget ({rows}; "
                f"DRIVER_FIT_MAX_CELLS={DRIVER_FIT_MAX_CELLS})"
            )
    seed_rows = base.orderBy("id").limit(k).collect()
    cents = [list(r.qv) for r in sorted(seed_rows, key=lambda r: r.id)]
    # Fewer rows than k → fewer seeds than the update loop iterates;
    # clamp so the fit degenerates gracefully (every row its own
    # cluster) instead of raising IndexError on cents[j].
    k = min(k, len(cents))
    history: list[int] = []
    for _ in range(iterations):
        assigned = kmeans_assign(base, cents, impl=assign_impl)
        if track_inertia:
            history.append(
                int(
                    assigned.agg(
                        F.sum(F.col("sqdist").cast("decimal(38,0)"))
                    ).collect()[0][0]
                )
            )
        stats = (
            assigned.select(
                "cluster", F.posexplode("qv").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cluster.setdefault(r.cluster, {})[r.pos] = (r.s, r.n)
        cents = [
            [
                coords[p][0] // coords[p][1]
                for p in sorted(coords)
            ]
            if (coords := by_cluster.get(j + 1))
            else cents[j]
            for j in range(k)
        ]
    return kmeans_assign(base, cents, impl=assign_impl), cents, history


def _snap_ratio(ratio: float) -> tuple[int, int]:
    """Snap an adaptive-probe ratio to an exact small fraction p/q
    (q ≤ 8) for the int64 boundary comparison ``d²_j·q ≤ d²_min·p``.
    Refuses a silent snap (ADVICE r09: 1.1 would become 9/8 = 1.125
    with no signal beyond the docstring)."""
    from fractions import Fraction

    if ratio < 1.0:
        raise ValueError(f"ratio must be >= 1, got {ratio}")
    frac = Fraction(ratio).limit_denominator(8)
    p, q = frac.numerator, frac.denominator
    if abs(p / q - ratio) > 1e-9:
        raise ValueError(
            f"ratio={ratio} is not exactly representable with "
            f"denominator <= 8 (nearest {p}/{q} = {p / q}); pass "
            f"one that is (e.g. 1.25, 1.5, 9/8 = 1.125)"
        )
    return p, q


#: Largest k the literal-centroid assign spelling stays the default
#: for. The literal path rides k·dim int64 constants into the plan —
#: plan-visible, zero Python, ideal at fixture k — but the expression
#: tree grows O(k·dim) and the per-row fold costs the same O(k·dim)
#: WITHOUT BLAS, so past ~64 centroids the Arrow/GEMM assign
#: (:func:`kmeans_assign_topm_np`) is both the faster and the only
#: plan-size-viable spelling (k_for(1M) ≈ hundreds; SemDeDup's
#: LAION recipe is 110k clusters — a literal plan cannot carry that).
LITERAL_ASSIGN_MAX_K = 64


def _np_sqdists(q, cents, n2c):
    """Exact int64 squared-distance matrix between batch rows ``q``
    (b×dim int64) and centroids ``cents`` (k×dim int64):
    d²[i,j] = |q_i|² + |c_j|² − 2·q_i·c_j. The cross-dot runs as a
    float64 GEMM when every partial sum provably stays an integer
    ≤ 2^53 (dim·amax² bound — the same guard as
    :func:`_block_scorer`), else as an int64 matmul (no BLAS, still
    exact to 2^63); the combine is int64 either way."""
    import numpy as np

    dim = q.shape[1]
    amax = int(max(np.abs(q).max(initial=0), np.abs(cents).max(initial=0)))
    if dim * amax * amax < (1 << 53):
        dot = (
            q.astype(np.float64) @ cents.T.astype(np.float64)
        ).astype(np.int64)
    else:
        dot = q @ cents.T
    n2q = np.einsum("ij,ij->i", q, q)
    return n2q[:, None] + n2c[None, :] - 2 * dot


#: Cell budget for one tiled distance matrix in the Arrow assign:
#: ≤ 2^24 int64 cells (128 MiB) per (row-chunk × k) block — the same
#: discipline as :data:`_GEMM_TILE_CELLS`; without it a 10k-row Arrow
#: batch against k=10000 centroids materializes an 800 MB matrix PER
#: WORKER and the assign drowns in allocation churn (measured on the
#: round-12 k-ladder).
_ASSIGN_TILE_CELLS = 1 << 24

#: Cap on ROWS EMITTED per assign tile (round 14): the Arrow-batch
#: sweep at the 8M rung (SEMDEDUP_8M_TUNE_PROBE.json) measured the
#: mapInPandas assign at 60 s with the default 10k-row input batches,
#: 45 s at 2.5k, and 176 s at 40k — identical emitted rows — i.e.
#: per-yield frame size, not distance arithmetic, drives the wall
#: through worker allocation churn (each yielded row carries a
#: dim-length object array). Bounding the tile by emitted rows
#: (tile_rows · m) reproduces the measured optimum without touching
#: the session-global Arrow batch conf that every OTHER pandas op
#: shares. 10k emitted rows ≈ the measured-best 2.5k input rows at
#: m=4.
_ASSIGN_EMIT_ROWS = 10_000


def _topm_exact(d2, m):
    """Top-m column indices per row of ``d2``, ordered exactly like
    ``argsort(kind='stable')`` — ascending (value, index) — without
    paying a full-row sort: ``argpartition`` selects the m smallest
    in O(k) (measured 5.7× cheaper than the stable argsort at
    k=3162 on the round-12 ladder), a 4-element lexsort orders them,
    and the rare rows where the selection boundary TIES (argpartition
    makes no stability promise among equal values) fall back to the
    stable sort so the emitted set is bit-identical to the literal
    plan's ``array_sort`` in every case. Returns ``(order,
    sorted_d)`` with shapes (rows, m).
    """
    import numpy as np

    k = d2.shape[1]
    if m >= k:
        order = np.argsort(d2, axis=1, kind="stable")
        return order, np.take_along_axis(d2, order, axis=1)
    sel = np.argpartition(d2, m - 1, axis=1)[:, :m]
    selv = np.take_along_axis(d2, sel, axis=1)
    # stable (value, index) order within the selected m
    ord_in = np.lexsort((sel, selv), axis=1)
    order = np.take_along_axis(sel, ord_in, axis=1)
    sorted_d = np.take_along_axis(selv, ord_in, axis=1)
    # boundary ties: a value equal to the m-th smallest may sit
    # outside the partition — resolve those rows the slow way
    thresh = sorted_d[:, -1]
    tied = np.nonzero((d2 <= thresh[:, None]).sum(axis=1) > m)[0]
    for i in tied:
        row = np.argsort(d2[i], kind="stable")[:m]
        order[i] = row
        sorted_d[i] = d2[i, row]
    return order, sorted_d


def kmeans_assign_topm_np(
    base: DataFrame,
    centroids: list[list[int]],
    m: int,
    ratio: float | None = None,
) -> DataFrame:
    """Arrow/GEMM spelling of :func:`kmeans_assign_topm` — identical
    output bit-for-bit (pinned by tests/test_pipeline.py), built for
    the k the literal plan cannot carry (k_for(n) grows with the
    corpus; the literal expression tree is O(k·dim) PER ROW of plan
    and fold cost).

    The k×dim centroid matrix ships once per executor as a Spark
    broadcast (NOT in the task closure — at SemDeDup's LAION-scale
    110k clusters the matrix is ~56 MB), and each Arrow batch scores
    against it with one exact GEMM (:func:`_np_sqdists`). Top-m
    selection is ``argsort(kind='stable')`` — ties break to the
    lowest cluster index, the same (distance, index) struct order as
    the literal ``array_sort`` spelling. The adaptive-``ratio``
    filter is the identical int64 comparison (``d²·q ≤ d²_min·p``,
    :func:`_snap_ratio`); because the m candidate distances come out
    sorted ascending, the keep-mask is a per-row prefix and the
    nearest centroid always survives.

    Same map-only shape as the literal path: no shuffle, one
    exploded (id, qv, block) row per surviving probe.
    """
    import numpy as np
    from pyspark.sql import SparkSession

    pq = None if ratio is None else _snap_ratio(ratio)
    cents = np.asarray(centroids, dtype=np.int64)
    n2c = np.einsum("ij,ij->i", cents, cents)
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast((cents, n2c))

    k = len(centroids)
    tile_rows = max(
        1,
        min(
            _ASSIGN_TILE_CELLS // max(1, k),
            _ASSIGN_EMIT_ROWS // max(1, m),
        ),
    )

    def assign(batches):
        import pandas as pd

        C, n2C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv_obj = pdf["qv"].to_numpy()
            ids_all = pdf["id"].to_numpy()
            for lo in range(0, len(pdf), tile_rows):
                sl = slice(lo, min(lo + tile_rows, len(pdf)))
                q = np.stack(qv_obj[sl]).astype(np.int64, copy=False)
                d2 = _np_sqdists(q, C, n2C)
                order, sorted_d = _topm_exact(d2, m)
                if pq is None:
                    row_idx = np.repeat(
                        np.arange(len(q)), order.shape[1]
                    )
                    blocks = order.ravel() + 1
                else:
                    p, qd = pq
                    keep = sorted_d * qd <= sorted_d[:, :1] * p
                    row_idx = np.repeat(
                        np.arange(len(q)), keep.sum(axis=1)
                    )
                    blocks = order[keep] + 1
                yield pd.DataFrame(
                    {
                        "id": ids_all[sl][row_idx],
                        "qv": qv_obj[sl][row_idx],
                        "block": blocks.astype(np.int32),
                    }
                )

    return base.select("id", "qv").mapInPandas(
        assign, schema="id long, qv array<long>, block int"
    )


#: Coarse-level probe cap / ratio for the two-level assign: a vector
#: probes its ``COARSE_PROBE_M`` nearest coarse cells, pruned by the
#: same exact int64 prefix rule as the fine level (``d²_c·q ≤
#: d²_cmin·p``). The coarse probe must be WIDER than the fine one —
#: the fine top-m can only be found inside probed cells, so a missed
#: coarse cell silently truncates the candidate set. At 8/2.0 the 1M
#: probe (k=k_for=1000) measured emitted-row deviation vs the flat
#: assign on identical centroids at 2·10⁻⁶ — 8 rows of 4.04M, under
#: BOTH the shipped ratio-capped spelling and the uncapped m=4 —
#: while pruning the fine work to ≤ coarse_m of √k cells
#: (SEMDEDUP_TWOLEVEL_PROBE.json; the well-separated fixture pin in
#: tests/test_pipeline.py is exactly zero).
COARSE_PROBE_M = 8
COARSE_PROBE_RATIO = 2.0


def centroid_router(
    centroids: list[list[int]], kc: int, iterations: int = 8
):
    """Group ``k`` fine centroids into ``kc`` coarse cells by running
    exact int64 Lloyd's ON THE CENTROIDS THEMSELVES — k rows of
    driver-side numpy (k·kc·dim work per iteration; at the SemDeDup
    paper's 110k-cluster scale with kc=√k≈332 and dim 64 that is
    ~2.3e9 integer ops — single-digit seconds, once per assign).
    This is what makes the two-level assign bit-compatible with the
    flat one: the FINE centroids are untouched (same fit, same
    coordinates), the router only adds a coarse index over them —
    IVF over centroids instead of a hierarchical re-fit, so any
    probe that covers the true top-m cells reproduces the flat
    output exactly.

    Same determinism discipline as :func:`kmeans_fit`: init = first
    ``kc`` centroids in index order, nearest = first minimum (lowest
    index on ties), update = exact floor mean, an emptied cell keeps
    its previous center. Cells left WITHOUT members are dropped from
    the returned router (a probe routed to an empty cell would
    contribute zero candidates and could leave a vector with no
    home block).

    Returns ``(coarse, cell_of)``: the kc'×dim coarse matrix
    (kc' ≤ kc after empty-cell drop) and the per-fine-centroid cell
    index (int32, 0-based into ``coarse``).
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.int64)
    k = len(cents)
    kc = max(1, min(kc, k))
    coarse = cents[:kc].copy()
    cell = np.zeros(k, dtype=np.int64)
    for _ in range(iterations):
        n2c = np.einsum("ij,ij->i", coarse, coarse)
        cell = np.argmin(_np_sqdists(cents, coarse, n2c), axis=1)
        for j in range(kc):
            members = cents[cell == j]
            if len(members):
                coarse[j] = members.sum(axis=0) // len(members)
    n2c = np.einsum("ij,ij->i", coarse, coarse)
    cell = np.argmin(_np_sqdists(cents, coarse, n2c), axis=1)
    live = np.unique(cell)
    remap = np.full(kc, -1, dtype=np.int64)
    remap[live] = np.arange(len(live))
    return coarse[live], remap[cell].astype(np.int32)


def kmeans_assign_topm_2l(
    base: DataFrame,
    centroids: list[list[int]],
    m: int,
    ratio: float | None = None,
    coarse_m: int = COARSE_PROBE_M,
    coarse_ratio: float | None = COARSE_PROBE_RATIO,
) -> DataFrame:
    """Two-level (coarse → fine-within-cell) spelling of
    :func:`kmeans_assign_topm_np` for the k_for(n) regime where even
    the GEMM assign's n·k distance work is the leading super-linear
    term (k ∝ n ⇒ n·k ∝ n²; VERDICT r12 #2). Per vector: one GEMM
    against the kc ≈ √k coarse centers from :func:`centroid_router`,
    a ratio-capped coarse probe picks ≤ ``coarse_m`` cells, and only
    those cells' fine centroids are scored — n·(kc + coarse_m·k/kc)
    ≈ n·√k work instead of n·k.

    Output contract: the fine centroids and every distance are the
    SAME exact int64 values as the flat path (the router never
    touches them), per-row candidates merge in the identical stable
    (d², index) order, and the same m-cap + ratio-prefix rule
    applies — so wherever the coarse probe covers the true top-m
    cells the emitted rows are bit-identical to
    :func:`kmeans_assign_topm_np` (pinned exact at fixture scale by
    tests/test_pipeline.py; at 1M/k=1000 the measured deviation is
    8 rows of 4.04M = 2·10⁻⁶, SEMDEDUP_TWOLEVEL_PROBE.json — a
    true 4th-nearest centroid in an unprobed cell, the documented
    bounded regime). A vector always probes its
    nearest coarse cell, and the router guarantees every cell is
    non-empty, so every vector keeps at least one block.

    Same map-only shape as the flat spellings: centroid matrices
    ship once per executor as one Spark broadcast, no shuffle, one
    exploded (id, qv, block) row per surviving probe.
    """
    import numpy as np
    from pyspark.sql import SparkSession

    from database_join_spark.plans.sizing import coarse_k_for

    pq = None if ratio is None else _snap_ratio(ratio)
    cpq = None if coarse_ratio is None else _snap_ratio(coarse_ratio)
    cents = np.asarray(centroids, dtype=np.int64)
    k = len(cents)
    coarse, cell_of = centroid_router(cents, coarse_k_for(k))
    kc = len(coarse)
    mc = max(1, min(coarse_m, kc))
    # Permute fine centroids into cell-contiguous order so each
    # probed cell is one matrix slice; global block ids (1-based,
    # identical to the flat path's column index + 1) ride alongside.
    perm = np.lexsort((np.arange(k), cell_of))
    grouped = cents[perm]
    ids_g = (perm + 1).astype(np.int64)
    n2g = np.einsum("ij,ij->i", grouped, grouped)
    cell_start = np.searchsorted(
        cell_of[perm], np.arange(kc + 1)
    ).astype(np.int64)
    n2coarse = np.einsum("ij,ij->i", coarse, coarse)
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(
        (coarse, n2coarse, grouped, ids_g, n2g, cell_start)
    )
    # Tile budget: the candidate matrix is ~coarse_m·(k/kc) columns
    # per row (plus the kc coarse columns) — same 2^24-cell
    # discipline as the flat assign.
    mean_cell = max(1, -(-k // kc))
    tile_rows = max(
        1,
        min(
            _ASSIGN_TILE_CELLS // max(kc, mc * mean_cell),
            _ASSIGN_EMIT_ROWS // max(1, m),
        ),
    )

    def assign(batches):
        import pandas as pd

        C, n2C, G, IDS, n2G, STARTS = bc.value
        kc_l = len(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv_obj = pdf["qv"].to_numpy()
            ids_all = pdf["id"].to_numpy()
            for lo in range(0, len(pdf), tile_rows):
                sl = slice(lo, min(lo + tile_rows, len(pdf)))
                q = np.stack(qv_obj[sl]).astype(np.int64, copy=False)
                nt = len(q)
                # -- coarse probe: stable top-mc + ratio prefix
                d2c = _np_sqdists(q, C, n2C)
                order_c, sorted_c = _topm_exact(d2c, mc)
                if cpq is None:
                    keep_c = np.ones(order_c.shape, dtype=bool)
                else:
                    p_c, q_c = cpq
                    keep_c = (
                        sorted_c * q_c <= sorted_c[:, :1] * p_c
                    )
                probe_rows = np.repeat(
                    np.arange(nt), keep_c.sum(axis=1)
                )
                probe_cells = order_c[keep_c]
                # -- fine scoring, one GEMM per probed cell
                o = np.argsort(probe_cells, kind="stable")
                pr = probe_rows[o]
                pc_sorted = probe_cells[o]
                bounds = np.searchsorted(
                    pc_sorted, np.arange(kc_l + 1)
                )
                cr_parts, ci_parts, cd_parts = [], [], []
                for c in np.unique(pc_sorted):
                    rows_c = pr[bounds[c] : bounds[c + 1]]
                    s, e = STARTS[c], STARTS[c + 1]
                    d2f = _np_sqdists(q[rows_c], G[s:e], n2G[s:e])
                    # Per-cell top-m BEFORE the global merge: the
                    # per-row top-m over the candidate union equals
                    # the top-m over each cell's own top-m (a global
                    # winner is a winner in its cell), and within a
                    # cell the fine ids ascend with the local column
                    # index (the router's lexsort), so _topm_exact's
                    # stable (value, local index) order IS the
                    # (value, global id) order the merge needs —
                    # candidates drop from probes·k/kc to probes·m
                    # per row (~11× less lexsort mass at k=4000).
                    mm = min(m, e - s)
                    loc, locd = _topm_exact(d2f, mm)
                    cr_parts.append(np.repeat(rows_c, mm))
                    ci_parts.append(IDS[s:e][loc].ravel())
                    cd_parts.append(locd.ravel())
                cr = np.concatenate(cr_parts)
                ci = np.concatenate(ci_parts)
                cd = np.concatenate(cd_parts)
                # -- per-row stable (d², id) merge + m-cap + ratio
                o2 = np.lexsort((ci, cd, cr))
                cr, ci, cd = cr[o2], ci[o2], cd[o2]
                counts = np.bincount(cr, minlength=nt)
                starts = np.concatenate(
                    ([0], np.cumsum(counts[:-1]))
                )
                pos = np.arange(len(cr)) - np.repeat(starts, counts)
                keep = pos < m
                if pq is not None:
                    p, qd = pq
                    dmin = np.repeat(cd[starts], counts)
                    keep &= cd * qd <= dmin * p
                yield pd.DataFrame(
                    {
                        "id": ids_all[sl][cr[keep]],
                        "qv": qv_obj[sl][cr[keep]],
                        "block": ci[keep].astype(np.int32),
                    }
                )

    return base.select("id", "qv").mapInPandas(
        assign, schema="id long, qv array<long>, block int"
    )


def kmeans_assign_np(
    base: DataFrame, centroids: list[list[int]]
) -> DataFrame:
    """Arrow/GEMM spelling of :func:`kmeans_assign` (nearest-centroid
    + exact sqdist), bit-identical output — the fit-loop twin of
    :func:`kmeans_assign_topm_np` for k past
    :data:`LITERAL_ASSIGN_MAX_K`. ``argmin`` on the exact int64
    distance row takes the FIRST minimum, matching the literal
    path's ``array_position(dists, array_min(dists))`` tiebreak."""
    import numpy as np
    from pyspark.sql import SparkSession

    cents = np.asarray(centroids, dtype=np.int64)
    n2c = np.einsum("ij,ij->i", cents, cents)
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast((cents, n2c))

    k = len(centroids)
    # nearest-only: one emitted row per input row, so the emit cap
    # divides by 1 (see _ASSIGN_EMIT_ROWS)
    tile_rows = max(
        1,
        min(_ASSIGN_TILE_CELLS // max(1, k), _ASSIGN_EMIT_ROWS),
    )

    def assign(batches):
        import pandas as pd

        C, n2C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv_obj = pdf["qv"].to_numpy()
            ids_all = pdf["id"].to_numpy()
            for lo in range(0, len(pdf), tile_rows):
                sl = slice(lo, min(lo + tile_rows, len(pdf)))
                q = np.stack(qv_obj[sl]).astype(np.int64, copy=False)
                d2 = _np_sqdists(q, C, n2C)
                nearest = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "id": ids_all[sl],
                        "qv": qv_obj[sl],
                        "cluster": (nearest + 1).astype(np.int32),
                        "sqdist": d2[np.arange(len(q)), nearest],
                    }
                )

    return base.select("id", "qv").mapInPandas(
        assign, schema="id long, qv array<long>, cluster int, sqdist long"
    )


def kmeans_assign_np_2l(
    base: DataFrame,
    centroids: list[list[int]],
    coarse_m: int = COARSE_PROBE_M,
    coarse_ratio: float | None = COARSE_PROBE_RATIO,
) -> DataFrame:
    """Two-level (coarse → fine-within-cell) spelling of
    :func:`kmeans_assign_np` — NEAREST-ONLY assignment for the FIT
    loop, the round-13 follow-through on the two-level pair assign:
    SEMDEDUP_TWOLEVEL_PROBE.json measured the sampled fit (153–177 s
    at 4M, n_s·k GEMM per Lloyd iteration under k ∝ n) as the new
    dominant SemDeDup term once the pair assign went two-level. Per
    vector: one GEMM against the kc ≈ √k coarse centers from
    :func:`centroid_router`, the same ratio-capped coarse probe as
    :func:`kmeans_assign_topm_2l`, then per-probed-cell argmin and a
    (d², cluster-id) min-reduce — n_s·(kc + coarse_m·k/kc) ≈ n_s·√k
    distance work per iteration instead of n_s·k.

    Output contract mirrors the flat pair (:func:`kmeans_assign` /
    :func:`kmeans_assign_np`): exact int64 sqdist, ties break to the
    lowest cluster index (within a cell the fine ids ascend with the
    local column, so ``argmin``'s first minimum IS the lowest id; the
    cross-cell merge compares (d², id) explicitly) — bit-identical to
    the flat assign wherever the coarse probe covers the true nearest
    cell (pinned exact at fixture scale by tests/test_pipeline.py;
    the 1M pair-assign deviation bound is 2·10⁻⁶). Every vector
    probes its nearest coarse cell and the router returns no empty
    cells, so every vector is assigned. Inside Lloyd's the rare
    covered-cell miss only nudges one centroid's floor mean — the fit
    stays bit-DETERMINISTIC (pure function of the input), it is just
    not bit-identical to the flat fit's trajectory; SemDeDup's recall
    contract is measured downstream of the fit either way.
    """
    import numpy as np
    from pyspark.sql import SparkSession

    from database_join_spark.plans.sizing import coarse_k_for

    cpq = None if coarse_ratio is None else _snap_ratio(coarse_ratio)
    cents = np.asarray(centroids, dtype=np.int64)
    k = len(cents)
    coarse, cell_of = centroid_router(cents, coarse_k_for(k))
    kc = len(coarse)
    mc = max(1, min(coarse_m, kc))
    perm = np.lexsort((np.arange(k), cell_of))
    grouped = cents[perm]
    ids_g = (perm + 1).astype(np.int64)
    n2g = np.einsum("ij,ij->i", grouped, grouped)
    cell_start = np.searchsorted(
        cell_of[perm], np.arange(kc + 1)
    ).astype(np.int64)
    n2coarse = np.einsum("ij,ij->i", coarse, coarse)
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(
        (coarse, n2coarse, grouped, ids_g, n2g, cell_start)
    )
    mean_cell = max(1, -(-k // kc))
    tile_rows = max(
        1,
        min(
            _ASSIGN_TILE_CELLS // max(kc, mc * mean_cell),
            _ASSIGN_EMIT_ROWS,
        ),
    )

    def assign(batches):
        import pandas as pd

        C, n2C, G, IDS, n2G, STARTS = bc.value
        kc_l = len(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv_obj = pdf["qv"].to_numpy()
            ids_all = pdf["id"].to_numpy()
            for lo in range(0, len(pdf), tile_rows):
                sl = slice(lo, min(lo + tile_rows, len(pdf)))
                q = np.stack(qv_obj[sl]).astype(np.int64, copy=False)
                nt = len(q)
                # -- coarse probe: stable top-mc + ratio prefix
                d2c = _np_sqdists(q, C, n2C)
                order_c, sorted_c = _topm_exact(d2c, mc)
                if cpq is None:
                    keep_c = np.ones(order_c.shape, dtype=bool)
                else:
                    p_c, q_c = cpq
                    keep_c = sorted_c * q_c <= sorted_c[:, :1] * p_c
                probe_rows = np.repeat(
                    np.arange(nt), keep_c.sum(axis=1)
                )
                probe_cells = order_c[keep_c]
                o = np.argsort(probe_cells, kind="stable")
                pr = probe_rows[o]
                pc_sorted = probe_cells[o]
                bounds = np.searchsorted(
                    pc_sorted, np.arange(kc_l + 1)
                )
                # -- per-cell argmin, cross-cell (d², id) min-reduce.
                # Within one cell every row index appears at most
                # once, so the masked update is race-free.
                best_d = np.full(nt, np.iinfo(np.int64).max)
                best_id = np.full(nt, np.iinfo(np.int64).max)
                for c in np.unique(pc_sorted):
                    rows_c = pr[bounds[c] : bounds[c + 1]]
                    s, e = STARTS[c], STARTS[c + 1]
                    d2f = _np_sqdists(q[rows_c], G[s:e], n2G[s:e])
                    loc = np.argmin(d2f, axis=1)
                    dmin = d2f[np.arange(len(rows_c)), loc]
                    gid = IDS[s:e][loc]
                    cur_d = best_d[rows_c]
                    cur_i = best_id[rows_c]
                    better = (dmin < cur_d) | (
                        (dmin == cur_d) & (gid < cur_i)
                    )
                    upd = rows_c[better]
                    best_d[upd] = dmin[better]
                    best_id[upd] = gid[better]
                yield pd.DataFrame(
                    {
                        "id": ids_all[sl],
                        "qv": qv_obj[sl],
                        "cluster": best_id.astype(np.int32),
                        "sqdist": best_d,
                    }
                )

    return base.select("id", "qv").mapInPandas(
        assign, schema="id long, qv array<long>, cluster int, sqdist long"
    )


def _twolevel_min_k() -> int:
    """Late import of the sizing threshold (keeps operators → plans
    a one-way, call-time edge)."""
    from database_join_spark.plans.sizing import TWOLEVEL_ASSIGN_MIN_K

    return TWOLEVEL_ASSIGN_MIN_K


def kmeans_assign_topm(
    base: DataFrame,
    centroids: list[list[int]],
    m: int,
    ratio: float | None = None,
    impl: str = "auto",
) -> DataFrame:
    """Multi-probe cluster assignment: one exploded row per (vector,
    block) for the vector's ``m`` NEAREST centroids — the blocking
    form of :func:`kmeans_assign` (same literal-centroid map stage,
    no shuffle). ``arrays_zip`` + ``array_sort`` order (distance,
    index) structs, so distance ties break to the lowest cluster
    index — the same deterministic rule as ``array_position`` on the
    first minimum, and the same order ``numpy.argsort(kind='stable')``
    yields, which is what lets the multi-probe candidate SET be
    pinned bit-for-bit against an independent fit.

    ``ratio`` (VERDICT r08 #6) makes the probe width ADAPTIVE:
    centroid j is probed only when ``d²_j ≤ ratio · d²_nearest``
    (m becomes the cap). Fixed-m pays the full m-wide candidate
    mass for EVERY vector to recover the few boundary-straddling
    twins; under the ratio rule, vectors deep inside a cell (the
    bulk) probe one cell, and only genuine boundary cases fan out —
    the SEMDEDUP_PROBE measured m=4 paying 17.5× the m=1 candidate
    mass at 1M to recover 173 boundary misses. The comparison is
    exact int64 arithmetic: ratio is snapped to a small fraction
    p/q (q ≤ 8) and evaluated as ``d²_j·q ≤ d²_min·p`` — bounded by
    2.6e16·8 ≈ 2.1e17 < 2⁶³, so no float rounding at the decision
    boundary. The nearest centroid always qualifies (d²·q ≤ d²·p
    for p ≥ q), so every vector keeps at least its home block.

    ``impl``: ``"literal"`` forces the literal-centroid JVM plan,
    ``"np"`` the broadcast/GEMM Arrow spelling
    (:func:`kmeans_assign_topm_np` — bit-identical output),
    ``"np2l"`` the two-level quantizer
    (:func:`kmeans_assign_topm_2l` — n·√k work, identical output
    wherever the coarse probe covers the true top-m cells);
    ``"auto"`` picks np past :data:`LITERAL_ASSIGN_MAX_K` centroids
    (where the literal expression tree stops being viable and BLAS
    wins the O(k·dim)-per-row fold), and np2l past
    :data:`~database_join_spark.plans.sizing.TWOLEVEL_ASSIGN_MIN_K`
    (where under k_for's k ∝ n the flat n·k GEMM becomes the last
    super-linear SemDeDup term).
    """
    k = len(centroids)
    if impl not in ("auto", "literal", "np", "np2l"):
        raise ValueError(
            f"impl must be auto|literal|np|np2l, got {impl!r}"
        )
    if impl == "np2l" or (
        impl == "auto" and k >= _twolevel_min_k()
    ):
        return kmeans_assign_topm_2l(base, centroids, m, ratio)
    if impl == "np" or (impl == "auto" and k > LITERAL_ASSIGN_MAX_K):
        return kmeans_assign_topm_np(base, centroids, m, ratio)
    dists = F.expr(_literal_dists_sql(centroids))
    top_m = (
        f"slice(array_sort(arrays_zip(dists, sequence(1, {k}))), 1, {m})"
    )
    if ratio is None:
        blocks = f"transform({top_m}, s -> CAST(s['1'] AS INT))"
    else:
        p, q = _snap_ratio(ratio)
        blocks = (
            f"transform(filter(top_m, s -> s['dists'] * {q}L <= "
            f"top_m[0]['dists'] * {p}L), s -> CAST(s['1'] AS INT))"
        )
    df = base.withColumn("dists", dists)
    if ratio is not None:
        df = df.withColumn("top_m", F.expr(top_m))
    # ONE-STEP generate (round 10): exploding a named "blocks"
    # column lets InferFiltersFromGenerate insert a size>0 filter
    # whose condition inlines the ENTIRE k-centroid distance
    # computation (dists/top_m collapse into it) — the whole assign
    # runs twice per vector; measured 2.4× (9.5 → 4.0 s at 300k
    # vectors / k=30, identical output). Exploding the expression
    # directly infers no filter (see dedup.shingles_from_tokens
    # docstring for the measured 19× worst case of this trap).
    return df.select("id", "qv", F.explode(F.expr(blocks)).alias("block"))


def semdedup_pairs(
    emb: DataFrame,
    k: int,
    iterations: int,
    m: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ratio: float | None = None,
    fit_sample_mod: int | None = None,
    coarse_score: bool = False,
    n_hint: int | None = None,
    dim_hint: int | None = None,
) -> DataFrame:
    """SemDeDup candidate-pair scoring: exact-integer k-means fit →
    multi-probe blocking (:func:`kmeans_assign_topm`, m nearest
    centroids per vector) → exact quantized cosine on co-blocked
    pairs only → pairs at or above ``threshold``, deduped across
    blocks. The engine's one spelling of the recipe: the registry's
    ``dedup_semantic`` query and the scale probe
    (scripts/semdedup_probe.py) both call this, so what's probed is
    what ships.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, each pair once.
    Precision is exact by construction (every emitted pair carries
    its true quantized cosine); recall misses exactly the true pairs
    sharing none of their m probed clusters — the measured m-curve
    lives on ``_SEMDEDUP_PROBES`` (queries/pipeline.py) and in
    SEMDEDUP_PROBE.json. ``ratio`` switches the blocking to
    distance-ratio ADAPTIVE probing (see
    :func:`kmeans_assign_topm`): m becomes the cap, and only
    vectors near a Voronoi boundary fan out — the probe's adaptive
    arms measure the recall/candidate-mass trade per r.

    ``fit_sample_mod`` fits the k-means on the deterministic
    1-in-mod hash-sample ``xxhash64(id) % mod == 0`` (the ASSIGN
    stays full-corpus — blocking quality depends on where the
    centroids sit, not on which rows placed them). The r09 1M wall
    was fit/assign-bound (446 of 759 s), so this is the at-scale
    lever; SEMDEDUP_PROBE.json's round-10 ``sampled_fit`` arm
    measures the fit-time/recall trade at 1M/k=100. Centroids are
    still bit-deterministic (the sample is a pure id function; the
    k lowest-id sampled vectors seed). If the sample holds fewer
    than k rows (corpus smaller than ~mod·k), the fit silently-wrong
    failure mode is closed by falling back to the full-corpus fit.

    ``n_hint`` (round 13) is the caller's known corpus row count
    (e.g. the cached parquet-footer rowcount). When it proves the
    whole corpus fits one scorer chunk (≤
    :data:`SEMDEDUP_TARGET_CHUNK` rows) the chunk census, its
    broadcast join, and the blocks persist are skipped outright —
    identical output, two fewer jobs. It is a hint, never a limit:
    an absent or large hint runs the full chunking machinery.

    ``dim_hint`` (round 14) is the caller's known embedding
    dimensionality (the cached ``parquet_list_dim`` statistic):
    with it the fit probe computes its row cap directly and skips
    the per-run ``head(1)`` dim-discovery job — the sampled-fit
    common path then pays exactly ONE Spark job (the bounded
    collect) before the blocking assign. Absent hint: unchanged.

    ``coarse_score=True`` switches the within-block scorer to the
    two-tier int8/SGEMM pass (see :func:`_block_scorer`): the
    pairwise sweep runs at float32 GEMM speed over int8 images with
    an exact per-vector angular-error bound, and only coarse
    survivors pay the exact int64 arithmetic — identical output by
    construction (regression-pinned), aimed at the 1M wall the
    sampled-fit probe measured as ~95% scorer.
    """
    # A corpus smaller than ~mod·k can leave the hash sample with
    # fewer than k rows; fitting on it would clamp k toward the
    # sample size and the assign would block against a degenerate
    # centroid set — silently wrong pairs instead of an error
    # (ADVICE r10): a sample with < k rows falls back to the
    # full-corpus fit. Round 14 folds that guard INTO the fit's own
    # driver probe: the bounded collect the driver-side Lloyd fit
    # needs anyway IS the guard's evidence (len(rows) < k ⟺ the old
    # limit(k).count() < k), so the common path pays one collect
    # instead of a separate count job + dim head + collect — and,
    # because only the centroids are needed here (the blocking
    # assign below runs on the FULL corpus), the k·dim literal
    # assign tree kmeans_fit would return is never constructed
    # (measured ~0.1 s of Catalyst analysis per run at k=10/dim=64,
    # SEMDEDUP_R14_PHASE_PROBE.json). Identical decisions, identical
    # centroids, three fewer per-run driver round trips.
    if fit_sample_mod is not None and fit_sample_mod > 1:
        fit_input = emb.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(fit_sample_mod))
            == 0
        )
        # No track_persist: unlike the fit loop, the sample frame is
        # consumed exactly once (head + bounded collect) — caching
        # its blocks bought nothing and cost the memory-store writes.
        sbase = fit_input.select(
            F.col(id_col).alias("id"),
            F.expr(_quant(vec_col)).alias("qv"),
        )
        rows = _driver_fit_rows(sbase, k, dim_hint=dim_hint)
        if isinstance(rows, list) and len(rows) >= k:
            cents, _hist = _kmeans_lloyd_np(
                rows, k, iterations, track_inertia=False
            )
        elif isinstance(rows, list):
            # Degenerate sample (the ADVICE r10 guard): full-corpus
            # fit, with the corpus rowcount hint forwarded so a big
            # corpus skips the probe collect (ADVICE r13).
            _base, cents, _hist = _fit_centroids(
                emb,
                id_col=id_col,
                vec_col=vec_col,
                k=k,
                iterations=iterations,
                n_hint=n_hint,
                dim_hint=dim_hint,
            )
        elif rows == _PROBE_OVER_BUDGET:
            # > max_rows ≥ k sampled rows (the probe only collects
            # when k·dim fits the budget, so max_rows ≥ k): the
            # guard provably passes — distributed fit on the sample,
            # skipping the re-probe it would otherwise repeat.
            _base, cents, _hist = _fit_centroids(
                fit_input,
                id_col=id_col,
                vec_col=vec_col,
                k=k,
                iterations=iterations,
                fit_mode="distributed",
            )
        else:
            # Probe skipped without collecting (k·dim alone over the
            # driver budget): sample size unknown — the explicit
            # guard count is still required, exactly as before.
            fit_guarded = fit_input
            if fit_input.limit(k).count() < k:
                fit_guarded = emb
            _base, cents, _hist = _fit_centroids(
                fit_guarded,
                id_col=id_col,
                vec_col=vec_col,
                k=k,
                iterations=iterations,
            )
    else:
        _base, cents, _hist = _fit_centroids(
            emb,
            id_col=id_col,
            vec_col=vec_col,
            k=k,
            iterations=iterations,
            n_hint=n_hint,
            dim_hint=dim_hint,
        )
    base = emb.select(
        F.col(id_col).alias("id"), F.expr(_quant(vec_col)).alias("qv")
    )
    # Persisted: the blocks frame is consumed twice (the size census
    # below + the chunk-pair join), and without the cache boundary
    # the ENTIRE assign — k·dim distance work per vector — runs
    # twice. Negligible at fixture k, but at k_for(n) scale the
    # assign is a real phase (round-12 ladder) and paying it once is
    # the point. Routed through track_persist so the next gated
    # query's configure_session drains it — a raw .persist here leaked
    # one cached frame per call for the life of a shared session
    # (ADVICE r12); track_persist's default level already degrades to
    # disk spill, not recompute.
    from database_join_spark.session import track_persist

    if n_hint is not None and n_hint <= SEMDEDUP_TARGET_CHUNK:
        # Chunking is PROVABLY a no-op: no block can exceed
        # TARGET_CHUNK rows when the whole corpus has at most that
        # many, so every c would be 1 and every (ch, ca, cb) would be
        # (0, 0, 0). Skipping the census also removes the persist —
        # the blocks frame is consumed exactly once here (round 13:
        # the census job + cache materialization were ~0.3 s of the
        # 4.44 s sf0.1 bench row for a decision with one possible
        # outcome). Output identical by construction.
        chunked = kmeans_assign_topm(
            base, cents, m=m, ratio=ratio
        ).select(
            "block",
            "id",
            "qv",
            F.lit(0).alias("ch"),
            F.lit(0).alias("ca"),
            F.lit(0).alias("cb"),
        )
    else:
        assign_frame = kmeans_assign_topm(base, cents, m=m, ratio=ratio)
        # Memory-adaptive persist (round 14, guide §5: cache only
        # when recompute costs more than the memory pressure): the
        # blocks frame is n·m rows of (block, id, qv) — at 8M
        # vectors / dim 64 / m=4 that is ~17 GB, and persisting it
        # on the default 8 g heap OOM'd the 8M end-to-end probe
        # outright (SEMDEDUP_8M_TUNE_PROBE.json) while the recompute
        # alternative is ONE bounded extra n·√k assign pass (45 s at
        # 8M). When the caller's catalog hints prove the frame over
        # the budget, skip the cache and let the census + chunk-pair
        # join each derive the (deterministic) assign; hints absent
        # or small: persist exactly as before.
        est_bytes = (
            n_hint * m * (dim_hint * 8 + 48)
            if n_hint is not None and dim_hint is not None
            else None
        )
        if (
            est_bytes is not None
            and est_bytes > SEMDEDUP_BLOCKS_PERSIST_MAX_BYTES
        ):
            blocks = assign_frame
        else:
            blocks = track_persist(assign_frame)
        # Chunk-pair parallelism: one task per BLOCK serializes on a
        # skewed cluster (measured: a straggler block pinned the 300k
        # probe arm to one core for 15+ min while 31 sat idle). Blocks
        # larger than TARGET_CHUNK rows are hash-split into c chunks
        # and every chunk PAIR (ca ≤ cb) becomes its own task: the
        # Σ|block|² pair work is unchanged but spreads over c(c+1)/2
        # tasks. Price: each row of an oversized block replicates c
        # times into the block's chunk-pair groups (c = ⌈s/TARGET⌉ —
        # the shuffle grows only for blocks that need the parallelism;
        # c=1 blocks pay nothing). Right-sized blocks (k ∝ n) keep c=1
        # everywhere and this is a no-op. Persisted: the blocks frame
        # is consumed twice (census + chunk-pair join) — without the
        # cache boundary the ENTIRE assign runs twice; routed through
        # track_persist so the next gated query's configure_session
        # drains it (ADVICE r12).
        sizes = blocks.groupBy("block").agg(F.count(F.lit(1)).alias("s"))
        chunks = sizes.select(
            "block",
            F.greatest(
                F.lit(1), F.ceil(F.col("s") / SEMDEDUP_TARGET_CHUNK)
            )
            .cast("int")
            .alias("c"),
        )
        chunked = (
            blocks.join(F.broadcast(chunks), "block")
            .withColumn(
                "ch", F.pmod(F.xxhash64("id"), F.col("c")).cast("int")
            )
            .withColumn("other", F.explode(F.expr("sequence(0, c - 1)")))
            .select(
                "block",
                "id",
                "qv",
                "ch",
                F.least("ch", "other").alias("ca"),
                F.greatest("ch", "other").alias("cb"),
            )
        )
    # Scorer-exchange width (round 14, guide §2.2/§2.5): the
    # per-group GEMM's cost is Σ|block|² — quadratic in group size
    # and invisible to AQE's byte-based coalescing. In the TINY
    # regime (the n_hint ≤ TARGET_CHUNK fast path: whole corpus a
    # few thousand rows) that coalescing collapses the exchange to
    # ONE post-shuffle task and runs every block's GEMM serially in
    # one Python worker — an explicit repartition(k) pins one task
    # per block (measured at sf0.1: 0.88 → 0.70 s on the scorer
    # subplan, identical output). In the census regime the blocks
    # carry real bytes (≥ MBs per block) and AQE's coalescing
    # already yields well-sized multi-block tasks; pinning k tasks
    # there is a TINY-TASK regression, measured at the 8M rung
    # (k=8080 single-block tasks: e2e 1353 s vs the r13 AQE-width
    # 542 s, SEMDEDUP_8M_TUNE_PROBE.json) — so the pin applies only
    # where the collapse was the measured problem. Either way the
    # groupBy reuses the one data shuffle.
    grouped = chunked
    if n_hint is not None and n_hint <= SEMDEDUP_TARGET_CHUNK:
        grouped = chunked.repartition(max(1, k), "block", "ca", "cb")
    scored = grouped.groupBy("block", "ca", "cb").applyInPandas(
        _block_scorer(threshold, coarse=coarse_score),
        schema=(
            "id_a long, id_b long, dot long, n2_a long, n2_b long"
        ),
    )
    return (
        scored.select(
            "id_a",
            "id_b",
            cosine(
                F.col("dot"), F.col("n2_a"), F.col("n2_b")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


#: Tile budget for the per-block GEMM: ≤ 2^24 f64 cells (128 MiB)
#: per partial product, so a skewed block degrades to more tiles,
#: never to an OOM-sized matrix.
_GEMM_TILE_CELLS = 1 << 24

#: Rows per GEMM chunk: a block bigger than this splits into chunk
#: pairs so no single task owns more than ~TARGET² /2 ≈ 3.4e7 pair
#: scores (~1 s of GEMM) — the straggler bound for skewed clusters.
SEMDEDUP_TARGET_CHUNK = 8192

#: Byte budget above which semdedup_pairs stops persisting the
#: blocks frame and recomputes the assign per consumer instead
#: (round 14, guide §5). The frame is n·m·(dim·8 + ~48 B overhead);
#: at the 8M-vector rung that is ~17 GB, which displaced execution
#: memory until the default-heap (8 g) end-to-end run died with JVM
#: heap OOM + crashed Python workers (SEMDEDUP_8M_TUNE_PROBE.json)
#: — while the recompute alternative is one bounded extra n·√k
#: assign pass (45 s at 8M, measured). 2 GiB keeps the cache well
#: under the default heap's storage share; override via env for
#: bigger executors (production fleets size this to executor
#: storage memory, not to this sandbox's 8 g).
SEMDEDUP_BLOCKS_PERSIST_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SEMDEDUP_PERSIST_MAX_BYTES", 2 << 30)
)


def _block_scorer(threshold: float, coarse: bool = False):
    """Per-chunk-pair pairwise scorer for :func:`semdedup_pairs` — a
    tiled numpy GEMM over quantized vectors, run behind
    ``applyInPandas`` (Arrow-batched; one task per (block, ca, cb)
    chunk pair — ca == cb scores the within-chunk upper triangle,
    ca < cb the full cross rectangle, so every block pair is emitted
    exactly once before the cross-probe distinct()).

    Why Python here when the engine's rule is JVM-first: SemDeDup's
    within-block scoring IS a dense matrix product (the paper's own
    implementation is batched GEMM), and the measured gap is
    decisive — the r07 join+higher-order-fold spelling scored 1.4M
    candidate pairs/s (2.3M with pre-quantized arrays; the unrolled
    64-term sum was WORSE at 0.4M — it falls out of codegen), which
    priced the 1M-vector probe arm at ~10 hours; BLAS GEMM does the
    same exact arithmetic orders of magnitude faster and never
    materializes the s² pair rows in the join machinery at all. The
    shuffle moves each vector m times (the blocking), not the pair
    mass — strictly less wire than the join spelling.

    Exactness is NOT sacrificed: quantized coordinates are integers,
    and a float64 GEMM over integer-valued inputs is bit-exact while
    every intermediate stays ≤ 2^53 — dim·max(|q|)² < 2^53, true for
    unit-scale embeddings (64·(1e7)² ≈ 6.4e15 < 9.0e15) and checked
    per block; a block that exceeds it falls back to int64 GEMM
    (exact to 2^63). The emitted (dot, n2_a, n2_b) are therefore the
    SAME int64s the JVM fold produced, and the cosine + threshold
    decision still happens Spark-side in :func:`cosine` — so the
    rounding/tiebreak contract pinned by tests is unchanged. The
    numpy pre-filter keeps 1e-9 slack under the threshold so final
    filtering never loses a boundary pair to the rounded comparison.

    ``coarse=True`` (round 11, VERDICT r10 #5) runs a two-tier
    score: tier 1 re-quantizes each vector to int8 (per-vector max
    scaling — cosine is invariant to per-vector positive scale) and
    does the pairwise pass as a float32 SGEMM, which is BIT-EXACT
    over int8-valued inputs (products ≤ 127² and 64-term sums ≤
    1.04e6, inside float32's 2^24 integer range) at twice DGEMM's
    flop rate and half its tile memory traffic; tier 2 gathers ONLY
    the tier-1 survivors and emits their exact int64 fixed-point
    (dot, n2) — the same numbers the exact path produces, so the
    Spark-side cosine/threshold contract is unchanged. Recall is
    1.0 BY CONSTRUCTION, not measurement: each vector's true
    angular error to its int8 image is computed exactly
    (θ_v = arccos⟨q, q8⟩/|q||q8|), and a pair survives tier 1 iff
    its int8 cosine clears cos(arccos(threshold) + θ_a + θ_b) —
    the tightest angle the true pair could have moved by. (The
    verdict's literal int8×int8→int32 GEMM is NOT the numpy
    spelling: numpy integer matmul bypasses BLAS entirely and is
    ~50× slower than SGEMM; float32 over int8 values is the same
    exactness story at BLAS speed.)
    """
    import numpy as np

    slack = threshold - 1e-9

    def _q8(q, n2):
        """Per-vector int8 image (float32-typed for SGEMM) + the
        exact angular error bound to the original. All dots here
        are ≤ 64·1e7·127 ≈ 8e10 — exact in float64."""
        amax = np.abs(q).max(axis=1, keepdims=True).astype(np.float64)
        amax[amax == 0] = 1.0
        q8 = np.rint(q * (127.0 / amax)).astype(np.float32)
        n2_8 = np.einsum("ij,ij->i", q8, q8, dtype=np.float64)
        n2_8[n2_8 == 0] = 1.0
        dot_q8 = np.einsum(
            "ij,ij->i", q.astype(np.float64), q8.astype(np.float64)
        )
        cos_v = np.clip(
            dot_q8 / np.sqrt(n2.astype(np.float64) * n2_8), -1.0, 1.0
        )
        # +1e-7: swallows the float64 rounding of the θ computation
        theta = np.arccos(cos_v) + 1e-7
        return q8, 1.0 / np.sqrt(n2_8), theta

    def _empty():
        import pandas as pd

        return pd.DataFrame(
            {
                "id_a": np.empty(0, np.int64),
                "id_b": np.empty(0, np.int64),
                "dot": np.empty(0, np.int64),
                "n2_a": np.empty(0, np.int64),
                "n2_b": np.empty(0, np.int64),
            }
        )

    def _prep(pdf, mask):
        ids = pdf["id"].to_numpy()[mask]
        q = (
            np.stack(pdf["qv"].to_numpy()[mask])
            .astype(np.int64, copy=False)
            if mask.any()
            else np.empty((0, 1), np.int64)
        )
        order = np.argsort(ids, kind="stable")
        return ids[order], q[order]

    def score(key, pdf):
        import pandas as pd

        ca, cb = int(key[1]), int(key[2])
        ch = pdf["ch"].to_numpy()
        if ca == cb:
            ids_a, qa = _prep(pdf, ch == ca)
            ids_b, qb = ids_a, qa
            triangle = True
        else:
            ids_a, qa = _prep(pdf, ch == ca)
            ids_b, qb = _prep(pdf, ch == cb)
            triangle = False
        if len(ids_a) == 0 or len(ids_b) == 0 or (
            triangle and len(ids_a) < 2
        ):
            return _empty()
        dim = qa.shape[1]
        amax = int(
            max(np.abs(qa).max(), np.abs(qb).max())
        )
        # float64 GEMM is exact while every partial sum stays an
        # integer ≤ 2^53; otherwise int64 GEMM (exact to 2^63, no
        # BLAS but still vectorized)
        f64_exact = dim * amax * amax < (1 << 53)
        ma = qa.astype(np.float64) if f64_exact else qa
        mb = qb.astype(np.float64) if f64_exact else qb
        n2a = np.einsum("ij,ij->i", qa, qa)  # int64, exact
        n2b = (
            n2a if triangle else np.einsum("ij,ij->i", qb, qb)
        )
        inv_a = 1.0 / np.sqrt(n2a.astype(np.float64))
        inv_b = 1.0 / np.sqrt(n2b.astype(np.float64))
        nb = len(ids_b)
        if coarse:
            qa8, inv8a, th_a = _q8(qa, n2a)
            qb8, inv8b, th_b = (
                (qa8, inv8a, th_a) if triangle else _q8(qb, n2b)
            )
            thr_ang = np.arccos(np.clip(slack, -1.0, 1.0))
            th_b_max = float(th_b.max()) if len(th_b) else 0.0
            inv8a32 = inv8a.astype(np.float32)
            inv8b32 = inv8b.astype(np.float32)
        # float32 tiles are half the f64 cell size → 2× tile rows
        rows = max(
            1, (2 * _GEMM_TILE_CELLS if coarse else _GEMM_TILE_CELLS) // nb
        )
        cols = np.arange(nb)
        out = []
        for i0 in range(0, len(ids_a), rows):
            i1 = min(i0 + rows, len(ids_a))
            if coarse:
                g8 = qa8[i0:i1] @ qb8.T  # SGEMM, exact ints < 2^24
                cos8 = g8 * inv8a32[i0:i1, None] * inv8b32[None, :]
                # per-row conservative threshold: the true pair's
                # angle moved by at most θ_a + θ_b from the int8
                # angle; −1e-5 covers the two float32 normalization
                # multiplies (relative error ~2e-7 on cos ≤ 1)
                adj = np.cos(
                    np.minimum(np.pi, thr_ang + th_a[i0:i1] + th_b_max)
                ).astype(np.float32) - np.float32(1e-5)
                hit = cos8 >= adj[:, None]
            else:
                g = ma[i0:i1] @ mb.T  # (i1-i0) × nb
                cos = (
                    g.astype(np.float64)
                    * inv_a[i0:i1, None]
                    * inv_b[None, :]
                )
                hit = cos >= slack
            if triangle:
                # upper triangle: column index > absolute row index
                hit &= cols[None, :] > np.arange(i0, i1)[:, None]
            ii, jj = np.nonzero(hit)
            if len(ii) == 0:
                continue
            if coarse:
                # tier 2: exact int64 dots for the survivors only —
                # identical numbers to the exact path's GEMM cells
                dots = np.einsum("ij,ij->i", qa[ii + i0], qb[jj])
            else:
                dots = np.asarray(g[ii, jj], dtype=np.int64)
            a_id, b_id = ids_a[ii + i0], ids_b[jj]
            a_n2, b_n2 = n2a[ii + i0], n2b[jj]
            # normalize so id_a < id_b (cross-chunk pairs arrive in
            # arbitrary id order; triangle pairs are ordered already)
            swap = a_id > b_id
            out.append(
                (
                    np.where(swap, b_id, a_id),
                    np.where(swap, a_id, b_id),
                    dots,
                    np.where(swap, b_n2, a_n2),
                    np.where(swap, a_n2, b_n2),
                )
            )
        if not out:
            return _empty()
        cat = [np.concatenate(x) for x in zip(*out)]
        return pd.DataFrame(
            {
                "id_a": cat[0],
                "id_b": cat[1],
                "dot": cat[2],
                "n2_a": cat[3],
                "n2_b": cat[4],
            }
        )

    return score
