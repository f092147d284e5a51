"""Query registry: every operator from SURVEY.md §2 as a named query.

Each :class:`QuerySpec` pairs a PySpark implementation
``fn(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) an
exact DuckDB oracle statement over the fixture views. The driver runs
both at sf0.01 and hash-compares; our pytest suite does the same at
sf0.001. Queries without an oracle (approximate / streaming-stateful /
ML ops) get rows-only checks from the driver plus property tests here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: Exposed to the correctness driver via ``__spark_entry__``. The
    #: driver gates at most 50 queries per round (CORRECTNESS_r01 cut
    #: the registry's tail at exactly 50 rows), so the registry keeps
    #: the full surface but exposes exactly the 50 highest-value ids:
    #: every SURVEY §2 id, every TPC-H query, and the strongest
    #: extras. Ungated queries keep their oracle and stay verified by
    #: tests/ (same hash-compare, run under pytest instead).
    gated: bool = True


REGISTRY: dict[str, QuerySpec] = {}

#: THE driver-gate rotation table — the single source of truth for
#: which ≤50 registry ids ship to the correctness driver this round
#: (``__spark_entry__.queries()``). Until round 5 the flag lived on
#: each of the 100+ ``@query(...)`` call sites, which made every
#: rotation a 30-file-location diff that had to be counted by hand;
#: since round 6 the per-site flag is gone and ``load_all`` applies
#: membership in this set. History per id stays in STATUS.md
#: (generated from the committed CORRECTNESS artifacts).
#:
#: Round-7 rotation (VERDICT r06 #2, rotation 5): a first driver row
#: for ``dedup_semantic`` (the only registry id with no driver
#: history — held back in r06 until its recall pin passed, fixed
#: this round via multi-probe blocking) plus the ENTIRE r04
#: staleness tail — every id whose newest driver row is r04 gets a
#: fresh slot (``agg_quantile_exact`` … ``distinct_hll_sketch``
#: below). They take the slots of the 16 TPC-H queries and
#: ``multimodal_features`` — all 17 rotated-out ids earned full
#: green r06 rows and remain pytest-hash-compared every run
#: (tests/test_oracle_parity.py / test_multimodal). After this
#: round no registry id's newest driver row is older than r05.
#:
#: Rotation history: r06 gave first rows to all nine r06-born ids
#: except ``dedup_semantic`` (committed with a failing recall test;
#: the r06 VERDICT's one red — its first row lands this round
#: instead) and refreshed the whole r02/r03 tail.
DRIVER_GATE: frozenset[str] = frozenset({
    # -- first driver row: born r06, fixed + gated r07
    "dedup_semantic",
    # -- newest row r04 (rotation 5 staleness tail)
    "agg_quantile_exact", "anomaly_zscore", "bpe_pair_counts",
    "decontam_bloom", "dedup_substring", "event_funnel",
    "heavy_hitters_approx", "join_asof", "join_range_binned",
    "ngram_counts", "retention_cohorts", "sample_hash_split",
    "seq_len_hist", "sessionize_events", "text_vocab",
    "distinct_hll_sketch",
    # -- newest row r05: born-r05 cohort keeps a second row
    "agg_repartition_first", "dedup_substring_apply",
    "quality_gopher_rules",
    # -- newest row r06: born-r06 cohort keeps a second row
    "agg_avg_int_ext", "join_bloom_prefilter", "variant_json",
    "join_salted", "sample_weighted", "agg_argmax",
    "chunk_documents", "quality_lm_surprisal", "topic_kmeans",
    # -- r06-refreshed udf/stream/asof + pipeline cohort (retained)
    "udf_grouped", "udf_grouped_agg", "stream_sliding",
    "join_asof_bucketed",
    "corpus_clean", "corpus_mix", "decontam_ngram", "dedup_clusters",
    "dedup_first_event", "dedup_incremental", "embed_quantize",
    "pack_sequences", "pii_scrub", "quality_repetition",
    "sample_stratified", "tfidf_terms",
    # -- SURVEY §2 headline set (kept gated so the flagship surface
    #    is re-proven under the driver every round)
    "agg_scalar_avg",
    "agg_groupby_avg", "agg_avg_of_avgs", "dedup_exact",
    "text_analysis",
})

#: The driver caps CORRECTNESS at 50 rows (CORRECTNESS_r01 cut the
#: then-60-entry registry at exactly 50); oversubscribing would
#: silently drop the tail, so the cap is enforced at import.
_GATE_CAP = 50
if len(DRIVER_GATE) > _GATE_CAP:
    raise ValueError(
        f"DRIVER_GATE holds {len(DRIVER_GATE)} ids; driver cap is "
        f"{_GATE_CAP} — rotate something out"
    )


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Register a query implementation under a SURVEY §2 query id.

    Gate membership is NOT declared here — see :data:`DRIVER_GATE`.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
            gated=name in DRIVER_GATE,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from database_join_spark.queries import (  # noqa: F401
        core,
        extras,
        pipeline,
        relational,
        streaming,
        tpch,
    )

    # A gate entry naming a nonexistent id is a rotation typo that
    # would silently shrink the driver gate below 50 — fail loudly.
    unknown = DRIVER_GATE - REGISTRY.keys()
    if unknown:
        raise ValueError(f"DRIVER_GATE names unknown ids: {sorted(unknown)}")
    return REGISTRY
