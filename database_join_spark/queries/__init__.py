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
#: the r06 VERDICT's one red — its first row landed r07 instead) and
#: refreshed the whole r02/r03 tail. Rotation 6 (r08, VERDICT r07
#: #5) rotates in the ENTIRE ≤r05 staleness tail — all 45 ids whose
#: newest driver row is r05 plus ``stream_interval_join`` (r04, the
#: oldest row on the board) — and rotates out the 50 ids that got
#: fresh r07 rows. That fills 46 of the 50 slots; the headline set
#: keeps the remaining 4 (``text_analysis`` sits out one round —
#: its newest row is r07). After r08 no registry id's newest driver
#: row is older than r06.
DRIVER_GATE: frozenset[str] = frozenset({
    # -- newest row r04: the single oldest id on the board
    "stream_interval_join",
    # -- newest row r05 (rotation 6 staleness tail, complete)
    "agg_distinct", "agg_grouping_sets", "agg_partial_cache",
    "agg_quantile_approx", "agg_salted", "approx_distinct_fm",
    "array_map_json", "datagen_synthetic", "decontam_minhash",
    "dedup_embed_cosine", "dedup_exact_survivors", "dedup_minhash",
    "dedup_ngram_jaccard", "dedup_simhash", "filter_semijoin_sel",
    "higher_order_funcs", "join_broadcast", "join_hash_multi",
    "join_hash_single", "join_nlj_multi", "join_nlj_single",
    "join_outer", "join_range", "join_semi_anti", "join_sortmerge",
    "pivot_wide", "project_expr", "scalar_funcs", "scan_columnar",
    "set_ops", "simsearch_embed", "simsearch_ivf", "simsearch_lsh",
    "sort_limit", "source_synthdocs", "stream_session",
    "stream_tumbling", "text_langid", "text_quality", "text_winnow",
    "udf_surface", "udtf_surface", "window_analytic",
    "window_distribution", "window_rank_topk",
    # -- SURVEY §2 headline set (kept gated so the flagship surface
    #    is re-proven under the driver every round; text_analysis
    #    rejoins next rotation)
    "agg_scalar_avg",
    "agg_groupby_avg", "agg_avg_of_avgs", "dedup_exact",
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
