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
#: Round-9 rotation (VERDICT r08 #3-#4, rotation 7): rotate in the
#: complete r06 staleness tail — the 16 TPC-H queries plus
#: ``multimodal_features``, now the oldest rows on the board — plus
#: ``text_analysis`` (r07, sat out rotation 6 as promised), the
#: two NEW stored-ANN ids ``simsearch_lsh_stored`` /
#: ``simsearch_ivf_stored`` (first driver rows for the operators'
#: documented 100 TB posture, VERDICT r08 #4), and the NEW
#: ``agg_bucketed_exchange_free`` (first driver row for the
#: round-9 weak-regime fix — the engine's recommended no-reduction
#: aggregate spelling, BUCKETED_AGG_PROBE.json). The 21 slots come
#: from ids that all earned full green r08 rows (the join/agg/
#: dedup-baseline block below the kept set, plus ``pivot_wide``);
#: they remain pytest-hash-compared every run
#: (tests/test_oracle_parity.py). After this round no registry
#: id's newest driver row is older than r07.
#:
#: Rotation history: r06 gave first rows to the r06-born ids except
#: ``dedup_semantic`` (first row r07) and refreshed the r02/r03
#: tail. Rotation 6 (r08, VERDICT r07 #5) rotated in the entire
#: ≤r05 staleness tail + ``stream_interval_join`` (r04) — after r08
#: no id older than r06. Rotation 7 is this one.
DRIVER_GATE: frozenset[str] = frozenset({
    # -- newest row r06 (the complete staleness tail, rotation 7)
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21",
    "tpch_q22", "multimodal_features",
    # -- newest row r07: rejoins after sitting out rotation 6
    "text_analysis",
    # -- first driver rows: stored-ANN surfaces (VERDICT r08 #4)
    #    and the bucketed exchange-free aggregate (round-9 fix)
    "simsearch_lsh_stored", "simsearch_ivf_stored",
    "agg_bucketed_exchange_free",
    # -- kept from rotation 6 (fresh r08 rows; stay for continuity
    #    of the streaming/text/window/simsearch families)
    "stream_interval_join", "dedup_minhash", "join_outer",
    "join_range", "join_semi_anti", "join_sortmerge",
    "project_expr", "scalar_funcs", "scan_columnar", "set_ops",
    "simsearch_embed", "simsearch_ivf", "simsearch_lsh",
    "sort_limit", "source_synthdocs", "stream_session",
    "stream_tumbling", "text_langid", "text_quality", "text_winnow",
    "udf_surface", "udtf_surface", "window_analytic",
    "window_distribution", "window_rank_topk",
    # -- SURVEY §2 headline set (kept gated so the flagship surface
    #    is re-proven under the driver every round)
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
