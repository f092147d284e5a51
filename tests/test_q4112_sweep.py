"""Configuration-sweep property tests — the port of the reference's
test methodology (SURVEY §5.1): every (size, selectivity, groups,
skew) point re-asserts end-to-end correctness against an oracle
computed independently of the engine (numpy, not Spark)."""

from __future__ import annotations

import pytest

from database_join_spark.datagen import (
    Q4112Config,
    part2_oracle,
    part2_query,
    q4112_frames,
)

#: A compressed version of the reference's 21-config sweep
#: (q4112.csv): size × selectivity × group-count × heavy-hitter skew.
SWEEP = [
    Q4112Config(inner_tuples=100, outer_tuples=10_000, groups=10),
    Q4112Config(inner_tuples=100, outer_tuples=10_000, groups=10,
                outer_selectivity=1.0),
    Q4112Config(inner_tuples=2_000, outer_tuples=60_000, groups=100),
    Q4112Config(inner_tuples=2_000, outer_tuples=60_000, groups=5_000,
                outer_selectivity=0.25),
    Q4112Config(inner_tuples=5_000, outer_tuples=100_000, groups=1_000,
                hh_groups=3, hh_prob=0.9),
    Q4112Config(inner_tuples=5_000, outer_tuples=100_000, groups=10_000,
                hh_groups=100, hh_prob=1.0),
    # inner_selectivity < 1 — the q4112_hj.csv:101-125 config shape
    # (inner=1e8, isel=0.5, osel=0.5) at test scale.
    Q4112Config(inner_tuples=2_000, outer_tuples=60_000, groups=100,
                inner_selectivity=0.5, outer_selectivity=0.5),
    Q4112Config(inner_tuples=5_000, outer_tuples=100_000, groups=1_000,
                inner_selectivity=0.3, outer_selectivity=1.0,
                hh_groups=3, hh_prob=0.5),
]


@pytest.mark.parametrize("cfg", SWEEP, ids=lambda c: (
    f"i{c.inner_tuples}_o{c.outer_tuples}_s{c.outer_selectivity}"
    f"_g{c.groups}_hh{c.hh_groups}p{c.hh_prob}"
))
def test_part2_matches_independent_oracle(spark, cfg):
    items, orders = q4112_frames(spark, cfg)
    row = part2_query(items, orders).collect()[0]
    want_avg, want_groups = part2_oracle(cfg)
    assert row["avg_of_avgs"] == want_avg
    assert row["n_groups"] == want_groups


def test_inner_selectivity_controls_referenced_fraction(spark):
    """inner_selectivity is "probability that items.id exists in
    orders" (q4112.h:20): exactly that fraction of item ids may be
    referenced, all of them are hit once outer ≫ inner, and the
    outer match rate stays outer_selectivity."""
    cfg = Q4112Config(
        inner_tuples=1_000,
        outer_tuples=50_000,
        groups=10,
        inner_selectivity=0.5,
        outer_selectivity=0.5,
    )
    items, orders = q4112_frames(spark, cfg)
    probed = (
        items.join(orders, items.id == orders.item_id, "left_semi")
        .select("id")
        .distinct()
        .count()
    )
    assert probed == cfg.referenced_items == 500
    matched = orders.join(items, items.id == orders.item_id).count()
    assert abs(matched / cfg.outer_tuples - cfg.outer_selectivity) < 0.02


def test_skew_changes_distribution_not_answer_shape(spark):
    """Sanity: maximum skew routes everything to the heavy hitters
    (the reference's hh_prob=1.0 configs, q4112.csv:126-150)."""
    cfg = Q4112Config(
        inner_tuples=1_000,
        outer_tuples=20_000,
        groups=5_000,
        hh_groups=7,
        hh_prob=1.0,
    )
    _, orders = q4112_frames(spark, cfg)
    n_stores = orders.select("store_id").distinct().count()
    assert n_stores == 7


@pytest.mark.parametrize("cfg", SWEEP, ids=lambda c: (
    f"i{c.inner_tuples}_o{c.outer_tuples}_s{c.outer_selectivity}"
    f"_g{c.groups}_hh{c.hh_groups}p{c.hh_prob}"
))
def test_part2_repartition_first_matches_oracle(spark, cfg):
    """The no-reduction-regime rewrite (repartition on the group key
    before a single post-exchange aggregation, REGROUP_PROBE.json)
    must be bit-equal to the standard plan on EVERY sweep point —
    including the heavy-hitter skew configs, where the rewrite is
    slower (hence sizing's top-share guard) but must stay correct."""
    from database_join_spark.datagen import part2_query_repartition_first

    items, orders = q4112_frames(spark, cfg)
    row = part2_query_repartition_first(items, orders, 8).collect()[0]
    want_avg, want_groups = part2_oracle(cfg)
    assert row["avg_of_avgs"] == want_avg
    assert row["n_groups"] == want_groups
