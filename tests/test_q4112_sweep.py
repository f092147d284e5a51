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
