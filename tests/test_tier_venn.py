"""Tier-agreement Venn: the planted disagreement cells exist — exact
copies land in the all-agree cell, tripled-padding lands set-only
(bag demotes it), and no pair is bag-only-exact (impossible: exact
implies set-Jaccard 1.0)."""

from __future__ import annotations

import file_dedup_rust_spark.entry.testdata_queries as Q


def test_tier_venn_cells(spark):
    rows = {
        (r["in_set"], r["in_bag"], r["is_exact"]): r["n_pairs"]
        for r in Q.QUERIES["tier_venn"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # exact planted copies agree everywhere
    assert rows.get((1, 1, 1), 0) > 0
    # tripled-padding: set saturates, bag demotes
    assert rows.get((1, 0, 0), 0) > 0
    # an exact pair can never be missed by set-Jaccard
    assert (0, 1, 1) not in rows and (0, 0, 1) not in rows
