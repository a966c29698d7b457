"""Per-source waste attribution: the planted mirror feed is 100%
duplicate (reclaim 1000 pm) and organic sources stay clean — the
audit provably isolates the re-crawling feed."""

from __future__ import annotations

import file_dedup_rust_spark.entry.testdata_queries as Q


def test_mirror_feed_isolated(spark):
    rows = {
        r["source"]: r
        for r in Q.QUERIES["wasted_space_by_source"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    m = rows.pop("mirror")
    assert m["n_dup_copies"] == m["n_docs"] and m["reclaim_pm"] == 1000
    assert m["wasted_chars"] > 0
    for src, r in rows.items():
        # the raw table has zero exact dups -> organic feeds are clean
        assert r["n_dup_copies"] == 0 and r["reclaim_pm"] == 0, src
