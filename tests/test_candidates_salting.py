"""Salted hot-bucket pair generation: identical output to the uncapped
self-join, with the m^2 explosion spread over shard-pair tasks instead
of one straggler reducer (the north-star's salted repartitioning on
band-hash keys; the engine's default cap-and-count policy stays the
oracle-visible path — this operator is for callers that need every
pair from a hot key)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.candidates import (
    candidate_pairs,
    salted_candidate_pairs,
)


def _posting(spark, buckets):
    rows = [(k, cid) for k, ids in buckets.items() for cid in ids]
    return spark.createDataFrame(rows, "key long, clip_id string")


def _want(buckets):
    out = set()
    for ids in buckets.values():
        for a, b in combinations(sorted(set(ids)), 2):
            out.add((a, b))
    return out


def test_salted_pairs_match_uncapped_join(spark):
    buckets = {
        1: [f"h{i:04d}" for i in range(300)],          # hot: 300 >> cap
        2: [f"n{i:02d}" for i in range(7)],            # normal
        3: ["x1", "x2"],                               # minimal pair
        4: ["solo"],                                   # singleton -> nothing
        5: [f"m{i:03d}" for i in range(120)],          # second hot bucket
    }
    posting = _posting(spark, buckets)
    got = {
        (r["a"], r["b"])
        for r in salted_candidate_pairs(posting, cap=50, n_salt=8).collect()
    }
    assert got == _want(buckets)
    # sanity: the capped default really does drop the hot buckets
    capped = {
        (r["a"], r["b"]) for r in candidate_pairs(posting, cap=50).collect()
    }
    assert capped == _want({2: buckets[2], 3: buckets[3]})


def test_salted_pairs_overlapping_membership(spark):
    """A clip in several buckets must still yield DISTINCT pairs, and
    pairs co-occurring in both a hot and a normal bucket must not
    duplicate across the two paths."""
    hot = [f"c{i:03d}" for i in range(80)]
    buckets = {
        10: hot,                      # hot (cap 20)
        11: hot[:5] + ["only11"],     # normal, overlaps the hot bucket
    }
    posting = _posting(spark, buckets)
    got = [
        (r["a"], r["b"])
        for r in salted_candidate_pairs(posting, cap=20, n_salt=4).collect()
    ]
    assert len(got) == len(set(got))  # distinct
    assert set(got) == _want(buckets)
