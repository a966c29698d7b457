"""pair_confusion properties (operators/clustering_audit.py):
brute-force pair enumeration equality on random labelings, identity /
refinement edge cases, and domain restriction to the id intersection."""

from __future__ import annotations

import itertools
import random

from file_dedup_rust_spark.operators.clustering_audit import pair_confusion


def _labels_df(spark, mapping, col):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in mapping.items()], f"id long, {col} long"
    )


def _brute(la, lb):
    ids = sorted(set(la) & set(lb))
    pa = pb = both = 0
    for x, y in itertools.combinations(ids, 2):
        a = la[x] == la[y]
        b = lb[x] == lb[y]
        pa += a
        pb += b
        both += a and b
    return len(ids), pa, pb, both


def _collect(spark, la, lb):
    row = pair_confusion(
        _labels_df(spark, la, "ca"), _labels_df(spark, lb, "cb")
    ).first()
    return (
        row["n_items"], row["pairs_a"], row["pairs_b"], row["pairs_both"]
    )


def test_random_labelings_match_brute_force(spark):
    rng = random.Random(3)
    la = {i: rng.randrange(5) for i in range(60)}
    lb = {i: rng.randrange(7) for i in range(60)}
    assert _collect(spark, la, lb) == _brute(la, lb)


def test_identical_clusterings_agree_everywhere(spark):
    la = {i: i % 4 for i in range(40)}
    n, pa, pb, both = _collect(spark, la, dict(la))
    assert pa == pb == both == 4 * (10 * 9 // 2)


def test_refinement_is_one_sided(spark):
    """B refines A (splits every A-cluster in two): every B-pair is an
    A-pair (pairs_both == pairs_b) and none of the cross-split A-pairs
    survive in B."""
    la = {i: i % 2 for i in range(20)}
    lb = {i: i % 4 for i in range(20)}
    n, pa, pb, both = _collect(spark, la, lb)
    assert both == pb < pa


def test_intersection_domain(spark):
    """Ids present in only one labeling are excluded (inner join)."""
    la = {i: 0 for i in range(10)}
    lb = {i: 0 for i in range(5, 15)}
    n, pa, pb, both = _collect(spark, la, lb)
    assert n == 5 and pa == pb == both == 10
