"""AllPairs prefix-filter exact similarity join (operators/allpairs.py)
vs brute-force all-pairs Jaccard — the completeness guarantee must
hold exactly (no LSH-style miss), including at set sizes where IEEE
ceil(0.8 * n) overshoots (n a multiple of 5)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.allpairs import allpairs_jaccard_pairs


def _brute(sets: dict[int, set[str]], t: float) -> dict[tuple[int, int], float]:
    out = {}
    for a, b in combinations(sorted(sets), 2):
        u = len(sets[a] | sets[b])
        if u == 0:
            continue
        j = round(len(sets[a] & sets[b]) / u, 4)
        if j >= t:
            out[(a, b)] = j
    return out


def _spark_pairs(spark, sets: dict[int, set[str]]) -> dict[tuple[int, int], float]:
    rows = [(d, g) for d, gs in sets.items() for g in gs]
    sh = spark.createDataFrame(rows, "doc_id long, g string")
    return {
        (r.ia, r.ib): r.jac
        for r in allpairs_jaccard_pairs(sh, 4, 5).collect()
    }


def test_ieee_ceil_boundary_sizes(spark):
    # n = 55 elements: ceil(0.8 * 55) = 44 exactly, but the double
    # 0.8 * 55 = 44.000000000000007 ceils to 45 — a float-based prefix
    # would shrink by one and can miss pairs.  Build a pair at exactly
    # J = 50/60 >= 0.8... use J = 45/55? craft: |x| = |y| = 55,
    # overlap 50 -> J = 50/60 = 0.8333 >= 0.8: must be found.
    common = {f"c{i}" for i in range(50)}
    x = common | {f"x{i}" for i in range(5)}
    y = common | {f"y{i}" for i in range(5)}
    sets = {1: x, 2: y, 3: {f"z{i}" for i in range(55)}}
    got = _spark_pairs(spark, sets)
    assert got == _brute(sets, 0.8)
    assert (1, 2) in got


def test_property_matches_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    gram = st.sampled_from([f"g{i}" for i in range(12)])  # heavy df ties

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.sets(gram, min_size=1, max_size=12), min_size=2, max_size=7
        )
    )
    def run(doc_sets):
        sets = {i: s for i, s in enumerate(doc_sets)}
        assert _spark_pairs(spark, sets) == _brute(sets, 0.8)

    run()


def test_prefix_posting_volume_is_pruned(spark):
    # the posting join must touch ~(1-t)*n + 1 grams per doc, not n:
    # for 20-gram docs at t=4/5 the prefix is 20 - 16 + 1 = 5 rows
    n, t_num, t_den = 20, 4, 5
    sets = {d: {f"d{d}_g{i}" for i in range(n)} for d in range(6)}
    rows = [(d, g) for d, gs in sets.items() for g in gs]
    sh = spark.createDataFrame(rows, "doc_id long, g string")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # recompute the operator's own prefix rule and pin its length
    import math

    p = n - math.ceil(t_num * n / t_den) + 1
    assert p == 5
    assert allpairs_jaccard_pairs(sh, t_num, t_den).count() == 0
    assert sizes.count() == 6
