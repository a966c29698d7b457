"""Triangle-counting properties (operators/graph.py): closed-form
counts on planted shapes, star-hub wedge suppression (the scale
claim), and brute-force equality on a seeded random graph."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.graph import (
    degrees,
    node_triangle_counts,
    triangles,
    undirected_edges,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def _brute_triangles(pairs) -> dict[int, int]:
    """Per-node triangle counts by explicit enumeration."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({x for e in es for x in e})
    per = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            per[x] += 1
            per[y] += 1
            per[z] += 1
    return per


def test_complete_graph_k5(spark):
    """K5: C(5,3)=10 triangles, every node in C(4,2)=6 of them."""
    pairs = list(itertools.combinations(range(5), 2))
    ue = undirected_edges(_edges_df(spark, pairs))
    assert triangles(ue).count() == 10
    rows = node_triangle_counts(ue).collect()
    assert {r["id"]: (r["degree"], r["triangles"]) for r in rows} == {
        n: (4, 6) for n in range(5)
    }


def test_star_and_path_have_no_triangles(spark):
    """A 1000-leaf star (the exact-tier shape) and a path close no
    triangles, and the star's leaves all carry degree 1."""
    star = [(0, i) for i in range(1, 1001)]
    path = [(2000 + i, 2000 + i + 1) for i in range(50)]
    ue = undirected_edges(_edges_df(spark, star + path))
    assert triangles(ue).count() == 0
    nt = node_triangle_counts(ue)
    assert nt.filter(F.col("triangles") != 0).count() == 0
    hub = nt.filter(F.col("id") == 0).first()
    assert hub["degree"] == 1000


def test_multi_edges_self_loops_and_orientation_dedup(spark):
    """One triangle emitted with duplicate pairs (both tiers), reversed
    orientation, and a self-loop still counts exactly once."""
    pairs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (2, 2)]
    ue = undirected_edges(_edges_df(spark, pairs))
    assert ue.count() == 3
    tri = triangles(ue).collect()
    assert len(tri) == 1
    assert sorted([tri[0]["x"], tri[0]["y"], tri[0]["z"]]) == [1, 2, 3]


def test_random_graph_matches_brute_force(spark):
    """G(60, 0.15) seeded: per-node (degree, triangles) from the
    degree-oriented join plan equals explicit enumeration."""
    rng = random.Random(42)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(60), 2)
        if rng.random() < 0.15
    ]
    expected = _brute_triangles(pairs)
    ue = undirected_edges(_edges_df(spark, pairs))
    got = {
        r["id"]: r["triangles"] for r in node_triangle_counts(ue).collect()
    }
    assert got == expected
    total = triangles(ue).count()
    assert total * 3 == sum(expected.values())


def test_wedge_generation_is_orientation_bounded(spark):
    """The scale claim, checked structurally: on a star+triangle graph
    the oriented out-degree of the deg-1000 hub is 0 — the hub
    generates no wedges (naive node-iterator would emit C(1000,2))."""
    star = [(0, i) for i in range(1, 1001)]
    pairs = star + [(1, 2), (2, 3), (1, 3)]
    ue = undirected_edges(_edges_df(spark, pairs))
    deg = degrees(ue)
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("degb"))
    ed = ue.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src")
    )
    hub_out = oriented.filter(F.col("src") == 0).count()
    assert hub_out == 0
    # ... yet every triangle THROUGH the hub is still found, generated
    # at its low-degree corner: {1,2,3} plus {0,1,2},{0,1,3},{0,2,3}
    assert triangles(ue).count() == 4


# --- PageRank -------------------------------------------------------------

from file_dedup_rust_spark.operators.graph import pagerank  # noqa: E402


def _brute_pagerank(pairs, iterations=6, d=0.85):
    """Reference power iteration in plain Python dicts."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, list[int]] = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(iterations):
        nxt = {v: (1.0 - d) / n for v in adj}
        for u, nbrs in adj.items():
            share = d * r[u] / len(nbrs)
            for v in nbrs:
                nxt[v] += share
        r = nxt
    return r


def test_pagerank_cycle_is_uniform(spark):
    """On a regular graph the uniform vector is the exact fixpoint —
    every iterate stays 1/n bit-for-bit (no float drift: each step
    computes (1-d)/n + d*(1/n))."""
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    pr = pagerank(undirected_edges(_edges_df(spark, pairs)), iterations=4)
    vals = {r["rank"] for r in pr.collect()}
    assert len(vals) == 1
    (v,) = vals
    assert abs(v - 1.0 / n) < 1e-12


def test_pagerank_matches_brute_force_and_sums_to_one(spark):
    """G(40, 0.12) seeded: distributed ranks equal the dict-based
    power iteration, and total mass is exactly 1 (no dangling nodes
    in an undirected deg>=1 graph)."""
    rng = random.Random(7)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(40), 2)
        if rng.random() < 0.12
    ]
    expected = _brute_pagerank(pairs, iterations=6)
    rows = pagerank(
        undirected_edges(_edges_df(spark, pairs)), iterations=6
    ).collect()
    got = {r["id"]: r["rank"] for r in rows}
    assert set(got) == set(expected)
    for v, r in expected.items():
        assert abs(got[v] - r) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_hub_dominates(spark):
    """On a star the hub out-ranks every leaf and the ranks match the
    closed-form iterate (leaves symmetric)."""
    pairs = [(0, i) for i in range(1, 21)]
    rows = pagerank(
        undirected_edges(_edges_df(spark, pairs)), iterations=6
    ).collect()
    got = {r["id"]: r["rank"] for r in rows}
    expected = _brute_pagerank(pairs, iterations=6)
    hub = got.pop(0)
    assert all(abs(v - expected[1]) < 1e-12 for v in got.values())
    assert hub > max(got.values()) * 5
    assert abs(hub - expected[0]) < 1e-12


# --- BFS min-hop distance ---------------------------------------------------

from file_dedup_rust_spark.operators.graph import min_hop_distance  # noqa: E402


def _seeds_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_min_hop_distance_on_path(spark):
    """Path 0-1-2-3-4-5, seed 0, max 3: distances 0..3 and nodes 4,5
    excluded (beyond the horizon)."""
    pairs = [(i, i + 1) for i in range(5)]
    ue = undirected_edges(_edges_df(spark, pairs))
    rows = min_hop_distance(ue, _seeds_df(spark, [0]), 3).collect()
    assert {r["id"]: r["hop_dist"] for r in rows} == {0: 0, 1: 1, 2: 2, 3: 3}


def test_min_hop_distance_multi_seed_takes_min(spark):
    """Seeds at both ends of the path: middle node gets the nearer."""
    pairs = [(i, i + 1) for i in range(6)]
    ue = undirected_edges(_edges_df(spark, pairs))
    rows = min_hop_distance(ue, _seeds_df(spark, [0, 6]), 3).collect()
    got = {r["id"]: r["hop_dist"] for r in rows}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0}


def test_min_hop_distance_isolated_seed(spark):
    """A seed absent from the edge set still reports distance 0, and
    duplicate seed rows collapse."""
    pairs = [(1, 2)]
    ue = undirected_edges(_edges_df(spark, pairs))
    rows = min_hop_distance(ue, _seeds_df(spark, [99, 99]), 2).collect()
    assert {r["id"]: r["hop_dist"] for r in rows} == {99: 0}


def test_contam_spread_fixture_plants_hop1(spark):
    """At sf0.001 the planted contaminated copies are direct hits and
    their hosts surface at hop 1 with risk 0.5."""
    import file_dedup_rust_spark.entry.testdata_queries as Q

    rows = Q.QUERIES["contam_spread"](spark, "/root/testdata/sf0.001").collect()
    by_hop = {}
    for r in rows:
        by_hop.setdefault(r["hop_dist"], []).append(r)
    assert by_hop.get(0), "no direct hits planted"
    assert by_hop.get(1), "no hop-1 spread"
    planted = [r for r in by_hop[0] if r["doc_id"] >= Q.CONTAM_SPREAD_OFFSET]
    assert planted, "planted contaminated copies are not direct hits"
    hosts = {r["doc_id"] for r in by_hop[1]}
    assert any(
        r["doc_id"] - Q.CONTAM_SPREAD_OFFSET in hosts for r in planted
    ), "no planted host surfaced at hop 1"
    assert all(abs(r["risk"] - 0.5) < 1e-9 for r in by_hop[1])


def test_min_hop_distance_components_do_not_leak(spark):
    """Multi-source BFS over two disjoint components, seeded with both
    reps at once: each component's distances are as if BFS ran alone —
    the property cluster_eccentricity relies on to serve every cluster
    from ONE sweep."""
    pairs = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 13)]
    ue = undirected_edges(_edges_df(spark, pairs))
    rows = min_hop_distance(ue, _seeds_df(spark, [0, 10]), 4).collect()
    got = {r["id"]: r["hop_dist"] for r in rows}
    assert got == {0: 0, 1: 1, 2: 2, 10: 0, 11: 1, 12: 2, 13: 3}


def test_cluster_eccentricity_invariants(spark):
    """Driver-level invariants at sf0.001: only multi-member clusters,
    every member either within the hop horizon (max_hop in [1, size-1])
    or counted in n_deep; reached+deep == size."""
    import file_dedup_rust_spark.entry.testdata_queries as Q

    rows = Q.QUERIES["cluster_eccentricity"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no multi-member clusters at sf0.001"
    for r in rows:
        assert r["size"] >= 2
        if r["n_deep"] == 0:
            assert 1 <= r["max_hop"] <= r["size"] - 1
        assert r["n_deep"] < r["size"]  # the rep itself is always hop 0
