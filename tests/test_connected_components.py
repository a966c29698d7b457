"""Connected components on hand-built graphs (SURVEY.md section 5 item 4):
chains, merging stars, singletons — and path equivalence between the
driver-side union-find and the distributed min-label propagation.

The merge case is the order-dependence fix of SURVEY.md section 2.8: the
reference joins the FIRST match's cluster and never merges two existing
clusters (/root/reference/backend/src/worker/deduplication_service.rs:374-433);
batch CC must compute the full transitive closure regardless of edge order.
"""

from __future__ import annotations

import pytest

from file_dedup_rust_spark.operators.connected_components import (
    connected_components,
)


def _run(spark, edge_pairs, vertex_ids, **kw):
    edges = spark.createDataFrame(
        edge_pairs or [("_x", "_y")], "a string, b string"
    )
    if not edge_pairs:
        edges = edges.filter("a <> a")  # empty, schema kept
    verts = spark.createDataFrame([(v,) for v in vertex_ids], "clip_id string")
    out = connected_components(edges, verts, **kw)
    return {r["clip_id"]: r["cluster_id"] for r in out.collect()}


CASES = [
    # chain: c1-c2-c3-c4 -> all labelled c1 (transitive closure)
    ([("c1", "c2"), ("c2", "c3"), ("c3", "c4")],
     ["c1", "c2", "c3", "c4", "solo"],
     {"c1": "c1", "c2": "c1", "c3": "c1", "c4": "c1", "solo": "solo"}),
    # two stars merged by one bridge edge — the reference would have
    # kept two clusters here (order-dependent first-match join)
    ([("a1", "a2"), ("a1", "a3"), ("b1", "b2"), ("b1", "b3"), ("a3", "b2")],
     ["a1", "a2", "a3", "b1", "b2", "b3"],
     {v: "a1" for v in ["a1", "a2", "a3", "b1", "b2", "b3"]}),
    # no edges: everyone a singleton
    ([], ["x", "y", "z"], {"x": "x", "y": "y", "z": "z"}),
    # duplicate + reversed edges collapse to the same components
    ([("m2", "m1"), ("m1", "m2"), ("m2", "m3")],
     ["m1", "m2", "m3"],
     {"m1": "m1", "m2": "m1", "m3": "m1"}),
]


@pytest.mark.parametrize("edges,verts,want", CASES)
def test_driver_path(spark, edges, verts, want):
    got = _run(spark, edges, verts)  # default threshold -> driver UF
    assert got == want


@pytest.mark.parametrize("edges,verts,want", CASES)
def test_distributed_path(spark, edges, verts, want):
    # zero thresholds force the iterative label propagation
    got = _run(spark, edges, verts, driver_threshold=0, coded_threshold=0)
    assert got == want


@pytest.mark.parametrize("edges,verts,want", CASES)
def test_coded_driver_path(spark, edges, verts, want):
    # driver_threshold=0 with the default coded_threshold forces the
    # int64-coded middle tier (Spark-side factorize + numpy solve +
    # distributed min-clip_id recovery)
    got = _run(spark, edges, verts, driver_threshold=0)
    assert got == want


def test_paths_agree_on_random_graph(spark):
    import random

    rng = random.Random(7)
    ids = [f"v{i:03d}" for i in range(120)]
    edges = [tuple(sorted(rng.sample(ids, 2))) for _ in range(150)]
    a = _run(spark, edges, ids)
    b = _run(spark, edges, ids, driver_threshold=0, coded_threshold=0)
    assert a == b
    c = _run(spark, edges, ids, driver_threshold=0)
    assert a == c
    # labels are component minima
    for v, lbl in a.items():
        assert lbl <= v


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_paths_agree_on_chain_heavy_graphs(spark, seed):
    """Property check targeting the pointer-jumping path: graphs whose
    components are LONG CHAINS (diameter >> log rounds) mixed with
    random clutter — the regime where naive min-label propagation needs
    O(diameter) rounds and label[label] shortcuts must still converge
    to identical labels as the driver solve."""
    import random

    rng = random.Random(seed)
    ids = [f"n{i:04d}" for i in range(300)]
    perm = ids[:]
    rng.shuffle(perm)
    edges = []
    # several long chains over a shuffled id order (so the min id sits
    # at a random chain position, not an endpoint)
    pos = 0
    for chain_len in (60, 40, 25, 10):
        chain = perm[pos : pos + chain_len]
        edges += list(zip(chain, chain[1:]))
        pos += chain_len
    # random clutter edges over the remainder
    rest = perm[pos:]
    edges += [tuple(rng.sample(rest, 2)) for _ in range(40)]
    a = _run(spark, edges, ids)
    b = _run(spark, edges, ids, driver_threshold=0, coded_threshold=0)
    assert a == b
    assert a == _run(spark, edges, ids, driver_threshold=0)
    for v, lbl in a.items():
        assert lbl <= v
    # the 60-chain really is one component
    chain0 = perm[:60]
    assert len({a[v] for v in chain0}) == 1


def test_simhash_inbucket_equals_join_verify(spark, cfg):
    """simhash_edges_in_bucket (verification inside the bucket stage)
    must emit exactly the edge set of the candidate_pairs ->
    verify_simhash join formulation — moving the Hamming filter before
    the distinct cannot change the result."""
    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators import candidates as C
    from file_dedup_rust_spark.operators import verify as V
    from file_dedup_rust_spark.plans.pipeline import audio_reps

    clips = datagen.generate_clips(spark, 600, seed=7)
    sigs = compute_signatures(clips, cfg)
    areps = audio_reps(sigs).persist()
    fast = {
        (r["a"], r["b"], round(r["sim"], 9))
        for r in V.simhash_edges_in_bucket(areps, cfg, cfg.band_cap).collect()
    }
    pairs = C.candidate_pairs(C.explode_keys(areps, "sim_keys"), cfg.band_cap)
    slow = {
        (r["a"], r["b"], round(r["sim"], 9))
        for r in V.verify_simhash(pairs, areps, cfg).collect()
    }
    assert fast == slow
    assert len(fast) > 0  # the seed plants near-dups; non-vacuous
