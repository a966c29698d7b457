"""THE correctness gate (BASELINE.json): pipeline-vs-oracle dup-pair
recall >= 0.99 at identical shingle/signature config, plus per-row
invariants (decoded-PCM digest + transcript equality) and planted
ground-truth quality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from file_dedup_rust_spark import datagen as DG
from file_dedup_rust_spark import oracle as O
from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import compute_signatures
from file_dedup_rust_spark.plans.pipeline import build_edges, run_pipeline

N = 400
SEED = 42


@pytest.fixture(scope="module")
def clips_pdf():
    return DG.generate_clips_pandas(N, SEED)


@pytest.fixture(scope="module")
def clips_df(spark, clips_pdf):
    return spark.createDataFrame(clips_pdf, schema=DG.CLIP_SCHEMA).cache()


def test_distributed_generation_matches_pandas(spark, clips_pdf):
    dist = DG.generate_clips(spark, N, SEED, partitions=8).toPandas()
    dist = dist.sort_values("clip_id").reset_index(drop=True)
    ref = clips_pdf.sort_values("clip_id").reset_index(drop=True)
    assert dist["clip_id"].tolist() == ref["clip_id"].tolist()
    assert all(bytes(x) == bytes(y) for x, y in zip(dist["bytes"], ref["bytes"]))
    assert dist["transcript"].tolist() == ref["transcript"].tolist()


def test_signature_parity_spark_vs_oracle(spark, clips_df, clips_pdf, cfg):
    """The mapInPandas signatures must be bit-identical to the oracle's
    (same kernels, different batching) — including per-row PCM digests
    (the decoded-PCM invariant) and transcripts."""
    s_spark = (
        compute_signatures(clips_df, cfg)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    s_oracle = (
        O.oracle_signatures(clips_pdf, cfg)
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert s_spark["sha256"].tolist() == s_oracle["sha256"].tolist()
    assert s_spark["simhash"].tolist() == s_oracle["simhash"].tolist()
    assert s_spark["t_norm"].tolist() == s_oracle["t_norm"].tolist()
    assert s_spark["n_samples"].tolist() == s_oracle["n_samples"].tolist()
    assert np.allclose(s_spark["pcm_rms"], s_oracle["pcm_rms"])
    for a, b in zip(s_spark["minhash"], s_oracle["minhash"]):
        assert list(a) == list(b)
    for a, b in zip(s_spark["mh_bands"], s_oracle["mh_bands"]):
        assert list(a) == list(b)


def test_pipeline_recall_vs_oracle(spark, clips_df, clips_pdf, cfg, tmp_path):
    """Dup-pair recall >= 0.99 pipeline vs numpy oracle (co-membership
    pairs).  Also checks precision — the pipeline must not invent
    co-memberships the oracle lacks."""
    res = run_pipeline(spark, clips_df, cfg, str(tmp_path / "ckpt"))
    assign_spark = res.assignments.toPandas()

    sig = O.oracle_signatures(clips_pdf, cfg)
    edges_o = O.oracle_edges(sig, cfg)
    assign_o = O.oracle_assignments(edges_o, clips_pdf["clip_id"].tolist())

    found = O.co_membership_pairs(assign_spark)
    want = O.co_membership_pairs(assign_o)
    recall = O.pair_recall(found, want)
    precision = O.pair_recall(want, found)  # symmetric formula
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"


def test_pipeline_recall_vs_planted_truth(spark, clips_df, cfg, tmp_path):
    """Quality vs ground truth by construction (FIXTURES.md): planted
    dup pairs recovered, distractors kept apart."""
    res = run_pipeline(spark, clips_df, cfg, str(tmp_path / "ckpt2"))
    assign = res.assignments.toPandas()
    found = O.co_membership_pairs(assign)

    truth = DG.planted_truth(N, SEED)
    ids = DG.build_plan(N, SEED)["clip_id"].tolist()
    assign_t = O.oracle_assignments(truth, ids)
    want = O.co_membership_pairs(assign_t)
    rec = O.pair_recall(found, want)
    assert rec >= 0.98, f"planted recall {rec}"

    plan = DG.build_plan(N, SEED)
    label = dict(zip(assign["clip_id"], assign["cluster_id"]))
    for r in plan[plan["role"] == "distractor"].itertuples():
        assert label[r.clip_id] != label[f"clip_{int(r.source):012d}"]


def test_cluster_summary(spark, clips_df, cfg, tmp_path):
    res = run_pipeline(spark, clips_df, cfg, str(tmp_path / "ckpt3"))
    clusters = res.clusters.toPandas()
    assert (clusters["size"] > 1).all()
    assert clusters["intra_similarity_score"].between(0.0, 1.0).all()
    # representative id is a member id
    assign = res.assignments.toPandas()
    members = set(assign["clip_id"])
    assert set(clusters["cluster_id"]) <= members


def test_tier_report(spark, clips_df, cfg):
    """tier_report attributes each distinct pair to its CHEAPEST tier:
    kinds are counted raw, marginal pairs dedupe across tiers, and the
    marginal total equals the number of distinct undirected pairs."""
    from file_dedup_rust_spark.plans.pipeline import (
        TIER_LADDER,
        build_edges,
        tier_report,
    )

    edges = build_edges(compute_signatures(clips_df, cfg), cfg)
    rep = tier_report(edges)
    assert set(rep["edges_by_kind"]) <= set(TIER_LADDER)
    assert set(rep["marginal_pairs_by_tier"]) <= set(TIER_LADDER)
    # raw kind counts sum to the edge count
    assert sum(rep["edges_by_kind"].values()) == edges.count()
    # marginal attribution partitions the distinct UNDIRECTED pair set
    # (containment-style tiers emit contained-first, so canonicalize)
    from pyspark.sql import functions as F

    n_pairs = (
        edges.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .count()
    )
    assert sum(rep["marginal_pairs_by_tier"].values()) == n_pairs
    # every marginal count is bounded by that tier's raw count
    for k, n in rep["marginal_pairs_by_tier"].items():
        assert n <= rep["edges_by_kind"][k]
    # the exact tier always wins its own pairs (cheapest in the ladder)
    if "exact" in rep["edges_by_kind"]:
        assert rep["marginal_pairs_by_tier"].get("exact", 0) > 0


def test_pipeline_audio_containment_tier(spark, clips_df, cfg, tmp_path):
    """Opt-in sub-clip tier: the pipeline gains audio_containment
    edges (exact audio families are mutually contained), never loses
    a co-membership the default tiers found, and the stage
    checkpoints/resumes like every other stage."""
    res = run_pipeline(
        spark, clips_df, cfg, str(tmp_path / "ck_ac"), audio_containment=True
    )
    kinds = {r["kind"] for r in res.edges.select("kind").distinct().collect()}
    assert "audio_containment" in kinds

    base = run_pipeline(spark, clips_df, cfg, str(tmp_path / "ck_base"))
    pairs_base = O.co_membership_pairs(base.assignments.toPandas())
    pairs_ac = O.co_membership_pairs(res.assignments.toPandas())
    assert pairs_base <= pairs_ac  # the extra tier only merges

    # resume: same checkpoint, every stage skipped
    res2 = run_pipeline(
        spark, clips_df, cfg, str(tmp_path / "ck_ac"), audio_containment=True
    )
    assert all(s.skipped for s in res2.stages)

    # TOGGLING the tier on the base checkpoint must invalidate the
    # downstream stages (their edge set changed).  Since round 5 the
    # frame fingerprints ride the signature decode pass (no second
    # bytes scan), so the toggle REBUILDS signatures too (the stage
    # fingerprint folds the output schema — ADVICE r4); the plain
    # edge stage, which doesn't read frame_fps, is still reused.
    res3 = run_pipeline(
        spark, clips_df, cfg, str(tmp_path / "ck_base"),
        audio_containment=True,
    )
    sk = {s.name: s.skipped for s in res3.stages}
    assert not sk["signatures"] and sk["edges"]
    assert not sk["ac_edges"] and not sk["assignments"] and not sk["clusters"]
    kinds3 = {r["kind"] for r in res3.edges.select("kind").distinct().collect()}
    assert "audio_containment" in kinds3

    # resume=False recomputes every stage even on a warm checkpoint
    res4 = run_pipeline(
        spark, clips_df, cfg, str(tmp_path / "ck_base"), resume=False
    )
    assert not any(s.skipped for s in res4.stages)
