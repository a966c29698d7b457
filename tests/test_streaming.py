"""Structured Streaming surface: incremental dedup across micro-batches,
stateful cluster assignment, watermarked windowed stats.

Streams run with trigger(availableNow=True) so each test drains the
landing directory and terminates (the reference's drain-the-queue
semantics, job_queue.rs:59-78).
"""

from __future__ import annotations

import os

import pytest

from file_dedup_rust_spark import datagen
from file_dedup_rust_spark.streaming.incremental import (
    incremental_exact_dedup,
    streaming_cluster_assign,
    windowed_ingest_stats,
)


@pytest.fixture(scope="module")
def two_batches(spark, tmp_path_factory):
    """Two parquet drops where batch 2 contains byte-identical copies
    of batch 1 rows (cross-batch exact dups by construction: datagen's
    'exact' role copies its base's bytes)."""
    root = tmp_path_factory.mktemp("stream")
    landing = str(root / "landing")
    pdf = datagen.generate_clips_pandas(120, seed=42)
    plan = datagen.build_plan(120, seed=42)
    base_id = {int(r.idx): r.clip_id for r in plan.itertuples() if r.role == "base"}
    exact_children = [
        (r.clip_id, base_id[int(r.source)])
        for r in plan.itertuples() if r.role == "exact"
    ]
    assert len(exact_children) > 0
    base_ids = {b for _, b in exact_children}
    b1 = pdf[pdf.clip_id.isin(base_ids)]
    b2 = pdf[~pdf.clip_id.isin(base_ids)]
    os.makedirs(landing, exist_ok=True)
    spark.createDataFrame(b1, schema=datagen.CLIP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{landing}/batch=1")
    spark.createDataFrame(b2, schema=datagen.CLIP_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{landing}/batch=2")
    return landing, root, exact_children


def test_incremental_exact_dedup_finds_cross_batch_dups(spark, two_batches):
    landing, root, exact_children = two_batches
    out = str(root / "matches")
    store = str(root / "store")
    ck = str(root / "ck1")
    q = incremental_exact_dedup(spark, f"{landing}/batch=1", store, out, ck)
    q.awaitTermination(120)
    q2 = incremental_exact_dedup(spark, f"{landing}/batch=2", store, out, str(root / "ck2"))
    q2.awaitTermination(120)

    matches = spark.read.parquet(out)
    got = {
        (r.clip_id, r.matched_clip_id) for r in matches.collect()
    }
    # every planted exact child (batch 2) must match its base (batch 1)
    want = set(exact_children)
    missing = want - got
    assert not missing, f"missed cross-batch exact dups: {missing}"
    # store accumulated both batches
    assert spark.read.parquet(store).count() == 120


def test_streaming_cluster_assign_stateful(spark, two_batches):
    landing, root, exact_children = two_batches
    out = str(root / "assigned")
    ck = str(root / "ck-state")
    q = streaming_cluster_assign(spark, landing, out, ck)
    q.awaitTermination(180)
    assigned = spark.read.parquet(out)
    rows = {r.clip_id: r.cluster_rep for r in assigned.collect()}
    assert len(rows) == 120
    # exact dup pairs share a representative
    for child, base in exact_children:
        assert rows[child] == rows[base]


def test_windowed_ingest_stats_schema(spark, two_batches):
    landing, root, _ = two_batches
    out = str(root / "winstats")
    ck = str(root / "ck-win")
    q = windowed_ingest_stats(spark, landing, out, ck, window="10 seconds",
                              watermark="10 seconds")
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert set(df.columns) == {
        "window_start", "window_end", "codec", "n_clips", "total_dur_ms"
    }
    # append mode only emits windows closed by the watermark; with
    # availableNow + processing-time windows that may be zero rows —
    # the schema/plumbing is what this asserts. Run a second drop to
    # close the first window if rows exist.
    assert df.count() >= 0


@pytest.fixture(scope="module")
def near_batches(spark, tmp_path_factory):
    """Batch 1 = audio bases, batch 2 = their SNR-perturbed near-dup
    children (role 'audio_near') plus everything else."""
    root = tmp_path_factory.mktemp("stream-near")
    landing = str(root / "landing")
    pdf = datagen.generate_clips_pandas(150, seed=43)
    plan = datagen.build_plan(150, seed=43)
    base_id = {int(r.idx): r.clip_id for r in plan.itertuples() if r.role == "base"}
    near_children = [
        (r.clip_id, base_id[int(r.source)])
        for r in plan.itertuples() if r.role == "audio_near"
    ]
    assert len(near_children) > 0
    base_ids = {b for _, b in near_children}
    b1 = pdf[pdf.clip_id.isin(base_ids)]
    b2 = pdf[~pdf.clip_id.isin(base_ids)]
    os.makedirs(landing, exist_ok=True)
    spark.createDataFrame(b1, schema=datagen.CLIP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{landing}/batch=1")
    spark.createDataFrame(b2, schema=datagen.CLIP_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{landing}/batch=2")
    return landing, root, near_children


def test_incremental_near_dedup_cross_batch(spark, near_batches, cfg):
    from file_dedup_rust_spark.streaming.incremental import incremental_near_dedup

    landing, root, near_children = near_batches
    out = str(root / "matches")
    store = str(root / "store")
    q = incremental_near_dedup(spark, f"{landing}/batch=1", store, out, str(root / "ck1"), cfg)
    q.awaitTermination(180)
    q2 = incremental_near_dedup(spark, f"{landing}/batch=2", store, out, str(root / "ck2"), cfg)
    q2.awaitTermination(180)
    m = spark.read.parquet(out)
    audio = {(r.clip_id, r.matched_clip_id) for r in m.filter("match_kind='audio'").collect()}
    missing = set(near_children) - audio
    assert not missing, f"missed cross-batch near dups: {missing}"
    # every match passed the Hamming threshold
    sims = [r.sim for r in m.filter("match_kind='audio'").collect()]
    assert all(s >= 1.0 - cfg.hamming_max / cfg.simhash_bits - 1e-9 for s in sims)
    # stores accumulated both batches
    assert spark.read.parquet(f"{store}/sigs").count() == 150
