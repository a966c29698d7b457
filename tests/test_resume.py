"""Checkpoint/resume semantics (SURVEY.md section 5 item 5): kill after
stage k, re-run, identical output, committed stages not recomputed."""

from __future__ import annotations

import json
import os

import pytest

from file_dedup_rust_spark import datagen as DG
from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.plans.pipeline import run_pipeline

N = 150
SEED = 9


@pytest.fixture(scope="module")
def clips_df(spark):
    pdf = DG.generate_clips_pandas(N, SEED)
    return spark.createDataFrame(pdf, schema=DG.CLIP_SCHEMA).cache()


def _manifest(ckpt: str, stage: str) -> dict:
    with open(os.path.join(ckpt, "_manifest", f"{stage}.json")) as f:
        return json.load(f)


def test_kill_and_resume(spark, cfg, clips_df, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # run 1: killed after the signatures stage commits
    out = run_pipeline(spark, clips_df, cfg, ckpt, stop_after="signatures")
    assert out is None
    m1 = _manifest(ckpt, "signatures")
    assert m1["status"] == "committed"
    assert not os.path.exists(os.path.join(ckpt, "_manifest", "edges.json"))

    # run 2: resumes — signatures must NOT be recomputed
    res = run_pipeline(spark, clips_df, cfg, ckpt)
    assert res is not None
    m2 = _manifest(ckpt, "signatures")
    assert m2["committed_at"] == m1["committed_at"], "stage was recomputed"
    sig_stage = [s for s in res.stages if s.name == "signatures"][0]
    assert sig_stage.skipped

    # run 3: full resume — every stage skipped, same output
    a1 = res.assignments.toPandas().sort_values("clip_id").reset_index(drop=True)
    res2 = run_pipeline(spark, clips_df, cfg, ckpt)
    assert all(s.skipped for s in res2.stages)
    a2 = res2.assignments.toPandas().sort_values("clip_id").reset_index(drop=True)
    assert a1.equals(a2)


def test_config_change_invalidates_checkpoints(spark, cfg, clips_df, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    run_pipeline(spark, clips_df, cfg, ckpt, stop_after="signatures")
    other = DedupConfig(jaccard_threshold=0.9)
    res = run_pipeline(spark, clips_df, other, ckpt)
    sig_stage = [s for s in res.stages if s.name == "signatures"][0]
    assert not sig_stage.skipped, "stale checkpoint reused across configs"
