"""Datagen determinism + oracle quality vs the PLANTED ground truth.

(The pipeline-vs-oracle >= 0.99 recall gate lives in
test_pipeline_recall.py; this file validates that the shared kernels +
oracle orchestration actually find what datagen planted.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark import datagen as DG
from file_dedup_rust_spark import oracle as O

CFG = DedupConfig()
N = 400
SEED = 42


def _truth_co_pairs(n: int, seed: int, include_hot: bool = True) -> set:
    truth = DG.planted_truth(n, seed)
    if not include_hot:
        truth = truth[truth["kind"] != "hot"]
    ids = DG.build_plan(n, seed)["clip_id"].tolist()
    assign = O.oracle_assignments(truth, ids)
    return O.co_membership_pairs(assign)


def test_datagen_deterministic():
    a = DG.generate_clips_pandas(120, seed=7)
    b = DG.generate_clips_pandas(120, seed=7)
    assert a["clip_id"].tolist() == b["clip_id"].tolist()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    assert a["transcript"].tolist() == b["transcript"].tolist()


def test_datagen_planted_roles():
    plan = DG.build_plan(N, SEED)
    roles = set(plan["role"])
    assert {"base", "exact", "audio_near", "distractor",
            "transcript_near", "containment", "hot"} <= roles
    clips = DG.generate_clips_pandas(N, SEED)
    assert len(clips) == N
    assert clips["clip_id"].is_unique
    # exact rows are byte-identical to their base
    ex = plan[plan["role"] == "exact"].iloc[0]
    base_id = f"clip_{int(ex.source):012d}"
    row_e = clips[clips["clip_id"] == ex.clip_id].iloc[0]
    row_b = clips[clips["clip_id"] == base_id].iloc[0]
    assert bytes(row_e["bytes"]) == bytes(row_b["bytes"])
    assert row_e["transcript"] == row_b["transcript"]


def test_oracle_finds_planted_structure():
    clips = DG.generate_clips_pandas(N, SEED)
    sig = O.oracle_signatures(clips, CFG)
    edges = O.oracle_edges(sig, CFG)
    assign = O.oracle_assignments(edges, clips["clip_id"].tolist())
    found = O.co_membership_pairs(assign)
    truth = _truth_co_pairs(N, SEED)
    rec = O.pair_recall(found, truth)
    assert rec >= 0.98, f"planted recall {rec}"
    # precision guard: distractors must NOT merge with their base
    plan = DG.build_plan(N, SEED)
    label = dict(zip(assign["clip_id"], assign["cluster_id"]))
    for r in plan[plan["role"] == "distractor"].itertuples():
        base_id = f"clip_{int(r.source):012d}"
        assert label[r.clip_id] != label[base_id], "distractor matched base"


def test_oracle_kinds_present():
    clips = DG.generate_clips_pandas(N, SEED)
    sig = O.oracle_signatures(clips, CFG)
    edges = O.oracle_edges(sig, CFG)
    assert {"exact", "transcript", "audio", "containment"} <= set(edges["kind"])
