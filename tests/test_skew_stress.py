"""Adversarial hot-key corpus (VERDICT r4 item 8): boilerplate
transcripts + near-silence audio that NO exact tier can collapse must
(a) trip the counted posting caps on every near-dup path, (b) leave
the job linear and completing, and (c) not cost the base corpus any
planted recall.  The >= 1.28 M-scale run of the same corpus lives in
tools/skew_stress.py (results in BENCH.md); this pins the semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_dedup_rust_spark import datagen
from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions.udfs import compute_signatures
from file_dedup_rust_spark.operators import candidates as C
from file_dedup_rust_spark.operators.connected_components import (
    connected_components,
)
from file_dedup_rust_spark.plans.pipeline import (
    audio_reps,
    build_edges,
    text_reps,
)

N_BASE, N_HOT, CAP = 400, 120, 50


def test_hot_skew_caps_engage_and_base_recall_survives(spark):
    cfg = DedupConfig(band_cap=CAP)
    base = datagen.generate_clips(spark, N_BASE, seed=42)
    hot = datagen.hot_skew_clips(spark, N_HOT, seed=42)
    clips = base.unionByName(hot)
    sigs = compute_signatures(clips, cfg).persist()
    try:
        # the corpus is genuinely uncollapsible: every hot sha256,
        # pcm_sha and t_norm is distinct (rep contraction and the
        # exact stars cannot defuse it — only the caps can)
        h = sigs.filter(F.col("clip_id").startswith("hot_"))
        assert h.count() == N_HOT
        for col in ("sha256", "pcm_sha", "t_norm"):
            assert h.select(col).distinct().count() == N_HOT, col

        # every near-dup posting path reports dropped (counted) keys
        treps, areps = text_reps(sigs), audio_reps(sigs)
        postings = {
            "minhash": C.explode_keys(treps, "mh_bands"),
            "simhash": C.explode_keys(areps, "sim_keys"),
            "winnow": C.explode_keys(treps, "fps"),
        }
        for path, posting in postings.items():
            dropped = C.dropped_buckets(posting, cfg.band_cap)
            assert dropped.count() > 0, f"{path} cap never engaged"
            # the hot pile-up is what got dropped
            assert (
                dropped.agg(F.max("n")).collect()[0][0] >= N_HOT
            ), path

        # the job completes and the BASE corpus loses nothing: every
        # planted exact pair still co-clusters (the exact tiers are
        # hash aggregations, untouched by posting caps)
        edges = build_edges(sigs, cfg)
        labels = {
            r["clip_id"]: r["cluster_id"]
            for r in connected_components(
                edges.select("a", "b"), sigs.select("clip_id")
            ).collect()
        }
        plan = datagen.build_plan(N_BASE, seed=42)
        exact = plan[plan["role"] == "exact"]
        assert len(exact) > 0
        for r in exact.itertuples(index=False):
            src_id = f"clip_{int(r.source):012d}"
            assert labels[r.clip_id] == labels[src_id]
    finally:
        sigs.unpersist()
