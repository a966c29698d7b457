"""Audio benchmark decontamination (operators.audio_containment
.audio_decontam_hits): training clips that match or overlap an eval
set's AUDIO must be flagged even when transcripts differ — verbatim
copies (exact_audio via the codec-invariant pcm hash, catching
container flips), eval excerpts embedded in longer training clips
(eval_in_clip), and training clips that are excerpts of eval audio
(clip_in_eval)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from file_dedup_rust_spark.functions.audio import encode_wav
from file_dedup_rust_spark.functions.udfs import compute_signatures
from file_dedup_rust_spark.operators.audio_containment import (
    audio_decontam_hits,
    clip_frames,
)

SR = 16000


def _noise(rng, n):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _clips_df(spark, rows):
    pdf = pd.DataFrame(
        {
            "clip_id": [r[0] for r in rows],
            "bytes": [r[1] for r in rows],
            "sr_hz": [SR] * len(rows),
            "codec": [r[2] for r in rows],
            "transcript": [""] * len(rows),
        }
    )
    return spark.createDataFrame(
        pdf,
        "clip_id string, bytes binary, sr_hz int, codec string,"
        " transcript string",
    )


def _artifacts(spark, cfg, rows):
    clips = _clips_df(spark, rows)
    frames = clip_frames(clips, cfg)
    pcm = compute_signatures(clips, cfg).select("clip_id", "pcm_sha")
    return frames, pcm


def test_audio_decontam_three_tiers(spark, cfg):
    rng = np.random.default_rng(21)
    e1 = _noise(rng, SR * 2)
    e2 = _noise(rng, SR * 2)
    eval_rows = [
        ("eval_1", encode_wav(e1, SR), "wav"),
        ("eval_2", encode_wav(e2, SR), "wav"),
    ]

    # container-flipped verbatim copy of eval_1: raw pcm_s16le bytes
    i16 = np.clip(np.round(e1 * 32767.0), -32768, 32767)
    flip = i16.astype("<i2").tobytes()  # same int16 stream encode_wav ships
    # eval_2 embedded into a longer recording (hop-aligned)
    pre, post = _noise(rng, cfg.hop * 48), _noise(rng, cfg.hop * 32)
    container = np.concatenate([pre, e2, post])
    # a hop-aligned excerpt OF eval_2 (middle 60%)
    lo = cfg.hop * 16
    excerpt = e2[lo : lo + int(SR * 1.2)]
    corpus_rows = [
        ("c_flip", flip, "pcm_s16le"),
        ("c_embed", encode_wav(container, SR), "wav"),
        ("c_excerpt", encode_wav(excerpt, SR), "wav"),
        ("c_clean1", encode_wav(_noise(rng, SR * 2), SR), "wav"),
        ("c_clean2", encode_wav(_noise(rng, SR * 3), SR), "wav"),
    ]

    ev_frames, ev_pcm = _artifacts(spark, cfg, eval_rows)
    co_frames, co_pcm = _artifacts(spark, cfg, corpus_rows)
    hits = audio_decontam_hits(
        co_frames, co_pcm, ev_frames, ev_pcm, min_coverage=0.8, cfg=cfg
    ).collect()

    by_pair = {(r["clip_id"], r["eval_id"]): r for r in hits}
    assert by_pair[("c_flip", "eval_1")]["kind"] == "exact_audio"
    assert by_pair[("c_flip", "eval_1")]["sim"] == 1.0
    emb = by_pair[("c_embed", "eval_2")]
    assert emb["kind"] == "eval_in_clip" and emb["sim"] >= 0.9
    assert emb["frame_offset"] == 48  # eval_2 starts 48 hops in
    exc = by_pair[("c_excerpt", "eval_2")]
    assert exc["kind"] == "clip_in_eval" and exc["sim"] >= 0.9
    # a pair is reported ONCE (exact tier suppresses its frame hit)
    assert len([k for k in by_pair if k == ("c_flip", "eval_1")]) == 1
    assert sum(1 for r in hits if r["clip_id"] == "c_flip") == 1
    # clean clips emit nothing
    flagged = {r["clip_id"] for r in hits}
    assert "c_clean1" not in flagged and "c_clean2" not in flagged


def test_audio_decontam_clean_corpus_empty(spark, cfg):
    rng = np.random.default_rng(5)
    ev_frames, ev_pcm = _artifacts(
        spark, cfg, [("eval_1", encode_wav(_noise(rng, SR), SR), "wav")]
    )
    co_frames, co_pcm = _artifacts(
        spark,
        cfg,
        [
            ("c1", encode_wav(_noise(rng, SR), SR), "wav"),
            ("c2", encode_wav(_noise(rng, SR * 2), SR), "wav"),
        ],
    )
    assert (
        audio_decontam_hits(co_frames, co_pcm, ev_frames, ev_pcm, cfg=cfg)
        .count()
        == 0
    )


def test_audio_decontam_plan_broadcasts_eval(spark, cfg):
    """The corpus frame table must stream through broadcast joins —
    never be shuffled on fhash, never a cartesian."""
    import contextlib
    import io

    rng = np.random.default_rng(9)
    ev_frames, ev_pcm = _artifacts(
        spark, cfg, [("eval_1", encode_wav(_noise(rng, SR), SR), "wav")]
    )
    co_frames, co_pcm = _artifacts(
        spark, cfg, [("c1", encode_wav(_noise(rng, SR), SR), "wav")]
    )
    df = audio_decontam_hits(co_frames, co_pcm, ev_frames, ev_pcm, cfg=cfg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "BroadcastHashJoin" in text
