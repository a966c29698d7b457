"""Long-form audio segmentation (operators/segment.py) — coverage,
bit-exact slices, lineage, quarantine."""

from __future__ import annotations

import numpy as np
import pytest

from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import canonical_pcm_sha
from file_dedup_rust_spark.operators.segment import (
    segment_clips,
    segment_starts,
)

SR = 8000


def test_segment_starts_kernel():
    # 10 s at win 4 / stride 3 -> 0, 3, 6, then snap-to-end 6? no: 6+4=10
    assert segment_starts(10 * SR, 4 * SR, 3 * SR) == [0, 3 * SR, 6 * SR]
    # 11 s -> 0, 3, 6, snap-to-end 7
    assert segment_starts(11 * SR, 4 * SR, 3 * SR) == [
        0, 3 * SR, 6 * SR, 7 * SR,
    ]
    # shorter than a window -> one whole-clip segment
    assert segment_starts(SR, 4 * SR, 3 * SR) == [0]
    assert segment_starts(4 * SR, 4 * SR, 3 * SR) == [0]
    # full coverage and bounded overlap always
    for n in (7919, 31337, 100000):
        starts = segment_starts(n, 4 * SR, 3 * SR)
        assert starts[0] == 0
        assert starts[-1] + min(4 * SR, n) >= n  # tail covered
        assert all(b > a for a, b in zip(starts, starts[1:]))


def _clip(clip_id, pcm, codec="wav", sr=SR):
    body = (
        A.encode_wav(pcm, sr)
        if codec == "wav"
        else np.clip(np.round(np.asarray(pcm) * 32768.0), -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    return (clip_id, bytearray(body), sr, None, codec, "words")


def test_segments_decode_bit_identical_to_parent_slices(spark):
    rng = np.random.default_rng(17)
    long_pcm = np.clip(0.4 * rng.standard_normal(10 * SR), -0.9, 0.9)
    short_pcm = np.clip(0.4 * rng.standard_normal(SR // 2), -0.9, 0.9)
    rows = [
        _clip("long", long_pcm),
        _clip("short", short_pcm),
        ("bad", bytearray(b"\x00\x01nonsense"), SR, None, "wav", "x"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    segs = segment_clips(clips, win_s=4.0, stride_s=3.0).collect()
    by_parent: dict = {}
    for r in segs:
        by_parent.setdefault(r["parent_id"], []).append(r)

    # long: three full windows at 0/3/6 s
    longs = sorted(by_parent["long"], key=lambda r: r["seg_idx"])
    assert [r["start_ms"] for r in longs] == [0, 3000, 6000]
    assert all(r["dur_ms"] == 4000 and r["decode_ok"] for r in longs)
    assert [r["clip_id"] for r in longs] == [
        "long#0000", "long#0001", "long#0002",
    ]
    parent_dec = A.decode_audio(bytes(A.encode_wav(long_pcm, SR)), "wav")
    for r in longs:
        seg_dec = A.decode_audio(bytes(r["bytes"]), "pcm_s16le")
        s = r["start_ms"] * SR // 1000
        sl = parent_dec[s : s + 4 * SR]
        assert np.array_equal(seg_dec, sl)  # bit-identical slice
        assert canonical_pcm_sha(seg_dec, SR) == canonical_pcm_sha(sl, SR)

    # short: one whole-clip segment
    shorts = by_parent["short"]
    assert len(shorts) == 1 and shorts[0]["dur_ms"] == 500
    assert np.array_equal(
        A.decode_audio(bytes(shorts[0]["bytes"]), "pcm_s16le"),
        A.decode_audio(bytes(A.encode_wav(short_pcm, SR)), "wav"),
    )

    # undecodable parent: one quarantine row, no crash
    bad = by_parent["bad"]
    assert len(bad) == 1
    assert bad[0]["seg_idx"] == -1 and not bad[0]["decode_ok"]
    assert bad[0]["bytes"] is None


def test_resegmented_reupload_dedups_via_pcm_exact(spark):
    """The lineage property that matters at corpus scale: segmenting
    the SAME recording delivered in two different containers yields
    segment sets that collide pairwise on the codec-invariant pcm
    hash — so an incremental run over a re-uploaded master dedups
    against the earlier segmentation exactly."""
    rng = np.random.default_rng(23)
    pcm = np.clip(0.4 * rng.standard_normal(8 * SR), -0.9, 0.9)
    dec = A.decode_audio(bytes(A.encode_wav(pcm, SR)), "wav")
    rows = [
        _clip("wav_master", pcm, codec="wav"),
        _clip("raw_master", dec, codec="pcm_s16le"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    segs = segment_clips(clips, win_s=4.0, stride_s=3.0).collect()
    sha = {
        (r["parent_id"], r["seg_idx"]): canonical_pcm_sha(
            A.decode_audio(bytes(r["bytes"]), "pcm_s16le"), SR
        )
        for r in segs
        if r["decode_ok"]
    }
    n = max(i for (_, i) in sha) + 1
    assert n >= 2
    for i in range(n):
        assert sha[("wav_master", i)] == sha[("raw_master", i)]


def test_segment_args_validated(spark):
    clips = spark.createDataFrame(
        [],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    with pytest.raises(ValueError):
        segment_clips(clips, win_s=0.0)
    with pytest.raises(ValueError):
        segment_clips(clips, stride_s=-1.0)
    # stride > win would leave coverage gaps — rejected, not silent
    with pytest.raises(ValueError):
        segment_clips(clips, win_s=2.0, stride_s=5.0)
    # and the config mirror (the --segment pipeline path)
    from file_dedup_rust_spark.config import DedupConfig

    with pytest.raises(ValueError):
        DedupConfig(seg_win_s=2.0, seg_stride_s=5.0)
    with pytest.raises(ValueError):
        DedupConfig(seg_win_s=2.0, seg_stride_s=0.0)


def test_segment_then_dedup_collapses_duplicate_parents(spark):
    """--segment pipeline mode semantics: byte-identical parents yield
    byte-identical segment sets, so segment-granular dedup collapses
    them pairwise through the exact tier (and the canonical
    re-quantization means container flips would land in pcm_exact)."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.plans.pipeline import build_edges

    rng = np.random.default_rng(29)
    pcm = np.clip(0.4 * rng.standard_normal(8 * SR), -0.9, 0.9)
    other = np.clip(0.4 * rng.standard_normal(8 * SR), -0.9, 0.9)
    rows = [
        _clip("up_a", pcm),
        _clip("up_b", pcm),  # re-upload of the same recording
        _clip("other", other),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    segs = segment_clips(clips, win_s=4.0, stride_s=3.0)
    seg_clips = segs.filter("decode_ok").select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec",
        F.lit(None).cast("string").alias("transcript"),
    )
    cfg = DedupConfig()
    edges = build_edges(compute_signatures(seg_clips, cfg), cfg)
    exact = {
        (r["a"], r["b"])
        for r in edges.filter("kind = 'exact'").collect()
    }
    # every up_a segment pairs with its up_b twin; 'other' stays out
    assert len(exact) >= 2
    for a, b in exact:
        pa, pb = a.split("#")[0], b.split("#")[0]
        assert {pa, pb} == {"up_a", "up_b"}
        assert a.split("#")[1] == b.split("#")[1]


def test_segment_toggle_invalidates_checkpoints(spark, tmp_path):
    """The review finding that motivated moving segmentation into
    DedupConfig: re-running an existing checkpoint dir with --segment
    toggled must RECOMPUTE signatures (segment-granular rows), never
    silently resume the whole-clip ones."""
    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.plans.pipeline import run_pipeline

    clips = datagen.generate_clips(spark, 60, seed=7)
    ck = str(tmp_path / "ck")
    plain = run_pipeline(spark, clips, DedupConfig(), ck)
    n_plain = next(
        s.row_count for s in plain.stages if s.name == "signatures"
    )
    assert all(not s.skipped for s in plain.stages)

    seg_cfg = DedupConfig(seg_win_s=0.4, seg_stride_s=0.3)
    seg = run_pipeline(spark, clips, seg_cfg, ck)
    n_seg = next(s.row_count for s in seg.stages if s.name == "signatures")
    sig_stage = next(s for s in seg.stages if s.name == "signatures")
    assert not sig_stage.skipped  # fingerprint changed -> recompute
    assert n_seg > n_plain  # segment-granular rows, not clip rows

    # and the segmented run itself resumes cleanly
    again = run_pipeline(spark, clips, seg_cfg, ck)
    assert all(s.skipped for s in again.stages)
    assert next(
        s.row_count for s in again.stages if s.name == "signatures"
    ) == n_seg
