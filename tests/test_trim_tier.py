"""Silence-pad-invariant exact tier (trim_exact, cfg.trim_eps) and the
band-limit quality gate (rolloff / q_min_rolloff) — round 5.

The padded-re-upload defect: the same recording exported with
leading/trailing silence (editor defaults, fixed-length segmenter
zero-fill) differs in bytes AND in decoded samples, so both the sha256
and pcm_exact tiers miss it.  The upsample-fraud defect: 8 kHz content
shipped in a 44.1 kHz container claims bandwidth it does not carry.
Both detectors ride the single signature decode pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import signature_batch

SR = 8000


def _sig(seed=0, dur_s=1.0, amp=0.5):
    """A deterministic test signal with NON-silent endpoints (so
    trimming the unpadded original is a no-op and the trim hash is a
    pure function of the planted padding)."""
    rng = np.random.default_rng(seed)
    n = int(SR * dur_s)
    x = amp * np.sin(2 * np.pi * 440 * np.arange(n) / SR + 0.7)
    x += 0.05 * rng.standard_normal(n)
    return np.clip(x, -0.9, 0.9).astype(np.float64)


def _pad(x, lead_s=0.25, tail_s=0.5):
    return np.concatenate(
        [np.zeros(int(SR * lead_s)), x, np.zeros(int(SR * tail_s))]
    )


def _batch(rows, cfg):
    pdf = pd.DataFrame(
        {
            "clip_id": [r[0] for r in rows],
            "bytes": [r[1] for r in rows],
            "sr_hz": [SR] * len(rows),
            "dur_ms": [None] * len(rows),
            "codec": ["wav"] * len(rows),
            "transcript": [r[2] for r in rows],
        }
    )
    return signature_batch(pdf, cfg, A.simhash_planes(cfg))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_trim_silence_kernel():
    eps = 1e-3
    x = np.array([0.0, 0.0005, 0.4, 0.0, -0.3, 0.0002, 0.0])
    out = A.trim_silence(x, eps)
    # leading/trailing sub-eps samples stripped, INTERIOR zero kept
    assert np.array_equal(out, np.array([0.4, 0.0, -0.3]))
    assert A.trim_silence(np.zeros(100), eps).size == 0
    assert A.trim_silence(np.array([]), eps).size == 0
    full = np.array([0.5, -0.5])
    assert np.array_equal(A.trim_silence(full, eps), full)


def test_spectral_rolloff_kernel():
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(SR).astype(np.float64) * 0.3
    r_full = A.spectral_rolloff(noise)
    assert r_full is not None and r_full > 0.85
    # band-limit at 0.3 Nyquist: rolloff lands just below the wall
    spec = np.fft.rfft(noise)
    spec[int(0.3 * spec.size):] = 0.0
    bl = np.fft.irfft(spec, noise.size)
    r_bl = A.spectral_rolloff(bl)
    assert r_bl is not None and 0.2 < r_bl <= 0.31
    assert A.spectral_rolloff(np.zeros(1000)) is None
    assert A.spectral_rolloff(np.array([])) is None


# ---------------------------------------------------------------------------
# signature pass
# ---------------------------------------------------------------------------

def test_trim_sha_off_by_default_and_collides_padded_copies():
    x = _sig(seed=1)
    rows = [
        ("orig", A.encode_wav(x, SR), "alpha"),
        ("padded", A.encode_wav(_pad(x), SR), "beta"),
        ("other", A.encode_wav(_sig(seed=2), SR), "gamma"),
    ]
    off = _batch(rows, DedupConfig())
    assert (off["trim_sha"] == "").all()  # default: bit-stable, no hash

    cfg = DedupConfig(trim_eps=1e-3)
    on = _batch(rows, cfg)
    t = dict(zip(on["clip_id"], on["trim_sha"]))
    p = dict(zip(on["clip_id"], on["pcm_sha"]))
    assert t["orig"] == t["padded"] != ""
    assert p["orig"] != p["padded"]  # the exact tiers genuinely miss it
    assert t["other"] not in (t["orig"], "")


def test_trim_sha_composes_with_canonical_rate():
    """A PADDED re-upload of the 16 kHz master collides with the
    canonical-chain 8 kHz distribution copy when both opt-in tiers are
    on: the trim hash runs on the canonical-rate samples, padding
    zeros decimate to zeros, and the master's even samples decimate to
    exactly the canonical copy's values (the same exactness contract
    as the pcm_exact cross-rate test, test_canonical_rate.py)."""
    sr_hi = 2 * SR
    master = _sig(seed=3).astype(np.float32)
    hi_bytes = A.encode_wav(master, sr_hi)
    # canonical distribution chain: decode -> canonical resample ->
    # canonical x32768 quantize -> raw pcm_s16le (encode_wav's x32767
    # would be a foreign quantizer)
    lo_pcm = A.resample_linear(A.decode_audio(hi_bytes, "wav"), sr_hi, SR)
    lo_bytes = (
        np.clip(np.round(lo_pcm.astype(np.float64) * 32768.0), -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    padded_hi = np.concatenate(
        [np.zeros(sr_hi // 2, np.float32), master, np.zeros(sr_hi, np.float32)]
    )
    cfg = DedupConfig(trim_eps=1e-3, cr_hz=SR)
    pdf = pd.DataFrame(
        {
            "clip_id": ["lo", "padded_hi"],
            "bytes": [lo_bytes, A.encode_wav(padded_hi, sr_hi)],
            "sr_hz": [SR, sr_hi],
            "dur_ms": [None, None],
            "codec": ["pcm_s16le", "wav"],
            "transcript": ["alpha", "beta"],
        }
    )
    out = signature_batch(pdf, cfg, A.simhash_planes(cfg))
    t = dict(zip(out["clip_id"], out["trim_sha"]))
    p = dict(zip(out["clip_id"], out["pcm_sha"]))
    assert t["lo"] == t["padded_hi"] != ""
    assert p["lo"] != p["padded_hi"]  # padding defeats even pcm_exact


# ---------------------------------------------------------------------------
# batch tier + quality gate
# ---------------------------------------------------------------------------

def test_padded_reupload_clusters_through_trim_tier(spark):
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.connected_components import (
        connected_components,
    )
    from file_dedup_rust_spark.plans.pipeline import build_edges

    x = _sig(seed=4)
    rows = [
        ("c_orig", bytearray(A.encode_wav(x, SR)), SR, 1000, "wav", "alpha"),
        ("c_pad", bytearray(A.encode_wav(_pad(x), SR)), SR, 1750, "wav",
         "beta"),
        ("c_other", bytearray(A.encode_wav(_sig(seed=5), SR)), SR, 1000,
         "wav", "gamma"),
    ]
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )
    clips = spark.createDataFrame(rows, schema)

    cfg_on = DedupConfig(trim_eps=1e-3)
    edges_on = build_edges(compute_signatures(clips, cfg_on), cfg_on)
    trim = {
        (r["a"], r["b"])
        for r in edges_on.filter("kind = 'trim_exact'").collect()
    }
    assert trim == {("c_orig", "c_pad")} or trim == {("c_pad", "c_orig")}
    cc = connected_components(
        edges_on.select("a", "b"),
        compute_signatures(clips, cfg_on).select("clip_id"),
    )
    lbl = {r["clip_id"]: r["cluster_id"] for r in cc.collect()}
    assert lbl["c_orig"] == lbl["c_pad"] != lbl["c_other"]

    # tier off: no trim_exact edges exist anywhere
    cfg_off = DedupConfig()
    edges_off = build_edges(compute_signatures(clips, cfg_off), cfg_off)
    assert edges_off.filter("kind = 'trim_exact'").count() == 0


def test_band_limited_gate(spark):
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.audio_quality import quality_flags

    rng = np.random.default_rng(11)
    noise = (rng.standard_normal(SR) * 0.3).astype(np.float64)
    spec = np.fft.rfft(noise)
    spec[int(0.3 * spec.size):] = 0.0
    bl = np.fft.irfft(spec, noise.size)
    rows = [
        ("full", bytearray(A.encode_wav(noise, SR)), SR, 1000, "wav", "a"),
        ("narrow", bytearray(A.encode_wav(bl, SR)), SR, 1000, "wav", "b"),
    ]
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )
    clips = spark.createDataFrame(rows, schema)

    gated = DedupConfig(q_min_rolloff=0.5)
    flags = {
        r["clip_id"]: set(r["flags"])
        for r in quality_flags(
            compute_signatures(clips, gated), gated
        ).collect()
    }
    assert "band_limited" in flags["narrow"]
    assert "band_limited" not in flags["full"]

    # default config: the gate is off, narrow-band content passes
    off = DedupConfig()
    flags_off = {
        r["clip_id"]: set(r["flags"])
        for r in quality_flags(
            compute_signatures(clips, off), off
        ).collect()
    }
    assert "band_limited" not in flags_off["narrow"]
