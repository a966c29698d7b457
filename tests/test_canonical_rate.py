"""Canonical-rate audio dedup (DedupConfig.cr_hz): the same recording
shipped at different sample rates must collide on the pcm_exact tier
(canonical resampler chain) and the SimHash tier (any reasonable
resampler), and must NOT collide with cr_hz off — pinning both the
feature and the gap it closes (spectral bands are Nyquist-relative,
functions/audio.py)."""

from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import compute_signatures

CFG_OFF = DedupConfig()
CFG_ON = DedupConfig(cr_hz=8000)


def _master_pcm(sr=16000, dur_s=1.0, seed=5, f1=380.0, f2=1150.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * f1 * t)
        + 0.2 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(t.size)
    )
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def test_resample_linear_identity_and_length():
    x = _master_pcm()
    assert A.resample_linear(x, 16000, 16000) is x
    y = A.resample_linear(x, 16000, 8000)
    assert y.size == ((x.size - 1) * 8000) // 16000 + 1
    # integer-ratio downsample of a linear ramp is exact
    ramp = np.arange(9, dtype=np.float32)
    assert np.array_equal(A.resample_linear(ramp, 4, 2), [0, 2, 4, 6, 8])
    assert A.resample_linear(np.zeros(0, np.float32), 4, 2).size == 0


def _rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )


def test_cross_rate_duplicates_collide_only_with_cr(spark):
    sr_hi, sr_lo = 16000, 8000
    master = _master_pcm(sr_hi)
    hi_bytes = A.encode_wav(master, sr_hi)
    # the canonical distribution chain: decode the master container,
    # canonical resample, quantize with the CANONICAL quantizer
    # (x32768, matching canonical_pcm_sha / the decoders' /32768 —
    # encode_wav's x32767 scaling is a FOREIGN quantizer and lands in
    # the SimHash tier instead, see the next test)
    lo_pcm = A.resample_linear(A.decode_audio(hi_bytes, "wav"), sr_hi, sr_lo)
    lo_bytes = (
        np.clip(np.round(lo_pcm.astype(np.float64) * 32768.0), -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    # an unrelated clip at the low rate must stay distinct (different
    # spectral content, not just different noise)
    other = _master_pcm(sr_lo, seed=99, f1=97.0, f2=2660.0)
    rows = [
        ("hi", bytearray(hi_bytes), sr_hi, 1000, "wav", "same words"),
        ("lo", bytearray(lo_bytes), sr_lo, 1000, "pcm_s16le", "same words"),
        ("other", bytearray(A.encode_wav(other, sr_lo)), sr_lo, 1000,
         "wav", "different words"),
    ]

    on = {
        r["clip_id"]: r
        for r in compute_signatures(_rows(spark, rows), CFG_ON).collect()
    }
    assert on["hi"]["pcm_sha"] == on["lo"]["pcm_sha"]
    assert on["hi"]["pcm_sha"] != on["other"]["pcm_sha"]
    d_dup = bin(on["hi"]["simhash"] ^ on["lo"]["simhash"]).count("1")
    d_other = bin(on["hi"]["simhash"] ^ on["other"]["simhash"]).count("1")
    assert d_dup <= CFG_ON.hamming_max < d_other

    off = {
        r["clip_id"]: r
        for r in compute_signatures(_rows(spark, rows), CFG_OFF).collect()
    }
    # the documented gap: native-rate semantics miss cross-rate dups
    assert off["hi"]["pcm_sha"] != off["lo"]["pcm_sha"]


def test_simhash_catches_foreign_resampler_with_cr(spark):
    """A variant produced by a DIFFERENT resampler (pairwise-mean
    decimation, not our linear interp) breaks the exact hash but stays
    within the SimHash Hamming threshold once both sides are
    canonicalized — the approximate tier carries cross-rate near-dups
    the exact tier can't."""
    sr_hi, sr_lo = 16000, 8000
    master = _master_pcm(sr_hi)
    foreign = master.reshape(-1, 2).mean(axis=1).astype(np.float32)
    rows = [
        ("hi", bytearray(A.encode_wav(master, sr_hi)), sr_hi, 1000, "wav",
         "x"),
        ("fr", bytearray(A.encode_wav(foreign, sr_lo)), sr_lo, 500, "wav",
         "x"),
    ]
    on = {
        r["clip_id"]: r
        for r in compute_signatures(_rows(spark, rows), CFG_ON).collect()
    }
    assert on["hi"]["pcm_sha"] != on["fr"]["pcm_sha"]
    d = bin(on["hi"]["simhash"] ^ on["fr"]["simhash"]).count("1")
    assert d <= CFG_ON.hamming_max


def test_native_rate_outputs_unchanged_by_the_feature(spark):
    """cr_hz=0 must be byte-identical to pre-feature behavior — the
    cross-round bit-stability contract. Pin a signature computed with
    the default config against the default-config result at the
    canonical rate (same clip, sr == cr_hz): canonicalization of a
    clip already at the canonical rate is the identity."""
    sr = 8000
    pcm = _master_pcm(sr)
    rows = [("a", bytearray(A.encode_wav(pcm, sr)), sr, 1000, "wav", "t")]
    base = compute_signatures(_rows(spark, rows), CFG_OFF).collect()[0]
    canon = compute_signatures(_rows(spark, rows), CFG_ON).collect()[0]
    assert base["pcm_sha"] == canon["pcm_sha"]
    assert base["simhash"] == canon["simhash"]
    assert base["mh_bands"] == canon["mh_bands"]
