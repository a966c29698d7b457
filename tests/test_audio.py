from __future__ import annotations

import numpy as np
import pytest

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A

CFG = DedupConfig()


def _tone(sr=8000, dur_s=0.5, f=440.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    x = 0.5 * np.sin(2 * np.pi * f * t) + 0.2 * np.sin(2 * np.pi * 3.1 * f * t)
    x += 0.001 * rng.standard_normal(t.size)
    return x


def test_wav_roundtrip():
    x = _tone()
    data = A.encode_wav(x, 8000)
    y = A.decode_wav(data)
    assert y.size == x.size
    # int16 quantization (0.5/32767) + encode*32767 / decode/32768 scale skew
    assert np.max(np.abs(x - y)) < 2.5 / 32768


def test_pcm_roundtrip():
    x = _tone()
    i16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    y = A.decode_pcm_s16le(i16.tobytes())
    assert np.max(np.abs(x - y)) < 2.5 / 32768


def test_decode_dispatch_and_errors():
    with pytest.raises(ValueError):
        A.decode_audio(b"\x00" * 100, "mp3")
    with pytest.raises(ValueError):
        A.decode_wav(b"nonsense")


def test_snr30_invariant_features_close():
    """Per-row invariant (BASELINE.json input_hint): decode at
    SNR >= 30 dB stays close; features barely move."""
    x = _tone(seed=1)
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(x.size)
    rms = np.sqrt(np.mean(x**2))
    x_noisy = x + noise * (rms * 10 ** (-35 / 20))
    # decoded-PCM allclose at SNR >= 30 dB
    resid = x_noisy - x
    snr = 20 * np.log10(rms / np.sqrt(np.mean(resid**2)))
    assert snr >= 30
    fa = A.spectral_features(x, 8000, CFG)
    fb = A.spectral_features(x_noisy, 8000, CFG)
    assert np.dot(fa, fb) > 0.99  # unit vectors -> cosine


def test_simhash_noise_monotonic():
    """Hamming grows with noise; 35 dB stays within budget, 8 dB and
    unrelated signals fall far outside it."""
    planes = A.simhash_planes(CFG)
    x = _tone(seed=3)
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(x.size)
    rms = np.sqrt(np.mean(x**2))

    def sim_at(snr_db):
        y = x + noise * (rms * 10 ** (-snr_db / 20))
        return A.simhash64(A.spectral_features(y, 8000, CFG), planes)

    s_clean = A.simhash64(A.spectral_features(x, 8000, CFG), planes)
    d35 = A.hamming64(s_clean, sim_at(35.0))
    d8 = A.hamming64(s_clean, sim_at(8.0))
    other = _tone(f=973.0, seed=5)
    d_other = A.hamming64(
        s_clean, A.simhash64(A.spectral_features(other, 8000, CFG), planes)
    )
    assert d35 <= CFG.hamming_max
    assert d8 > CFG.hamming_max
    assert d_other > CFG.hamming_max
    assert d35 <= d8


def test_simhash_codec_invariance():
    """Same PCM through wav vs raw pcm_s16le -> identical simhash."""
    planes = A.simhash_planes(CFG)
    x = _tone(seed=6)
    y1 = A.decode_audio(A.encode_wav(x, 8000), "wav")
    i16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    y2 = A.decode_audio(i16.tobytes(), "pcm_s16le")
    s1 = A.simhash64(A.spectral_features(y1, 8000, CFG), planes)
    s2 = A.simhash64(A.spectral_features(y2, 8000, CFG), planes)
    assert s1 == s2


def test_simhash_band_keys():
    import math

    n_keys = math.comb(CFG.sim_bands, CFG.sim_key_arity)
    keys = A.simhash_band_keys(-12345678901234, CFG)
    assert keys.shape == (n_keys,)
    # slot index is mixed in -> all keys distinct even for value 0
    k0 = A.simhash_band_keys(0, CFG)
    assert len(set(k0.tolist())) == n_keys
    # flipping bits confined to <= sim_bands-arity bands keeps >= 1
    # shared key (the pigeonhole candidate guarantee)
    sim = 0x0123456789ABCDEF
    dirty = CFG.sim_bands - CFG.sim_key_arity  # worst guaranteed case
    corrupted = sim
    for band in range(dirty):
        corrupted ^= 0xFF << (band * CFG.sim_band_bits)
    shared = set(A.simhash_band_keys(sim, CFG)) & set(
        A.simhash_band_keys(corrupted, CFG)
    )
    assert len(shared) >= 1
    # and the keys differ between the two hashes somewhere
    assert set(A.simhash_band_keys(sim, CFG)) != set(
        A.simhash_band_keys(corrupted, CFG)
    )


def test_corrupt_audio_quarantined():
    """Undecodable bytes become decode_ok=False quarantine rows (the
    batch analog of the reference's status='failed' dead-lettering,
    deduplication_service.rs:128-137) — transcript signatures still
    compute, and nothing raises."""
    import pandas as pd

    from file_dedup_rust_spark.functions.udfs import signature_batch

    pdf = pd.DataFrame({
        "clip_id": ["good", "bad_wav", "empty", "bad_codec"],
        "bytes": [
            A.encode_wav(_tone(seed=1), 8000),
            b"RIFFxxxxWAVEgarbage-not-a-chunk",
            b"",
            b"\x01\x02\x03\x04",
        ],
        "sr_hz": [8000] * 4,
        "codec": ["wav", "wav", "wav", "flac"],
        "transcript": ["hello world one", None, "still has text here", "x"],
    })
    out = signature_batch(pdf, CFG, A.simhash_planes(CFG))
    ok = dict(zip(out["clip_id"], out["decode_ok"]))
    assert ok == {"good": True, "bad_wav": False, "empty": False,
                  "bad_codec": False}
    # sha256 and transcript features exist for every row regardless
    assert all(len(h) == 64 for h in out["sha256"])
    assert out.loc[out.clip_id == "empty", "t_len"].iloc[0] > 0
