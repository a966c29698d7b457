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


def test_simhash_gain_invariance():
    """A volume-normalized re-upload (the loudness-normalization
    defect: same recording at 0.5x / 1.8x gain, re-quantized to int16)
    lands within the SimHash Hamming budget — the RMS normalization in
    framed_power makes the spectral contrasts gain-invariant up to
    requantization noise, so the audio tier covers cross-gain dups
    that every exact tier (byte, pcm, trim) must miss."""
    planes = A.simhash_planes(CFG)
    x = _tone(seed=31)
    s_ref = A.simhash64(
        A.spectral_features(A.decode_audio(A.encode_wav(x, 8000), "wav"),
                            8000, CFG),
        planes,
    )
    for gain in (0.5, 0.25, 1.8):
        y = A.decode_audio(A.encode_wav(np.clip(x * gain, -1, 1), 8000), "wav")
        d = A.hamming64(
            s_ref, A.simhash64(A.spectral_features(y, 8000, CFG), planes)
        )
        assert d <= CFG.hamming_max, (gain, d)
        # and the exact tiers genuinely miss it
        from file_dedup_rust_spark.functions.udfs import canonical_pcm_sha

        assert canonical_pcm_sha(y, 8000) != canonical_pcm_sha(
            A.decode_audio(A.encode_wav(x, 8000), "wav"), 8000
        )


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


def test_pcm_sha_is_codec_invariant():
    """The canonical decoded-PCM hash collides for the SAME recording
    shipped in different lossless containers (raw pcm_s16le vs
    RIFF/WAVE), separates different audio and different sample rates,
    and is empty for quarantine rows."""
    import pandas as pd

    from file_dedup_rust_spark.functions.udfs import signature_batch

    x = _tone(seed=3)
    y = _tone(seed=4, f=523.0)
    i16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    pdf = pd.DataFrame({
        "clip_id": ["raw", "wav", "wav_copy", "other", "resampled", "bad"],
        "bytes": [
            i16.tobytes(),
            A.encode_wav(x, 8000),
            A.encode_wav(x, 8000),
            A.encode_wav(y, 8000),
            A.encode_wav(x, 16000),
            b"\x01\x02",
        ],
        "sr_hz": [8000, 8000, 8000, 8000, 16000, 8000],
        "codec": ["pcm_s16le", "wav", "wav", "wav", "wav", "flac"],
        "transcript": [""] * 6,
    })
    out = signature_batch(pdf, CFG, A.simhash_planes(CFG))
    sha = dict(zip(out["clip_id"], out["sha256"]))
    psha = dict(zip(out["clip_id"], out["pcm_sha"]))
    # container flip: bytes differ, decoded audio identical
    assert sha["raw"] != sha["wav"]
    assert psha["raw"] == psha["wav"] == psha["wav_copy"]
    # different audio / different rate / quarantine all separate
    assert psha["other"] != psha["raw"]
    assert psha["resampled"] != psha["raw"]
    assert psha["bad"] == ""


def test_container_flip_clusters_through_pcm_exact_tier(spark):
    """End-to-end: a wav + raw-pcm pair of the same recording clusters
    via a 'pcm_exact' edge between the two sha256 representatives,
    byte copies ride the 'exact' star, and unrelated audio stays out."""
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.connected_components import (
        connected_components,
    )
    from file_dedup_rust_spark.plans.pipeline import build_edges

    from file_dedup_rust_spark.functions.flac import encode_flac

    x = _tone(seed=21)
    y = _tone(seed=22, f=660.0)
    i16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    wav = A.encode_wav(x, 8000)
    rows = [
        ("c_wav", bytearray(wav), 8000, 500, "wav", "alpha"),
        ("c_raw", bytearray(i16.tobytes()), 8000, 500, "pcm_s16le", "beta"),
        ("c_copy", bytearray(wav), 8000, 500, "wav", "gamma"),
        ("c_other", bytearray(A.encode_wav(y, 8000)), 8000, 500, "wav", "delta"),
        # round 5: a COMPRESSED lossless container flip — decodes
        # bit-identical, so the same tier must catch it
        ("c_flac", bytearray(encode_flac(x, 8000)), 8000, 500, "flac",
         "epsilon"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    edges = build_edges(sigs, CFG)
    kinds = {
        (r["a"], r["b"], r["kind"]) for r in edges.collect()
    }
    # one pcm_exact edge between the two container reps (whichever
    # member string-min picked as rep), one byte-exact star edge
    pcm_edges = {(a, b) for a, b, k in kinds if k == "pcm_exact"}
    assert pcm_edges and all(
        {a, b} <= {"c_wav", "c_raw", "c_copy", "c_flac"} for a, b in pcm_edges
    )
    assert any(k == "exact" for _, _, k in kinds)
    cc = connected_components(
        edges.select("a", "b"), sigs.select("clip_id")
    )
    lbl = {r["clip_id"]: r["cluster_id"] for r in cc.collect()}
    assert lbl["c_wav"] == lbl["c_raw"] == lbl["c_copy"] == lbl["c_flac"]
    assert lbl["c_other"] != lbl["c_wav"]


def test_audio_containment_detects_planted_subclips(spark, cfg):
    """A clip whose PCM is embedded (hop-aligned) inside a longer
    recording must be detected as audio-contained at one consistent
    frame offset; unrelated noise clips must produce no edges; an
    exact-duplicate pair resolves to the id-ordered direction."""
    import numpy as np
    import pandas as pd

    from file_dedup_rust_spark.functions.audio import encode_wav
    from file_dedup_rust_spark.operators.audio_containment import (
        audio_containment_edges,
        clip_frames,
    )

    sr = 16000
    rng = np.random.default_rng(7)

    def noise(n):
        return (rng.standard_normal(n) * 0.1).astype(np.float32)

    base = noise(sr * 2)                       # 2 s inner clip
    pre, post = noise(cfg.hop * 48), noise(cfg.hop * 32)
    container = np.concatenate([pre, base, post])
    rows = [
        ("clip_a", base),                      # contained
        ("clip_b", container),                 # container
        ("clip_c", noise(sr * 2)),             # unrelated
        ("clip_d", noise(sr * 3)),             # unrelated
        ("clip_e", base.copy()),               # exact dup of clip_a
    ]
    pdf = pd.DataFrame(
        {
            "clip_id": [r[0] for r in rows],
            "bytes": [encode_wav(r[1], sr) for r in rows],
            "sr_hz": [sr] * len(rows),
            "codec": ["wav"] * len(rows),
        }
    )
    clips = spark.createDataFrame(
        pdf, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    frames = clip_frames(clips, cfg).persist()
    rows = audio_containment_edges(frames, min_coverage=0.8).collect()
    frames.unpersist()
    edges = {(r["a"], r["b"]): r["sim"] for r in rows}
    offs = {(r["a"], r["b"]): r["frame_offset"] for r in rows}

    assert ("clip_a", "clip_b") in edges and edges[("clip_a", "clip_b")] >= 0.9
    # the container's prefix is 48 hops, so the sub-clip's frames sit
    # at exactly that frame offset
    assert offs[("clip_a", "clip_b")] == 48
    assert offs[("clip_a", "clip_e")] == 0  # exact dup: aligned at 0
    # the exact copy is contained in the container too, and the
    # equal-length mutual pair keeps only the id-ordered direction
    assert ("clip_e", "clip_b") in edges
    assert ("clip_a", "clip_e") in edges and ("clip_e", "clip_a") not in edges
    # no unrelated clip participates in any edge
    flat = {c for pair in edges for c in pair}
    assert "clip_c" not in flat and "clip_d" not in flat


def test_clip_frames_quarantines_undecodable_and_fused_path_matches(
    spark, cfg
):
    """(1) A clip whose bytes cannot decode must be SURFACED by the
    frame pass (quarantine marker, undecoded_clips), never silently
    vanished (VERDICT r4 item 5), and must not break or pollute the
    containment join.  (2) The fused path (frame fingerprints emitted
    from the signature decode pass, VERDICT r4 item 4) must produce
    byte-identical frame rows to the standalone clip_frames scan."""
    import numpy as np
    import pandas as pd

    from file_dedup_rust_spark.functions.audio import encode_wav
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.audio_containment import (
        audio_containment_edges,
        clip_frames,
        frames_from_signatures,
        undecoded_clips,
    )

    sr = 16000
    rng = np.random.default_rng(11)
    good = (rng.standard_normal(sr * 2) * 0.1).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "clip_id": ["ok_a", "bad_trunc", "bad_codec"],
            "bytes": [
                encode_wav(good, sr),
                b"RIFF\x00\x00\x00\x00GARBAGE",   # broken container
                encode_wav(good, sr),              # fine bytes ...
            ],
            "sr_hz": [sr] * 3,
            "codec": ["wav", "wav", "mp3"],        # ... unsupported codec
            "transcript": ["", "", ""],
        }
    )
    clips = spark.createDataFrame(
        pdf,
        "clip_id string, bytes binary, sr_hz int, codec string, "
        "transcript string",
    )

    frames = clip_frames(clips, cfg).persist()
    try:
        assert {r["clip_id"] for r in undecoded_clips(frames).collect()} == {
            "bad_trunc", "bad_codec",
        }
        # marker rows are filtered before the join: no crash, and the
        # quarantined clips appear in no edge
        touched = {
            c
            for r in audio_containment_edges(frames, cfg=cfg).collect()
            for c in (r["a"], r["b"])
        }
        assert "bad_trunc" not in touched and "bad_codec" not in touched

        fused = frames_from_signatures(
            compute_signatures(clips, cfg, with_frames=True)
        )
        assert sorted(map(tuple, fused.collect())) == sorted(
            map(tuple, frames.collect())
        )
    finally:
        frames.unpersist()


def test_audio_containment_stop_hash_cap(spark):
    """A frame hash shared by more clips than max_df (silence /
    codec-constant frames) must be dropped-and-counted BEFORE the
    self-join — it can never create offset votes — while planted
    aligned runs on live hashes still match."""
    from file_dedup_rust_spark.operators.audio_containment import (
        audio_containment_edges,
        dropped_stop_hashes,
    )

    rows = []
    # stop hash 999 in 10 clips at idx 0 (df cap)
    for i in range(10):
        rows.append((f"s{i}", 0, 999))
    # looped-tone hash 777: only 2 clips but 30 posting rows (row cap)
    for j in range(15):
        rows.append(("loop_a", j, 777))
        rows.append(("loop_b", j, 777))
    # planted containment: u0's 5 unique frames appear in u1 at offset 3
    for j in range(5):
        rows.append(("u0", j, 1000 + j))
        rows.append(("u1", j + 3, 1000 + j))
    for j in range(5):  # u1 padding frames
        rows.append(("u1", j + 8, 2000 + j))
    frames = spark.createDataFrame(rows, "clip_id string, idx int, fhash long")

    dropped = {
        r["fhash"]
        for r in dropped_stop_hashes(frames, max_df=8, post_cap=20).collect()
    }
    assert dropped == {999, 777}
    edges = {
        (r["a"], r["b"]): r["sim"]
        for r in audio_containment_edges(
            frames, min_coverage=0.8, max_df=8, post_cap=20
        ).collect()
    }
    # the s* and loop_* clips vanish entirely (all their frames capped)
    assert edges == {("u0", "u1"): 1.0}


# ---------------------------------------------------------------------------
# compressed audio codecs (round 5): G.711 mu-law / A-law + IMA ADPCM
# ---------------------------------------------------------------------------


def _snr_db(a, b):
    import numpy as np

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    return 10 * np.log10(
        float(np.sum(a**2)) / max(float(np.sum((a - b) ** 2)), 1e-20)
    )


def test_g711_and_adpcm_roundtrip_snr():
    """Companded (8-bit G.711) and differential (4-bit IMA ADPCM)
    codecs round-trip at their textbook SNR regimes: ~37 dB for G.711
    on speech-level noise, >30 dB for ADPCM on tonal content (its
    design regime) and >12 dB on white noise (the worst case for a
    differential coder)."""
    import numpy as np

    from file_dedup_rust_spark.functions import audio as A

    rng = np.random.default_rng(0)
    sr = 16000
    noise = (rng.standard_normal(sr * 2) * 0.1).astype(np.float32)
    t = np.arange(sr * 2) / sr
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 97 * t)).astype(np.float32)

    assert _snr_db(noise, A.decode_g711(A.encode_mulaw(noise), "mulaw")) > 33
    assert _snr_db(noise, A.decode_g711(A.encode_alaw(noise), "alaw")) > 33
    assert _snr_db(noise, A.decode_wav(A.encode_wav_g711(noise, sr))) > 33
    assert _snr_db(
        noise, A.decode_wav(A.encode_wav_g711(noise, sr, "alaw"))
    ) > 33
    assert _snr_db(tone, A.decode_wav(A.encode_wav_adpcm(tone, sr))) > 30
    assert _snr_db(noise, A.decode_wav(A.encode_wav_adpcm(noise, sr))) > 12
    # raw-codec dispatch
    assert _snr_db(
        noise, A.decode_audio(A.encode_mulaw(noise), "pcm_mulaw")
    ) > 33
    assert _snr_db(
        noise, A.decode_audio(A.encode_alaw(noise), "pcm_alaw")
    ) > 33
    # G.711 decode is involutive under re-encode (quantization fixed
    # points): decode(encode(decode(b))) == decode(b) for every byte
    all_bytes = bytes(range(256))
    for law in ("mulaw", "alaw"):
        d1 = A.decode_g711(all_bytes, law)
        enc = A.encode_mulaw(d1) if law == "mulaw" else A.encode_alaw(d1)
        d2 = A.decode_g711(enc, law)
        assert float(np.max(np.abs(d1 - d2))) <= 2.0 / 32768.0, law


def test_wav_pcm16_path_bit_exact_and_new_fmts_gated():
    """The PCM16 WAV path must remain BIT-EXACT (the pcm_exact tier
    and the per-row oracle depend on it); unsupported fmt variants
    still raise (quarantine contract); stereo ADPCM rejected."""
    import struct

    import numpy as np

    from file_dedup_rust_spark.functions import audio as A

    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    d = A.decode_wav(A.encode_wav(pcm, 16000))
    i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    assert np.array_equal(d, i16.astype(np.float32) / 32768.0)

    # 8-bit PCM (fmt 1 bits 8) is still unsupported -> loud reject
    bad = bytearray(A.encode_wav(pcm, 16000))
    struct.pack_into("<H", bad, 12 + 8 + 14, 8)  # fmt chunk bits field
    with pytest.raises(ValueError, match="unsupported wav"):
        A.decode_wav(bytes(bad))
    # stereo ADPCM rejected (mono-only decoder)
    adp = bytearray(A.encode_wav_adpcm(pcm, 16000))
    struct.pack_into("<H", adp, 12 + 8 + 2, 2)  # n_channels
    with pytest.raises(ValueError, match="unsupported wav"):
        A.decode_wav(bytes(adp))


def test_cross_codec_near_dup_via_simhash(spark, cfg):
    """A clip re-encoded through G.711 or ADPCM is a NEAR-dup of its
    PCM16 original: same spectral content, different bytes — the
    signature SimHashes must land within the Hamming gate while an
    unrelated clip stays far (the codec-invariance story one tier
    below pcm_exact, which needs bit-identical samples).  The fixture
    is tonal speech-band content — ADPCM's design regime (its ~14 dB
    SNR on full-band WHITE noise is genuinely outside the 30 dB
    near-dup budget, pinned in the SNR test above, so white noise
    would be testing the codec outside its contract)."""
    import numpy as np
    import pandas as pd

    from file_dedup_rust_spark.functions import audio as A
    from file_dedup_rust_spark.functions.udfs import compute_signatures

    rng = np.random.default_rng(5)
    sr = 16000
    t = np.arange(sr * 2) / sr
    base = (
        0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 97 * t)
        + 0.01 * rng.standard_normal(sr * 2)
    ).astype(np.float32)
    other = (
        0.3 * np.sin(2 * np.pi * 633 * t) + 0.1 * np.sin(2 * np.pi * 150 * t)
        + 0.01 * rng.standard_normal(sr * 2)
    ).astype(np.float32)
    rows = [
        ("orig", A.encode_wav(base, sr), "wav"),
        ("mu", A.encode_wav_g711(base, sr, "mulaw"), "wav"),
        ("adp", A.encode_wav_adpcm(base, sr), "wav"),
        ("raw_mu", A.encode_mulaw(base), "pcm_mulaw"),
        ("unrel", A.encode_wav(other, sr), "wav"),
    ]
    pdf = pd.DataFrame(
        {
            "clip_id": [r[0] for r in rows],
            "bytes": [r[1] for r in rows],
            "sr_hz": [sr] * len(rows),
            "dur_ms": [2000] * len(rows),
            "codec": [r[2] for r in rows],
            "transcript": [""] * len(rows),
        }
    )
    clips = spark.createDataFrame(
        pdf,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = {r.clip_id: r for r in compute_signatures(clips, cfg).collect()}
    assert all(s.decode_ok for s in sigs.values())

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    for cid in ("mu", "adp", "raw_mu"):
        assert ham(sigs[cid].simhash, sigs["orig"].simhash) <= cfg.hamming_max, cid
    assert ham(sigs["unrel"].simhash, sigs["orig"].simhash) > cfg.hamming_max


# ---------------------------------------------------------------------------
# FLAC (round 5): real lossless compressed decode -> pcm_exact across
# containers
# ---------------------------------------------------------------------------


def test_flac_roundtrip_is_lossless():
    """encode_flac -> decode_flac reproduces the int16 quantization
    EXACTLY (losslessness is the whole point: it is what lets the
    pcm_exact tier see through the container)."""
    import numpy as np

    from file_dedup_rust_spark.functions import flac as FL

    rng = np.random.default_rng(0)
    sr = 16000
    for sig in (
        (rng.standard_normal(sr * 2) * 0.1).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr * 2) / sr)).astype(
            np.float32
        ),
        (rng.standard_normal(100) * 0.05).astype(np.float32),  # < 1 block
        (rng.standard_normal(sr) * 0.9).astype(np.float32),    # near-full
    ):
        i16 = np.clip(np.round(sig * 32767.0), -32768, 32767)
        want = (i16 / 32768.0).astype(np.float32)
        got = FL.decode_flac(FL.encode_flac(sig, sr))
        assert np.array_equal(got, want)


def test_flac_unknown_total_samples_decodes():
    """STREAMINFO total_samples == 0 means UNKNOWN length (spec; what
    piped/streamed encoders emit) — the decoder must decode every
    frame, not reject the stream as frameless."""
    import numpy as np

    from file_dedup_rust_spark.functions import flac as FL

    sig = (np.random.default_rng(3).standard_normal(5000) * 0.1).astype(
        np.float32
    )
    data = bytearray(FL.encode_flac(sig, 8000))
    # STREAMINFO body starts at byte 8; total_samples is the low nibble
    # of body[13] plus body[14:18]
    data[8 + 13] &= 0xF0
    data[8 + 14 : 8 + 18] = b"\x00\x00\x00\x00"
    got = FL.decode_flac(bytes(data))
    want = FL.decode_flac(FL.encode_flac(sig, 8000))
    assert np.array_equal(got, want)


def test_flac_crc_and_malformed_reject():
    import numpy as np

    from file_dedup_rust_spark.functions import flac as FL

    sig = (np.random.default_rng(1).standard_normal(5000) * 0.1).astype(
        np.float32
    )
    data = bytearray(FL.encode_flac(sig, 16000))
    with pytest.raises(ValueError):
        FL.decode_flac(b"not flac at all")
    # flip one audio byte: CRC-16 must catch it
    data[-40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(data))


def _flac_stream(frames_bits, n_total, channels=1, bits_per=16,
                 sr=16000):
    """Hand-build a FLAC stream from raw frame payload builders —
    exercises decoder paths the fixture encoder never emits."""
    import struct

    from file_dedup_rust_spark.functions import flac as FL

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", 4096, 4096)
    si += b"\x00\x00\x00" * 2
    si += bytes([
        (sr >> 12) & 0xFF, (sr >> 4) & 0xFF,
        ((sr & 0x0F) << 4) | ((channels - 1) << 1) | ((bits_per - 1) >> 4),
        (((bits_per - 1) & 0x0F) << 4) | 0,
    ])
    si += struct.pack(">I", n_total)
    si += b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
    for fb in frames_bits:
        out += fb
    return bytes(out)


def _flac_frame(fi, blocksize, ch_code, depth, write_subframes):
    """One hand-built frame: header + subframes + CRCs."""
    import struct

    from file_dedup_rust_spark.functions import flac as FL

    hdr = FL._BitW()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)            # 16-bit blocksize form
    hdr.write(0, 4)            # sr from STREAMINFO
    hdr.write(ch_code, 4)
    hdr.write(4, 3)            # 16-bit samples
    hdr.write(0, 1)
    hdr.align()
    head = bytes(hdr.buf) + FL._utf8_number(fi)
    head += struct.pack(">H", blocksize - 1)
    head += bytes([FL._crc8(head)])
    body = FL._BitW()
    write_subframes(body)
    body.align()
    frame = head + bytes(body.buf)
    return frame + struct.pack(">H", FL._crc16(frame))


def test_flac_decoder_covers_nonencoder_paths():
    """CONSTANT and VERBATIM subframes, wasted bits, LPC prediction,
    5-bit Rice method, multi-partition residuals, and all three stereo
    decorrelation modes — none of which the fixture encoder emits —
    decode correctly from hand-built conformant streams."""
    import numpy as np

    from file_dedup_rust_spark.functions import flac as FL

    bs = 16

    # --- CONSTANT + wasted bits (value 100 << 1 stored at eff-1 bits)
    def const_sub(b):
        b.write(0, 1)
        b.write(0, 6)          # CONSTANT
        b.write(1, 1)          # wasted flag
        b.write(1, 1)          # unary 0 -> wasted = 1
        b.write(100 & 0x7FFF, 15)  # eff = 16 - 1

    got = FL.decode_flac(_flac_stream(
        [_flac_frame(0, bs, 0, 16, const_sub)], bs))
    assert np.array_equal(got, np.full(bs, 200.0, dtype=np.float32) / 32768)

    # --- VERBATIM with 5-bit Rice method marker unused; plain samples
    vals = np.arange(bs, dtype=np.int64) * 3 - 20

    def verb_sub(b):
        b.write(0, 1)
        b.write(1, 6)          # VERBATIM
        b.write(0, 1)
        for v in vals:
            b.write(int(v) & 0xFFFF, 16)

    got = FL.decode_flac(_flac_stream(
        [_flac_frame(0, bs, 0, 16, verb_sub)], bs))
    assert np.array_equal(got, (vals / 32768.0).astype(np.float32))

    # --- LPC order 1, coef 1, shift 0 == repeat-previous + residuals,
    #     residuals in the 5-bit Rice method with 2 partitions
    target = np.array([7, 9, 6, 6, 8, 5, 5, 5, 9, 12, 4, 4, 0, -3, -3, 2],
                      dtype=np.int64)

    def lpc_sub(b):
        b.write(0, 1)
        b.write(32, 6)         # LPC order 1 (0b100000)
        b.write(0, 1)
        b.write(int(target[0]) & 0xFFFF, 16)  # warm-up
        b.write(3, 4)          # precision-1 -> 4 bits
        b.write(0, 5)          # shift 0
        b.write(1, 4)          # coef = 1
        res = target[1:] - target[:-1]
        b.write(1, 2)          # 5-bit Rice method
        b.write(1, 4)          # partition order 1 -> 2 partitions
        for part in (res[: bs // 2 - 1], res[bs // 2 - 1 :]):
            b.write(2, 5)      # rice param 2
            for r in part:
                u = (abs(int(r)) << 1) - (1 if r < 0 else 0)
                for _ in range(u >> 2):
                    b.write(0, 1)
                b.write(1, 1)
                b.write(u & 3, 2)

    got = FL.decode_flac(_flac_stream(
        [_flac_frame(0, bs, 0, 16, lpc_sub)], bs))
    assert np.array_equal(got, (target / 32768.0).astype(np.float32))

    # --- stereo: left/side, right/side, mid/side with CONSTANT sides
    left_v, right_v = 1000, 400

    def mk_stereo(ch_code):
        def subs(b):
            if ch_code == 8:      # left + side(left - right)
                a, bb, da, db = left_v, left_v - right_v, 16, 17
            elif ch_code == 9:    # side + right
                a, bb, da, db = left_v - right_v, right_v, 17, 16
            else:                 # mid/side
                a, bb = (left_v + right_v) >> 1, left_v - right_v
                da, db = 16, 17
            for v, d in ((a, da), (bb, db)):
                b.write(0, 1)
                b.write(0, 6)
                b.write(0, 1)
                b.write(int(v) & ((1 << d) - 1), d)
        return subs

    want = np.full(bs, (left_v + right_v) / 2.0 / 32768.0, dtype=np.float32)
    for ch_code in (8, 9, 10):
        got = FL.decode_flac(_flac_stream(
            [_flac_frame(0, bs, ch_code, 16, mk_stereo(ch_code))], bs))
        assert np.allclose(got, want, atol=1e-7), ch_code


def test_flac_container_flip_decodes_bit_identical():
    """The dedup-relevant invariant: the SAME audio shipped as wav and
    as flac decodes to the SAME float samples through decode_audio —
    the pcm_exact tier's equality, across a genuinely compressed
    container."""
    import numpy as np

    from file_dedup_rust_spark.functions import audio as A
    from file_dedup_rust_spark.functions.flac import encode_flac

    rng = np.random.default_rng(3)
    sr = 16000
    sig = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    wav_pcm = A.decode_audio(A.encode_wav(sig, sr), "wav")
    flac_pcm = A.decode_audio(encode_flac(sig, sr), "flac")
    assert np.array_equal(wav_pcm, flac_pcm)


def test_flac_roundtrip_property():
    """Property-based: any length (incl. < order, exactly one block,
    block+1), any amplitude, any seed — encode/decode is lossless."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from file_dedup_rust_spark.functions import flac as FL

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.sampled_from([1, 2, 3, 100, 4096, 4097, 9000]),
        amp=st.floats(min_value=0.001, max_value=1.2),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, amp, seed):
        rng = np.random.default_rng(seed)
        sig = (rng.standard_normal(n) * amp).astype(np.float32)
        i16 = np.clip(np.round(sig * 32767.0), -32768, 32767)
        want = (i16 / 32768.0).astype(np.float32)
        got = FL.decode_flac(FL.encode_flac(sig, 16000))
        assert np.array_equal(got, want)

    check()


def test_stereo_dual_mono_wav_downmixes_bit_exact_and_dedups(spark):
    """A dual-mono STEREO re-upload (L == R, the classic podcast /
    broadcast export flip) must decode byte-identical to the mono
    original — the channel mean of two equal int16 samples is exact in
    float32 — and therefore cluster through the pcm_exact tier, even
    though the byte hash, container, and channel count all differ."""
    import struct

    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.connected_components import (
        connected_components,
    )
    from file_dedup_rust_spark.plans.pipeline import build_edges

    x = _tone(seed=31)
    mono = A.encode_wav(x, 8000)
    i16 = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    inter = np.empty(i16.size * 2, dtype="<i2")
    inter[0::2] = i16
    inter[1::2] = i16
    body = inter.tobytes()
    stereo = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    assert np.array_equal(A.decode_audio(stereo, "wav"), A.decode_audio(mono, "wav"))

    y = _tone(seed=32, f=523.0)
    rows = [
        ("c_mono", bytearray(mono), 8000, 500, "wav", "alpha"),
        ("c_stereo", bytearray(stereo), 8000, 500, "wav", "beta"),
        ("c_other", bytearray(A.encode_wav(y, 8000)), 8000, 500, "wav", "x"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    edges = build_edges(sigs, CFG)
    kinds = {(r["a"], r["b"], r["kind"]) for r in edges.collect()}
    assert ("c_mono", "c_stereo", "pcm_exact") in kinds or (
        "c_stereo", "c_mono", "pcm_exact") in kinds, kinds
    cc = connected_components(edges.select("a", "b"), sigs.select("clip_id"))
    lbl = {r["clip_id"]: r["cluster_id"] for r in cc.collect()}
    assert lbl["c_mono"] == lbl["c_stereo"] != lbl["c_other"]


def test_polarity_inverted_wav_dedups_through_pcm_exact(spark):
    """A phase-inverted re-upload (every sample negated — balanced-
    wiring flip / inverted stem; inaudible, a true duplicate) must
    cluster through the pcm_exact tier: canonical_pcm_sha hashes the
    lexicographic min of the sample buffer and its saturating
    negation, so x and -x collapse even though bytes, sha256, and the
    raw PCM all differ."""
    from file_dedup_rust_spark.functions.udfs import (
        canonical_pcm_sha,
        compute_signatures,
    )
    from file_dedup_rust_spark.operators.connected_components import (
        connected_components,
    )
    from file_dedup_rust_spark.plans.pipeline import build_edges

    import struct

    x = _tone(seed=41)
    orig = A.encode_wav(x, 8000)
    d_o = A.decode_audio(orig, "wav")
    # negate ON THE STORED int16 GRID (a real polarity flip negates the
    # samples exactly; re-encoding floats through a different quantizer
    # grid would not)
    i16 = A.quantize_i16_canonical(d_o)
    assert int(i16.min()) > -32768  # no saturation edge in this fixture
    body = (-i16).astype("<i2").tobytes()
    inv = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * 2, 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    d_i = A.decode_audio(inv, "wav")
    assert not np.array_equal(d_o, d_i)  # raw PCM really differs
    assert canonical_pcm_sha(d_o, 8000) == canonical_pcm_sha(d_i, 8000)

    y = _tone(seed=42, f=659.0)
    rows = [
        ("p_orig", bytearray(orig), 8000, 500, "wav", "alpha"),
        ("p_inv", bytearray(inv), 8000, 500, "wav", "beta"),
        ("p_other", bytearray(A.encode_wav(y, 8000)), 8000, 500, "wav", "x"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    edges = build_edges(sigs, CFG)
    kinds = {(r["a"], r["b"], r["kind"]) for r in edges.collect()}
    assert ("p_inv", "p_orig", "pcm_exact") in kinds or (
        "p_orig", "p_inv", "pcm_exact") in kinds, kinds
    cc = connected_components(edges.select("a", "b"), sigs.select("clip_id"))
    lbl = {r["clip_id"]: r["cluster_id"] for r in cc.collect()}
    assert lbl["p_orig"] == lbl["p_inv"] != lbl["p_other"]
