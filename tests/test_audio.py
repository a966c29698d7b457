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

    x = _tone(seed=21)
    y = _tone(seed=22, f=660.0)
    i16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    wav = A.encode_wav(x, 8000)
    rows = [
        ("c_wav", bytearray(wav), 8000, 500, "wav", "alpha"),
        ("c_raw", bytearray(i16.tobytes()), 8000, 500, "pcm_s16le", "beta"),
        ("c_copy", bytearray(wav), 8000, 500, "wav", "gamma"),
        ("c_other", bytearray(A.encode_wav(y, 8000)), 8000, 500, "wav", "delta"),
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
        {a, b} <= {"c_wav", "c_raw", "c_copy"} for a, b in pcm_edges
    )
    assert any(k == "exact" for _, _, k in kinds)
    cc = connected_components(
        edges.select("a", "b"), sigs.select("clip_id")
    )
    lbl = {r["clip_id"]: r["cluster_id"] for r in cc.collect()}
    assert lbl["c_wav"] == lbl["c_raw"] == lbl["c_copy"]
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
