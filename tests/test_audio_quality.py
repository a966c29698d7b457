from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A
from file_dedup_rust_spark.functions.udfs import compute_signatures
from file_dedup_rust_spark.operators.audio_quality import (
    quality_flags,
    quality_report,
)

CFG = DedupConfig()


def _tone(sr=8000, dur_s=0.5, amp=0.5, f=440.0):
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * f * t)


def test_quality_metrics_numpy():
    # digital silence
    c, s, d = A.quality_metrics(np.zeros(1000))
    assert (c, s, d) == (0.0, 1.0, 0.0)
    # full-scale square wave: every sample clipped, none silent
    sq = np.where(np.arange(1000) % 2 == 0, 32767, -32768) / 32768.0
    c, s, d = A.quality_metrics(sq)
    assert c == 1.0 and s == 0.0
    # healthy tone: nothing clipped, tiny silence at zero crossings
    c, s, d = A.quality_metrics(_tone())
    assert c == 0.0 and s < 0.05 and abs(d) < 1e-3
    # DC-biased signal
    c, s, d = A.quality_metrics(_tone(amp=0.3) + 0.1)
    assert abs(d - 0.1) < 1e-3
    # empty
    assert A.quality_metrics(np.zeros(0)) == (0.0, 1.0, 0.0)


def test_quality_gates_end_to_end(spark):
    sr = 8000
    rows = [
        ("ok", bytearray(A.encode_wav(_tone(), sr)), sr, 500, "wav", "fine clip"),
        ("silent", bytearray(A.encode_wav(np.zeros(4000), sr)), sr, 500, "wav", "s"),
        (
            "clipped",
            bytearray(
                A.encode_wav(np.clip(_tone(amp=4.0), -1.0, 32767 / 32768), sr)
            ),
            sr,
            500,
            "wav",
            "c",
        ),
        (
            "quiet",
            bytearray(A.encode_wav(_tone(amp=0.002), sr)),
            sr,
            500,
            "wav",
            "q",
        ),
        (
            "biased",
            bytearray(A.encode_wav(_tone(amp=0.3) + 0.1, sr)),
            sr,
            500,
            "wav",
            "b",
        ),
        ("broken", bytearray(b"not audio at all"), sr, 500, "wav", "x"),
        # decodes cleanly but the header CLAIMS 5 s for 0.5 s of audio
        ("mislabeled", bytearray(A.encode_wav(_tone(), sr)), sr, 5000, "wav", "m"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    flagged = quality_flags(compute_signatures(clips, CFG), CFG)
    got = {r["clip_id"]: r.asDict() for r in flagged.collect()}
    assert got["ok"]["q_pass"] and got["ok"]["flags"] == []
    assert got["silent"]["flags"] == ["silent"]
    assert "clipped" in got["clipped"]["flags"]
    assert got["quiet"]["flags"] == ["too_quiet"]
    assert got["biased"]["flags"] == ["dc_bias"]
    assert got["broken"]["flags"] == ["undecodable"]
    assert got["broken"]["clip_ratio"] is None  # quarantine, not zeroed
    assert got["mislabeled"]["flags"] == ["meta_mismatch"]

    rep = quality_report(flagged)
    assert rep["clips"] == 7 and rep["q_passed"] == 1 and rep["q_flagged"] == 6
    assert rep["flags"] == {
        "undecodable": 1,
        "silent": 1,
        "clipped": 1,
        "too_quiet": 1,
        "dc_bias": 1,
        "meta_mismatch": 1,
    }


def test_speech_rate_gate(spark):
    """Cross-modal pairing gate: words-per-second of claimed audio.
    Off by default (q_max_wps == 0); with realistic bounds a 20-word
    transcript on 0.5 s of audio (40 wps) and a 1-word transcript on
    5 s (0.2 wps) both flag, while 4 wps passes."""
    sr = 8000
    rows = [
        ("paced", bytearray(A.encode_wav(_tone(), sr)), sr, 500, "wav",
         "two words"),
        ("fast", bytearray(A.encode_wav(_tone(), sr)), sr, 500, "wav",
         " ".join(["tok"] * 20)),
        ("slow", bytearray(A.encode_wav(_tone(dur_s=5.0), sr)), sr, 5000,
         "wav", "word"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    # default config: gate disabled, everything passes
    got0 = {
        r["clip_id"]: list(r["flags"])
        for r in quality_flags(compute_signatures(clips, CFG), CFG).collect()
    }
    assert got0 == {"paced": [], "fast": [], "slow": []}
    # realistic speech bounds
    cfgr = DedupConfig(q_min_wps=0.3, q_max_wps=5.0)
    got = {
        r["clip_id"]: list(r["flags"])
        for r in quality_flags(
            compute_signatures(clips, cfgr), cfgr
        ).collect()
    }
    assert got == {
        "paced": [],
        "fast": ["speech_rate"],
        "slow": ["speech_rate"],
    }


def test_streaming_flags_bad_clips_at_ingest(spark, tmp_path):
    """A silent clip arriving via the stream is recorded in the
    quality_flags store in the SAME micro-batch, with batch-identical
    flag semantics; clean clips write nothing."""
    from file_dedup_rust_spark.streaming.incremental import (
        incremental_near_dedup,
        read_store,
    )

    sr = 8000
    rows = [
        ("s_ok", bytearray(A.encode_wav(_tone(), sr)), sr, 500, "wav",
         "a perfectly fine clip"),
        ("s_silent", bytearray(A.encode_wav(np.zeros(4000), sr)), sr, 500,
         "wav", "dead air"),
        ("s_broken", bytearray(b"xx"), sr, 500, "wav", "junk"),
    ]
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    ).coalesce(1).write.mode("append").parquet(landing)
    q = incremental_near_dedup(
        spark, landing, str(tmp_path / "store"), str(tmp_path / "out"),
        str(tmp_path / "ck"), CFG,
    )
    q.awaitTermination(180)
    flagged = {
        r["clip_id"]: list(r["flags"])
        for r in read_store(spark, str(tmp_path / "store") + "/quality_flags").collect()
    }
    assert flagged == {"s_silent": ["silent"], "s_broken": ["undecodable"]}


def test_quality_flags_plan_is_narrow(spark):
    rows = [("a", bytearray(A.encode_wav(_tone(), 8000)), 8000, 500, "wav", "t")]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    plan = (
        quality_flags(sigs, CFG)._jdf.queryExecution().executedPlan().toString()
    )
    # flagging adds no shuffle and no further Python stage beyond the
    # signature pass itself
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") <= 1


def test_transcript_conflicts_majority_repair(spark):
    """Same decoded audio under DIFFERENT containers/transcripts: the
    conflict keys on the codec-invariant pcm_sha, so a container flip
    cannot hide a transcription disagreement; majority wins, ties go
    to the lexicographically smallest transcript; unanimous and
    undecodable rows never appear."""
    from file_dedup_rust_spark.operators.audio_quality import (
        transcript_conflicts,
    )

    sr = 8000
    tone = _tone()
    other = _tone(f=880.0)
    wav = bytearray(A.encode_wav(tone, sr))
    rows = [
        # 3-way group: two vendors agree, one dissents -> majority
        ("a1", wav, sr, 500, "wav", "the cat sat"),
        ("a2", wav, sr, 500, "wav", "the cat sat"),
        ("a3", wav, sr, 500, "wav", "the cap sat"),
        # 2-way tie (one of them a container flip of the same PCM):
        # deterministic smallest-transcript repair
        ("b1", bytearray(A.encode_wav(other, sr)), sr, 500, "wav", "zebra"),
        (
            "b2",
            bytearray(
                np.clip(np.round(other * 32767), -32768, 32767)
                .astype("<i2").tobytes()
            ),
            sr,
            500,
            "pcm_s16le",
            "apple",
        ),
        # unanimous pair: not a conflict
        ("c1", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500, "wav", "same"),
        ("c2", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500, "wav", "same"),
        # undecodable: excluded entirely
        ("d1", bytearray(b"junk"), sr, 500, "wav", "ghost"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    out = transcript_conflicts(sigs).collect()
    assert len(out) == 2
    by_n = {r["n_rows"]: r.asDict() for r in out}
    maj = by_n[3]
    assert maj["n_variants"] == 2 and maj["majority_n"] == 2
    assert maj["majority_val"] == "the cat sat"
    tie = by_n[2]
    assert tie["n_variants"] == 2 and tie["majority_n"] == 1
    assert tie["majority_val"] == "apple"


def test_reread_groups_same_text_different_audio(spark):
    """The converse audit: identical normalized transcripts over
    DISTINCT recordings form a re-read group with diversity metrics;
    same-audio copies (even container-flipped) do NOT count as a
    second recording, and undecodable / empty-transcript rows are
    excluded."""
    from file_dedup_rust_spark.operators.audio_quality import reread_groups

    sr = 8000
    t440 = _tone()
    t880 = _tone(f=880.0)
    wav440 = bytearray(A.encode_wav(t440, sr))
    rows = [
        # re-read group: same text, three clips but only TWO distinct
        # recordings (r2 is a container flip of r1 — same pcm_sha)
        ("r1", wav440, sr, 500, "wav", "hello world"),
        (
            "r2",
            bytearray(
                np.clip(np.round(t440 * 32767), -32768, 32767)
                .astype("<i2").tobytes()
            ),
            sr,
            500,
            "pcm_s16le",
            "hello world",
        ),
        ("r3", bytearray(A.encode_wav(t880, sr)), sr, 500, "wav", "hello world"),
        # single-recording text: byte-identical pair, never a re-read
        ("s1", wav440, sr, 500, "wav", "single take"),
        ("s2", wav440, sr, 500, "wav", "single take"),
        # undecodable: excluded
        ("d1", bytearray(b"junk"), sr, 500, "wav", "hello world"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    out = reread_groups(compute_signatures(clips, CFG)).collect()
    assert len(out) == 1
    g = out[0].asDict()
    assert g["n_clips"] == 3
    assert g["n_recordings"] == 2
    # different tones -> spectral SimHash bits vary; flips don't add
    assert 0 < g["bit_spread"] <= 64
    assert g["rms_spread"] >= 0.0


def test_streaming_transcript_conflicts_at_ingest(spark, tmp_path):
    """Batch 1 stores a clip; batch 2 re-uploads the SAME audio under a
    flipped container with a DIFFERENT transcript -> the conflict is
    recorded at ingest (cross-corpus), and a within-batch conflicting
    pair is caught in its own micro-batch.  Agreeing re-uploads and
    distinct audio write nothing."""
    from file_dedup_rust_spark.streaming.incremental import (
        incremental_near_dedup,
        read_store,
    )

    sr = 8000
    tone = _tone()
    raw = bytearray(
        np.clip(np.round(tone * 32767), -32768, 32767).astype("<i2").tobytes()
    )
    landing = str(tmp_path / "landing")
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )

    def arrive(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        q = incremental_near_dedup(
            spark, landing, str(tmp_path / "store"), str(tmp_path / "out"),
            str(tmp_path / "ck"), CFG,
        )
        q.awaitTermination(180)

    arrive([
        ("v1", bytearray(A.encode_wav(tone, sr)), sr, 500, "wav", "hello world"),
        ("u1", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500, "wav", "other"),
        # within-batch conflicting pair on a third recording
        ("w1", bytearray(A.encode_wav(_tone(f=770.0), sr)), sr, 500, "wav", "alpha"),
        ("w2", bytearray(A.encode_wav(_tone(f=770.0), sr)), sr, 500, "wav", "beta"),
    ])
    arrive([
        # container flip of v1's audio, conflicting transcript
        ("v2", raw, sr, 500, "pcm_s16le", "hello word"),
        # agreeing re-upload of u1: NOT a conflict
        ("u2", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500, "wav", "other"),
    ])
    got = {
        (r["clip_id"], r["matched_clip_id"])
        for r in read_store(
            spark, str(tmp_path / "store") + "/transcript_conflicts"
        ).collect()
    }
    assert got == {("w2", "w1"), ("v2", "v1")}


def test_transcript_consensus_medoid_repair(spark):
    """The medoid variant (pipeline --repair medoid): with a 3-variant
    no-majority group {t, one-word-changed, two-words-changed}, the
    CENTRAL transcript wins even though majority voting would fall to
    its arbitrary-smallest tie-break."""
    from file_dedup_rust_spark.operators.audio_quality import (
        transcript_consensus,
    )

    sr = 8000
    tone = _tone()
    wav = bytearray(A.encode_wav(tone, sr))
    rows = [
        ("a1", wav, sr, 500, "wav", "the cat sat on a mat"),
        ("a2", wav, sr, 500, "wav", "the cap sat on a mat"),
        ("a3", wav, sr, 500, "wav", "the cap sat on a hat"),
        # unanimous pair: never repaired
        ("c1", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500,
         "wav", "same"),
        ("c2", bytearray(A.encode_wav(_tone(f=660.0), sr)), sr, 500,
         "wav", "same"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    sigs = compute_signatures(clips, CFG)
    out = transcript_consensus(sigs).collect()
    assert len(out) == 1
    r = out[0]
    # middle variant is central: one char to either end (cost 1+1=2)
    # vs 1+2=3 for the ends — majority voting would have tie-broken
    # to the lexicographically smallest instead
    assert r["n_rows"] == 3 and r["n_variants"] == 3
    assert r["medoid_val"] == "the cap sat on a mat"
    assert r["medoid_cost"] == 2


def test_select_survivors_policies(spark):
    """'first' keeps min clip_id per cluster (the reference's
    insertion-order rule); 'best' keeps the decodable, least-clipped,
    loudest recording regardless of id order; singletons survive
    untouched under both."""
    from file_dedup_rust_spark.operators.audio_quality import (
        select_survivors,
    )

    assignments = spark.createDataFrame(
        [("a1", 1), ("a2", 1), ("a3", 1), ("b1", 2), ("b2", 2), ("s1", 3)],
        "clip_id string, cluster_id long",
    )
    # a1: clipped copy; a2: clean + loud (the best); a3: undecodable
    # b1: quieter than b2
    sig = spark.createDataFrame(
        [
            ("a1", True, 0.2, 0.0, 0.0, 0.30),
            ("a2", True, 0.0, 0.0, 0.0, 0.25),
            ("a3", False, None, None, None, None),
            ("b1", True, 0.0, 0.1, 0.0, 0.10),
            ("b2", True, 0.0, 0.1, 0.0, 0.20),
            ("s1", True, 0.0, 0.9, 0.0, 0.01),
        ],
        "clip_id string, decode_ok boolean, clip_ratio double, "
        "silence_ratio double, dc_offset double, pcm_rms double",
    )
    first = {
        r["cluster_id"]: (r["clip_id"], r["n_members"])
        for r in select_survivors(assignments, policy="first").collect()
    }
    assert first == {1: ("a1", 3), 2: ("b1", 2), 3: ("s1", 1)}
    best = {
        r["cluster_id"]: (r["clip_id"], r["n_members"])
        for r in select_survivors(assignments, sig, policy="best").collect()
    }
    assert best == {1: ("a2", 3), 2: ("b2", 2), 3: ("s1", 1)}


def test_loop_flags_detect_tiled_unit_not_noise(spark):
    """A clip tiling one hop-aligned noise unit 8x is flagged at
    exactly the unit's frame period; an equally long non-repeating
    noise clip and a too-short clip emit nothing."""
    from file_dedup_rust_spark.operators.audio_containment import (
        clip_frames,
    )
    from file_dedup_rust_spark.operators.audio_quality import loop_flags

    rng = np.random.RandomState(9)
    unit = rng.uniform(-0.5, 0.5, CFG.hop * 16)  # 4096 samples, hop-aligned
    looped = np.tile(unit, 8)
    noise = rng.uniform(-0.5, 0.5, looped.size)
    rows = [
        ("loop", bytearray(A.encode_wav(looped, 8000)), 8000, 4096, "wav", "x"),
        ("noise", bytearray(A.encode_wav(noise, 8000)), 8000, 4096, "wav", "y"),
        ("short", bytearray(A.encode_wav(unit[:1024], 8000)), 8000, 128, "wav", "z"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    got = {
        r["clip_id"]: (r["period"], r["agree_frac"])
        for r in loop_flags(clip_frames(clips, CFG)).collect()
    }
    assert set(got) == {"loop"}, got
    assert got["loop"][0] == 16
    assert got["loop"][1] >= 0.95
