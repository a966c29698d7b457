"""Audio quality gates over the signature table.

The audio analog of the Gopher text filters (operators/repetition.py):
before training, drop clips that are digital silence, hard-clipped,
too quiet, DC-biased, or undecodable.  The reference repo ingests any
file whose hash is new (deduplicator.rs:61-84) and has no quality
stage; a 10^12-clip training pipeline cannot afford to embed garbage.

Scale design.  The raw metrics (clip_ratio, silence_ratio, dc_offset,
pcm_rms) are computed inside the ONE Arrow decode pass that already
produces every other signature (functions/udfs.py:signature_batch) —
this module never touches bytes.  Flagging is pure JVM expressions
over the signatures table: a narrow projection, zero shuffle, zero
Python.  The report aggregation is one partial-agg groupBy over a
handful of flag strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.config import DedupConfig

QUALITY_FLAG_NAMES = (
    "undecodable", "silent", "clipped", "too_quiet", "dc_bias",
    "meta_mismatch", "speech_rate", "band_limited",
)


def quality_flags(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (clip_id, rms_dbfs, clip_ratio, silence_ratio,
    dc_offset, flags array<string>, q_pass boolean).

    A clip passes iff it decodes and trips no gate.  Undecodable rows
    (decode_ok = false, metric columns null) flag as `undecodable`
    only — the quarantine convention, never a job failure."""
    rms_dbfs = F.round(
        F.lit(20.0) * F.log10(F.greatest(F.col("pcm_rms"), F.lit(1e-10))), 4
    )
    gates = [
        (F.lit("undecodable"), ~F.col("decode_ok")),
        (
            F.lit("silent"),
            F.col("decode_ok") & (F.col("silence_ratio") >= cfg.q_silence_max),
        ),
        (
            F.lit("clipped"),
            F.col("decode_ok") & (F.col("clip_ratio") >= cfg.q_clip_max),
        ),
        (
            F.lit("too_quiet"),
            F.col("decode_ok")
            & (F.col("silence_ratio") < cfg.q_silence_max)
            & (rms_dbfs < cfg.q_min_rms_dbfs),
        ),
        (
            F.lit("dc_bias"),
            F.col("decode_ok")
            & (F.abs(F.col("dc_offset")) > cfg.q_max_dc_offset),
        ),
        (
            # claimed metadata vs decoded reality: a container whose
            # header length disagrees with its payload is corrupt (or
            # mislabeled) even when every sample decodes cleanly
            F.lit("meta_mismatch"),
            F.col("decode_ok")
            & (
                F.abs(
                    F.col("n_samples") * 1000.0
                    / F.greatest(F.col("sr_hz"), F.lit(1))
                    - F.col("dur_ms")
                )
                > cfg.q_meta_tol_ms
            ),
        ),
        (
            # cross-modal pairing gate: transcript words per second of
            # claimed audio.  Disabled when q_max_wps == 0 — the
            # F.lit(False) constant-folds the whole branch out of the
            # plan, so the default config pays nothing.
            F.lit("speech_rate"),
            F.lit(cfg.q_max_wps > 0)
            & F.col("decode_ok")
            & (F.col("t_len") > 0)
            & F.col("dur_ms").isNotNull()
            & (F.col("dur_ms") > 0)
            & (
                (
                    F.size(F.split(F.col("t_norm"), " "))
                    * 1000.0
                    / F.col("dur_ms")
                    < cfg.q_min_wps
                )
                | (
                    F.size(F.split(F.col("t_norm"), " "))
                    * 1000.0
                    / F.col("dur_ms")
                    > cfg.q_max_wps
                )
            ),
        ),
        (
            # band-limit / upsample-fraud gate: the clip's spectral
            # rolloff (95%-energy bandwidth as a fraction of Nyquist,
            # computed in the same decode pass) sits far below what
            # its container rate claims — 8 kHz content shipped in a
            # 44.1 kHz wrapper.  Disabled when q_min_rolloff == 0 (the
            # default; narrow-band content at native rate is
            # legitimate) — the F.lit(False) constant-folds the
            # branch out of the plan.
            F.lit("band_limited"),
            F.lit(cfg.q_min_rolloff > 0)
            & F.col("decode_ok")
            & F.col("rolloff").isNotNull()
            & (F.col("rolloff") < cfg.q_min_rolloff),
        ),
    ]
    flags = F.filter(
        F.array(*[F.when(cond, name).otherwise(F.lit(None)) for name, cond in gates]),
        lambda x: x.isNotNull(),
    )
    return signatures.select(
        "clip_id",
        rms_dbfs.alias("rms_dbfs"),
        "clip_ratio",
        "silence_ratio",
        "dc_offset",
        flags.alias("flags"),
        (F.size(flags) == 0).alias("q_pass"),
    )


def transcript_conflicts(signatures: DataFrame) -> DataFrame:
    """Clips whose decoded audio is byte-identical (same codec-invariant
    pcm_sha — the container-flip-proof identity) but whose NORMALIZED
    transcripts disagree: the multi-vendor transcription defect.  One
    row per conflicted recording with the majority-vote transcript
    (ties to the lexicographically smallest) as the repair
    (operators/conflicts.py; zero extra decode — pcm_sha and t_norm
    both ride the existing signature pass).

    Columns: pcm_sha, n_rows, n_variants, majority_val (the repaired
    transcript), majority_n."""
    from file_dedup_rust_spark.operators.conflicts import value_conflicts

    base = signatures.filter(
        F.col("decode_ok") & (F.col("pcm_sha") != "")
    ).select("pcm_sha", "t_norm")
    return value_conflicts(base, "pcm_sha", "t_norm")


def reread_groups(signatures: DataFrame) -> DataFrame:
    """The CONVERSE of transcript_conflicts: clips whose normalized
    transcript is identical but whose decoded audio differs (distinct
    codec-invariant pcm_sha) — multiple recordings ("re-reads") of one
    text.  The pipeline's exact-transcript tier deliberately stars
    these into one cluster (a re-read adds no new text); this report
    quantifies the ACOUSTIC diversity that choice collapses, so a
    TTS/multi-speaker corpus owner can decide to keep the tier off —
    or mine re-read groups as speaker-variation training pairs.

    Per group (only groups with >1 distinct recording):
      t_key          xxhash64 of the normalized transcript (8-byte
                     groupBy key; the text itself never shuffles)
      n_clips        rows sharing the transcript
      n_recordings   distinct decoded-audio identities (pcm_sha)
      bit_spread     count of VARYING spectral-SimHash bits across the
                     group (bit_count(bit_or ^ bit_and), 0..64) — an
                     upper bound on pairwise Hamming distance and a
                     shuffle-free acoustic-diversity proxy (exact max
                     pairwise distance would need the pair explode the
                     in-bucket verify tier reserves for candidates)
      rms_spread     max - min of per-clip RMS (level diversity)

    Zero extra decode — every input rides the signature pass; one
    hash-keyed groupBy, all aggregates map-side-combining."""
    base = signatures.filter(
        F.col("decode_ok") & (F.col("pcm_sha") != "") & (F.col("t_norm") != "")
    ).select("t_norm", "pcm_sha", "simhash", "pcm_rms")
    return (
        base.groupBy(F.xxhash64("t_norm").alias("t_key"))
        .agg(
            F.count("*").alias("n_clips"),
            F.count_distinct("pcm_sha").alias("n_recordings"),
            F.bit_count(
                F.bit_or("simhash").bitwiseXOR(F.bit_and("simhash"))
            ).alias("bit_spread"),
            F.round(F.max("pcm_rms") - F.min("pcm_rms"), 6).alias(
                "rms_spread"
            ),
        )
        .filter(F.col("n_recordings") > 1)
    )


def transcript_consensus(
    signatures: DataFrame, variant_cap: int = 64
) -> DataFrame:
    """The conflict groups of `transcript_conflicts` repaired by the
    MEDOID transcript instead of the majority: the variant minimizing
    the multiplicity-weighted sum of edit distances to the rest
    (operators.conflicts.medoid_repair — ROVER-style voting).  Right
    when vendors ship three one-word-apart transcripts and no
    majority exists; groups with more than variant_cap variants are
    excluded and surfaced via conflicts.oversize_groups.

    Columns: pcm_sha, n_rows, n_variants, medoid_val (the repaired
    transcript), medoid_cost."""
    from file_dedup_rust_spark.operators.conflicts import medoid_repair

    base = signatures.filter(
        F.col("decode_ok") & (F.col("pcm_sha") != "")
    ).select("pcm_sha", "t_norm")
    return medoid_repair(base, "pcm_sha", "t_norm", variant_cap)


def quality_report(flagged: DataFrame) -> dict:
    """Aggregate gate counts for the pipeline summary JSON: total,
    passed, and clips per flag (a clip tripping two gates counts in
    both).  One groupBy over exploded flag names — tiny output."""
    total = flagged.count()
    passed = flagged.filter("q_pass").count()
    per_flag = {
        r["flag"]: r["n"]
        for r in (
            flagged.select(F.explode("flags").alias("flag"))
            .groupBy("flag")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    return {
        "clips": total,
        "q_passed": passed,
        "q_flagged": total - passed,
        "flags": {k: per_flag.get(k, 0) for k in QUALITY_FLAG_NAMES if k in per_flag},
    }


def select_survivors(
    assignments: DataFrame,
    signatures: DataFrame | None = None,
    policy: str = "first",
) -> DataFrame:
    """Retention policy over the final cluster assignments: ONE kept
    clip per cluster — the deduped corpus a training run actually
    reads.  The audio analog of the keep-best-copy text rule
    (entry q_cluster_best_rep); the reference keeps whichever upload
    arrived first (insertion order,
    /root/reference/backend/src/worker/deduplication_service.rs:383-414)
    — policy 'first' reproduces that deterministically by min clip_id.

    policy 'best' keeps the highest-quality RECORDING per cluster using
    the decode-pass metrics already in the signatures table (zero
    extra decode): decodable first, then least clipped, least silent,
    least DC-biased, loudest, min clip_id tiebreak.

    Scale shape: 'first' is one min_by groupBy on cluster_id (single
    shuffle); 'best' adds one hash equi-join of assignments against
    signatures on clip_id.  min(struct(...)) keeps the whole ordering
    inside a map-side-combining aggregate — no window over clusters,
    so a mega-cluster costs no single task.  Returns
    (cluster_id, clip_id, n_members).
    """
    if policy == "first":
        key = F.struct(F.col("clip_id"))
        rows = assignments
    elif policy == "best":
        if signatures is None:
            raise ValueError("policy 'best' needs the signatures table")
        rows = assignments.join(
            signatures.select(
                "clip_id", "decode_ok", "clip_ratio", "silence_ratio",
                "dc_offset", "pcm_rms",
            ),
            "clip_id",
        )
        key = F.struct(
            F.when(F.col("decode_ok"), F.lit(0)).otherwise(1).alias("bad"),
            F.coalesce("clip_ratio", F.lit(1.0)).alias("clipped"),
            F.coalesce("silence_ratio", F.lit(1.0)).alias("silent"),
            F.abs(F.coalesce("dc_offset", F.lit(1.0))).alias("dc"),
            (-F.coalesce("pcm_rms", F.lit(0.0))).alias("neg_rms"),
            F.col("clip_id"),
        )
    else:
        raise ValueError(f"unknown retention policy: {policy}")
    return (
        rows.groupBy("cluster_id")
        .agg(
            F.min(key.alias("k")).alias("k"),
            F.count("*").cast("int").alias("n_members"),
        )
        .select("cluster_id", F.col("k.clip_id").alias("clip_id"), "n_members")
    )


LOOP_MIN_AGREE = 0.9   # fraction of frame hashes matching at the period
LOOP_MIN_FRAMES = 16   # don't call sub-2s-ish clips loops


def loop_flags(
    frames: DataFrame,
    min_agree: float = LOOP_MIN_AGREE,
    min_frames: int = LOOP_MIN_FRAMES,
) -> DataFrame:
    """Detect LOOPED clips — the same unit tiled end-to-end (stuck
    buffers, beep tracks, loader music): a real corpus pathology no
    dedup tier sees because each looped FILE is unique bytes.

    Input is the containment tiers' frame table (clip_id, idx, fhash,
    decode_ok) — zero extra decode when the fused pass is on.  A clip
    is flagged when some period p in [1, n/2] has >= min_agree of
    frame hashes satisfying h[i] == h[i-p]; the smallest such p is
    reported (p == 1 ~ constant audio, a held tone).  Loops only
    register when the unit is hop-aligned (cfg.hop samples) — the
    fingerprint frames must tile with the loop; foreign-aligned loops
    are SimHash-self-similar but not exact here, documented.

    Scale shape: one applyInPandas over clip_id groups — per-clip
    frame counts are bounded by max_decode_seconds * sr / hop (~500),
    so the per-task numpy sweep is O(n^2/2) ~ 1e5 ops worst case.
    Returns (clip_id, n_frames, period, agree_frac) for flagged clips
    only — clean traffic emits nothing."""
    import pandas as pd

    def per_clip(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf[pdf["decode_ok"]].sort_values("idx")
        h = pdf["fhash"].to_numpy()
        n = h.size
        if n < min_frames:
            return pd.DataFrame(
                columns=["clip_id", "n_frames", "period", "agree_frac"]
            )
        for p in range(1, n // 2 + 1):
            agree = float(np.mean(h[p:] == h[:-p]))
            if agree >= min_agree:
                return pd.DataFrame(
                    {
                        "clip_id": [pdf["clip_id"].iloc[0]],
                        "n_frames": [int(n)],
                        "period": [int(p)],
                        "agree_frac": [round(agree, 4)],
                    }
                )
        return pd.DataFrame(
            columns=["clip_id", "n_frames", "period", "agree_frac"]
        )

    return frames.groupBy("clip_id").applyInPandas(
        per_clip,
        "clip_id string, n_frames int, period int, agree_frac double",
    )
