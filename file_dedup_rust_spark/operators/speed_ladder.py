"""Speed-perturbation-tolerant audio near-dup tier (opt-in).

The perturbation every default tier misses is a small SPEED change — a
re-upload resampled 0.95-1.06x without touching the metadata (the
classic detection-dodging edit).  It breaks sha256 and pcm_exact
(different samples), the frame-fingerprint containment tier (the hop
grid shifts), and at >=3% usually the whole-clip SimHash (measured
Hamming up to 16/64 at 5% vs the <=8 verify threshold).

Method: hypothesis ladder over the PROVEN SimHash features.  One Arrow
pass decodes each clip once and emits, besides the identity signature,
one signature per grid factor g in cfg.sp_grid with the PCM
time-stretched by g first (functions.audio.resample_linear — the
deterministic engine resampler).  If clip a is a copy of b sped by r,
the hypothesis nearest r cancels the perturbation to a <=~1% residual,
where SimHash Hamming is back under sp_hamming_max (measured on >=2 s
burst-content clips: planted sped copies d <= ~8 at the best
hypothesis, unrelated pairs >= 18; candidate keys use arity-2 band
combos so the posting join's pigeonhole guarantee covers d <= 6 —
measured end-to-end recall 22/24 planted at r in [0.935, 1.065] with
zero false edges, tests/test_speed_ladder.py).  The tier targets
clips >= ~2 s: at sub-second durations the 16-segment time pooling
has 1-4 frames per segment and ANY resample jitters the features
beyond the unrelated floor — short clips should rely on the exact
ladder instead.  A constellation-landmark tier was prototyped and rejected:
scale-invariant peak-pair hashes could not separate unrelated TONAL
clips (shared harmonic geometry), while the ladder inherits the
SimHash tier's measured separation by construction.

Scale shape:
  * the hypothesis pass multiplies the FFT/feature work by
    1 + len(sp_grid) but NOT the decode or shuffle: hashes are 8
    bytes, keys ride the standard banded-posting join;
  * candidates shuffle on band-combination keys, hot buckets dropped
    by the counted sp_bucket_cap (speed_ladder_dropped_buckets);
  * verification (bit_count(xor) <= sp_hamming_max) runs INSIDE the
    posting join's codegen pass — failed candidates never reach a
    second shuffle;  output is one row per verified pair.
Asymmetric probing keeps cost linear: hypothesis rows join IDENTITY
rows only (never hypothesis x hypothesis), so relative speeds up to
the grid span are covered at (1 + S) x n posting rows, not (1 + S)^2.

Not SQL-expressible (FFT) -> pytest-gated with planted sped copies
(tests/test_speed_ladder.py), the same contract as the SimHash tier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.config import DEFAULT_CONFIG as _DEFAULTS
from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import audio as A

SPEED_SCHEMA = (
    "clip_id string, hyp int, simhash long, sim_keys array<long>, "
    "decode_ok boolean"
)


def speed_hypothesis_rows(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(clip_id, bytes, sr_hz, codec, ...) -> one row per clip per
    hypothesis: hyp=0 is the identity signature (bit-identical to the
    signature pass: same canonical-rate chain, same planes), hyp=i>=1
    the signature of the clip time-stretched by cfg.sp_grid[i-1].
    Keys use arity-2 band combinations (cfg.sp_key_arity) — the
    identity SIMHASH matches the signature pass bit-for-bit, but the
    ladder's posting keys are its own.  Clips shorter than
    cfg.sp_min_s emit NO rows (out of regime — the time pooling is
    not stretch-stable there; they stay with the default tiers).
    Decode failures quarantine with one hyp=-1 marker row."""
    import dataclasses

    planes = A.simhash_planes(cfg)
    grid = tuple(cfg.sp_grid)
    key_cfg = dataclasses.replace(cfg, sim_key_arity=cfg.sp_key_arity)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"clip_id": [], "hyp": [], "simhash": [], "sim_keys": [],
                   "decode_ok": []}
            for row in pdf.itertuples(index=False):
                data = bytes(row.bytes) if row.bytes is not None else b""
                try:
                    pcm = A.decode_audio(data, row.codec)
                except Exception:
                    out["clip_id"].append(row.clip_id)
                    out["hyp"].append(-1)
                    out["simhash"].append(0)
                    out["sim_keys"].append([])
                    out["decode_ok"].append(False)
                    continue
                c_sr = int(row.sr_hz)
                if pcm.size < cfg.sp_min_s * c_sr:
                    # out of the tier's regime (see module docstring):
                    # emit nothing — the default tiers own short clips
                    continue
                if cfg.cr_hz:
                    pcm = A.resample_linear(pcm, c_sr, cfg.cr_hz)
                    c_sr = cfg.cr_hz
                for hyp in range(len(grid) + 1):
                    if hyp == 0:
                        x = pcm
                    else:
                        g = grid[hyp - 1]
                        x = A.resample_linear(
                            pcm, c_sr, int(round(g * c_sr))
                        )
                    feats = A.spectral_features(x, c_sr, cfg)
                    sim = A.simhash64(feats, planes)
                    out["clip_id"].append(row.clip_id)
                    out["hyp"].append(hyp)
                    out["simhash"].append(sim)
                    out["sim_keys"].append(
                        A.simhash_band_keys(sim, key_cfg).tolist()
                    )
                    out["decode_ok"].append(True)
            if out["clip_id"]:
                # an all-skipped batch yields nothing: an empty
                # pandas frame has no dtype for the list column and
                # Arrow cannot infer array<long> from it
                yield pd.DataFrame(out)

    required = ("clip_id", "bytes", "sr_hz", "codec")
    missing = [c for c in required if c not in clips.columns]
    if missing:
        raise ValueError(
            f"speed_hypothesis_rows: clips table lacks columns {missing}"
        )
    # JVM prefilter on CLAIMED duration (half the real gate, so a lying
    # header cannot hide a clip from the authoritative decoded-length
    # check inside the pass): obviously-short clips skip the decode
    # entirely — on a sub-second corpus the tier then scans metadata,
    # not bytes.  Null/absent dur_ms rows fall through to the decode.
    if "dur_ms" in clips.columns:
        clips = clips.filter(
            F.col("dur_ms").isNull()
            | (F.col("dur_ms") >= int(cfg.sp_min_s * 500))
        )
    return clips.select(*required).mapInPandas(run, SPEED_SCHEMA)


def speed_edges(
    rows: DataFrame,
    cfg: DedupConfig | None = None,
    ident_rows: DataFrame | None = None,
) -> DataFrame:
    """Hypothesis table -> verified speed-pair edges
    (a, b, sim, speed_ratio), a < b: sim = 1 - best_hamming/64 over
    the matching hypotheses, speed_ratio ~= duration(b)/duration(a)
    (1.0 when the identity hypothesis matched — a plain near-dup).

    With `ident_rows` set, the HYPOTHESIS side comes from `rows` and
    the IDENTITY side from `ident_rows` — the incremental form the
    streaming probe uses (arriving batch vs accumulated store, in
    both role assignments); pairs are then strictly cross-set."""
    c = cfg if cfg is not None else _DEFAULTS

    ok = rows.filter(F.col("decode_ok"))
    ident = (ident_rows if ident_rows is not None else rows).filter(
        F.col("decode_ok") & (F.col("hyp") == 0)
    )
    post_h = ok.select(
        F.explode("sim_keys").alias("key"),
        F.col("clip_id").alias("ha"), F.col("hyp").alias("g_idx"),
        F.col("simhash").alias("sim_h"),
    )
    post_i = ident.select(
        F.explode("sim_keys").alias("key"),
        F.col("clip_id").alias("ib"), F.col("simhash").alias("sim_i"),
    )
    # hot-bucket cap on BOTH sides, counted per DISTINCT clip so the
    # threshold means the same thing for the (1+S)-rows-per-clip
    # hypothesis side as for the identity side.  Unlike the self-join
    # candidate stage there is NO n>=2 floor: an identity key with a
    # single member still pairs with other clips' HYPOTHESIS rows
    # (the join is asymmetric).
    hot_i = (
        post_i.groupBy("key").agg(F.count_distinct("ib").alias("n"))
        .filter(F.col("n") > c.sp_bucket_cap).select("key")
    )
    hot_h = (
        post_h.groupBy("key").agg(F.count_distinct("ha").alias("n"))
        .filter(F.col("n") > c.sp_bucket_cap).select("key")
    )
    hot = hot_i.unionByName(hot_h).distinct()
    post_h = post_h.join(F.broadcast(hot), "key", "left_anti")
    post_i = post_i.join(F.broadcast(hot), "key", "left_anti")
    d = F.bit_count(F.col("sim_h").bitwiseXOR(F.col("sim_i")))
    # grid ratio as a column expression (bounded CASE over hyp index)
    ratio = F.lit(1.0)
    for i, g in enumerate(c.sp_grid):
        ratio = F.when(F.col("g_idx") == i + 1, F.lit(float(g))).otherwise(
            ratio
        )
    cand = (
        post_h.join(post_i, "key")
        .filter(F.col("ha") != F.col("ib"))
        .withColumn("d", d)
        .filter(F.col("d") <= c.sp_hamming_max)
        # canonical a < b; the hypothesis side's stretch g means
        # dur(hyp_clip) * g ~= dur(identity_clip)
        .select(
            F.least("ha", "ib").alias("a"),
            F.greatest("ha", "ib").alias("b"),
            "d",
            F.round(
                F.when(F.col("ha") < F.col("ib"), ratio).otherwise(
                    1.0 / ratio
                ),
                4,
            ).alias("r_ab"),
        )
        .groupBy("a", "b")
        .agg(F.min(F.struct("d", "r_ab")).alias("m"))
    )
    return cand.select(
        "a",
        "b",
        F.round(F.lit(1.0) - F.col("m.d") / F.lit(64.0), 4).alias("sim"),
        F.col("m.r_ab").alias("speed_ratio"),
    )


def speed_ladder_dropped_buckets(
    rows: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """Hot posting buckets the cap removed (key, n) — counted, never
    silent."""
    c = cfg if cfg is not None else _DEFAULTS

    post = (
        rows.filter(F.col("decode_ok"))
        .select(F.explode("sim_keys").alias("key"), "clip_id")
    )
    return (
        post.groupBy("key").agg(F.count_distinct("clip_id").alias("n"))
        .filter(F.col("n") > c.sp_bucket_cap)
    )
