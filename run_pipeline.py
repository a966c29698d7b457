#!/usr/bin/env python
"""CLI entry: run the end-to-end dedup pipeline.

    spark-submit --py-files <pkg.zip> run_pipeline.py \
        --input /path/to/clips_parquet --checkpoint /path/ckpt --output /path/out

or, for a self-contained synthetic run (datagen -> dedup):

    python run_pipeline.py --synthetic 5000 --checkpoint /tmp/ckpt --output /tmp/out

Prints one JSON summary line (stages, row counts, throughput) to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser(description="PySpark near-dup detection + clustering")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir/file with the clips table")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="generate N deterministic synthetic clips instead")
    p.add_argument("--checkpoint", required=True, help="checkpoint/manifest dir")
    p.add_argument("--output", help="write assignments/clusters parquet here")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--no-resume", action="store_true", help="ignore existing checkpoints")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--band-cap", type=int, default=None)
    p.add_argument("--quality-report", action="store_true",
                   help="add audio quality-gate counts (silent / "
                        "clipped / too-quiet / dc-bias / undecodable / "
                        "meta-mismatch) "
                        "to the summary; metrics ride the signature "
                        "decode pass, no extra bytes scan")
    p.add_argument("--tier-report", action="store_true",
                   help="add per-tier edge counts + cheapest-tier "
                        "marginal pair attribution to the summary")
    p.add_argument("--audio-containment", action="store_true",
                   help="enable the sub-clip audio containment tier "
                        "(frame fingerprints ride the single decode "
                        "pass; extra cost is the posting join)")
    p.add_argument("--ac-min-coverage", type=float, default=None,
                   help="containment: matched fraction of the "
                        "sub-clip's live frames (default cfg)")
    p.add_argument("--ac-max-df", type=int, default=None,
                   help="containment: drop frame hashes in more "
                        "clips than this (stop-hash cap)")
    p.add_argument("--ac-min-matches", type=int, default=None,
                   help="containment: absolute vote floor per offset")
    p.add_argument("--ac-post-cap", type=int, default=None,
                   help="containment: drop hashes with more posting "
                        "rows than this")
    p.add_argument("--repair", choices=("majority", "medoid"), default=None,
                   help="repair same-audio/different-transcript "
                        "conflicts: 'majority' = most frequent "
                        "transcript per decoded-PCM identity, "
                        "'medoid' = edit-distance consensus (ROVER-"
                        "style; wins when no majority exists). Adds "
                        "conflict counts to the summary and writes "
                        "<output>/repaired_transcripts when --output "
                        "is set; rides the signature pass, no extra "
                        "decode")
    p.add_argument("--speed-ladder", action="store_true",
                   help="enable the speed-perturbation TIER: clips "
                        "re-uploaded resampled 0.95-1.05x (metadata "
                        "unchanged) gain audio_speed edges and "
                        "CO-CLUSTER with their originals; intended "
                        "for clips >= ~2 s (operators/speed_ladder; "
                        "shorter clips emit nothing). Checkpointed "
                        "as its own sp_edges stage; costs one extra "
                        "bytes pass with 1+|grid| feature "
                        "extractions")
    p.add_argument("--decontam-clips", default=None, metavar="PATH",
                   help="audio benchmark decontamination: parquet of "
                        "eval clips (clip_id, bytes, sr_hz, codec[, "
                        "transcript]); corpus clips whose AUDIO "
                        "matches or overlaps an eval clip (codec-"
                        "invariant exact hash, or sub-clip frame "
                        "vote in either direction) are counted in "
                        "the summary and written to "
                        "<output>/audio_decontam when --output is "
                        "set; with --audio-containment the corpus "
                        "frames come from the signature checkpoint "
                        "(no second decode), otherwise one extra "
                        "frame pass runs over the corpus bytes")
    p.add_argument("--holdout-pm", type=int, default=None, metavar="PM",
                   help="emit a leakage-safe train/held-out split "
                        "column on the assignments output: PM per "
                        "mille of dup CLUSTERS (not clips) go to "
                        "held_out, decided by the cluster rep's Knuth "
                        "bucket so no near-duplicate pair straddles "
                        "the boundary")
    p.add_argument("--canonical-rate", type=int, default=None, dest="cr_hz",
                   metavar="HZ",
                   help="resample decoded audio to this rate before the "
                        "exact pcm hash / SimHash features / frame "
                        "fingerprints, enabling cross-sample-rate dedup "
                        "(default: off, native-rate semantics)")
    p.add_argument("--trim-silence", type=float, default=None,
                   dest="trim_eps", metavar="EPS", nargs="?",
                   const=1e-3,
                   help="enable the silence-padding-invariant exact "
                        "tier: hash the canonical PCM with leading/"
                        "trailing samples below EPS (default 1e-3 ~ "
                        "-60 dBFS) stripped, so padded re-uploads "
                        "dedup; interior silence is kept (default: "
                        "off)")
    p.add_argument("--segment", type=float, nargs=2, default=None,
                   metavar=("WIN_S", "STRIDE_S"),
                   help="segment long-form audio into WIN_S-second "
                        "windows at STRIDE_S-second stride BEFORE "
                        "dedup (snap-to-end final window; one "
                        "mapInPandas bytes pass, zero shuffle); dedup "
                        "then runs at segment granularity — "
                        "cross-upload overlap collapses via pcm_exact "
                        "because segments re-quantize canonically")
    p.add_argument("--retain", choices=("first", "best"), default=None,
                   help="emit the deduped corpus: ONE kept clip per "
                        "cluster to <output>/survivors ('first' = min "
                        "clip_id, the reference's insertion-order "
                        "rule; 'best' = highest-quality recording by "
                        "the decode-pass metrics — no extra decode)")
    p.add_argument("--cdc-report", action="store_true",
                   help="add a chunk-store savings report (Gear "
                        "content-defined chunking over the raw clip "
                        "bytes, operators/cdc.py): how many bytes a "
                        "block-level store would keep after sub-file "
                        "dedup; one extra mapInPandas bytes scan, "
                        "opt-in")
    p.add_argument("--remove", default=None, metavar="PATH",
                   help="decremental maintenance: parquet of clip_ids "
                        "to delete from an already-clustered corpus "
                        "(takedown/GDPR path). Repairs ONLY the "
                        "components that lost a member — untouched "
                        "assignments pass through verbatim, and with "
                        "an intact --checkpoint every pipeline stage "
                        "resumes, so the whole operation costs the "
                        "repair, not a re-cluster. Writes "
                        "<output>/assignments_after_remove and "
                        "<output>/clusters_after_remove when --output "
                        "is set; adds a 'maintenance' summary block")
    args = p.parse_args()

    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.session import build_session
    from file_dedup_rust_spark.plans.pipeline import run_pipeline, tier_report
    from file_dedup_rust_spark import datagen

    overrides = {
        k: getattr(args, k)
        for k in ("band_cap", "ac_min_coverage", "ac_max_df",
                  "ac_min_matches", "ac_post_cap", "cr_hz", "trim_eps")
        if getattr(args, k) is not None
    }
    if args.segment is not None:
        overrides["seg_win_s"], overrides["seg_stride_s"] = args.segment
    cfg = DedupConfig(seed=args.seed, **overrides)
    spark = build_session("dedup-pipeline", master=args.master)
    t0 = time.monotonic()
    if args.synthetic:
        clips = datagen.generate_clips(spark, args.synthetic, seed=args.seed)
        # seed is in cfg; N identifies the deterministic corpus
        input_token = f"synthetic:{args.synthetic}"
    else:
        clips = spark.read.parquet(args.input)
        # path + row count (parquet metadata only — no data scan):
        # catches both a different source and in-place appends; a
        # same-path same-count content swap is out of scope (use
        # --no-resume)
        import os as _os

        import pyarrow.dataset as _ds

        n_in = _ds.dataset(args.input, format="parquet").count_rows()
        input_token = f"input:{_os.path.abspath(args.input)}:{n_in}"

    res = run_pipeline(
        spark, clips, cfg, args.checkpoint, resume=not args.no_resume,
        audio_containment=args.audio_containment,
        speed_ladder=args.speed_ladder,
        input_token=input_token,
    )
    n_clips = res.assignments.count()
    n_clusters = res.clusters.count()
    n_edges = res.edges.count()
    assignments = res.assignments
    split_counts = None
    if args.holdout_pm is not None:
        from pyspark.sql import functions as F

        from file_dedup_rust_spark.functions.sampling import group_safe_split

        assignments = group_safe_split(
            res.assignments, "clip_id", "cluster_id", args.holdout_pm
        ).drop("group_rep")
        split_counts = {
            r["split"]: r["n"]
            for r in assignments.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    repair_summary = None
    if args.repair:
        from pyspark.sql import functions as F

        from file_dedup_rust_spark.operators.audio_quality import (
            transcript_conflicts,
            transcript_consensus,
        )

        rep = (
            transcript_conflicts(res.signatures)
            if args.repair == "majority"
            else transcript_consensus(res.signatures)
        ).persist()
        repair_summary = {
            "mode": args.repair,
            "conflicted_recordings": rep.count(),
            "rows_affected": rep.agg(
                F.coalesce(F.sum("n_rows"), F.lit(0))
            ).collect()[0][0],
        }
        if args.output:
            rep.write.mode("overwrite").parquet(
                f"{args.output}/repaired_transcripts"
            )
        rep.unpersist()
    speed_summary = None
    if args.speed_ladder:
        from pyspark.sql import functions as F

        sp = res.edges.filter(F.col("kind") == "audio_speed")
        speed_summary = {
            "edges": sp.count(),
            "dropped_buckets": next(
                (s.row_count for s in res.stages
                 if s.name == "sp_dropped_buckets"), 0),
        }
        if args.output:
            sp.write.mode("overwrite").parquet(f"{args.output}/speed_edges")
    decontam_summary = None
    if args.decontam_clips:
        from pyspark.sql import functions as F

        from file_dedup_rust_spark.functions.udfs import compute_signatures
        from file_dedup_rust_spark.operators.audio_containment import (
            audio_decontam_hits,
            clip_frames,
            frames_from_signatures,
        )

        if "frame_fps" in res.signatures.columns:
            co_frames = frames_from_signatures(res.signatures)
        else:
            co_frames = clip_frames(clips, cfg)
        co_pcm = res.signatures.select("clip_id", "pcm_sha")
        ev_sigs = compute_signatures(
            spark.read.parquet(args.decontam_clips), cfg, with_frames=True
        ).persist()
        hits = audio_decontam_hits(
            co_frames,
            co_pcm,
            frames_from_signatures(ev_sigs),
            ev_sigs.select("clip_id", "pcm_sha"),
            cfg=cfg,
        ).persist()
        decontam_summary = {
            "flagged_clips": hits.select("clip_id").distinct().count(),
            "by_kind": {
                r["kind"]: r["n"]
                for r in hits.groupBy("kind")
                .agg(F.count("*").alias("n"))
                .collect()
            },
        }
        if args.output:
            hits.write.mode("overwrite").parquet(
                f"{args.output}/audio_decontam"
            )
        hits.unpersist()
        ev_sigs.unpersist()
    maintenance_summary = None
    if args.remove:
        from pyspark.sql import functions as F

        from file_dedup_rust_spark.operators.connected_components import (
            cluster_summary,
        )
        from file_dedup_rust_spark.operators.maintenance import (
            repair_after_removal,
            surviving_edges,
        )

        rm = (
            spark.read.parquet(args.remove)
            .select(F.col("clip_id").cast("string"))
            .distinct()
            .persist()
        )
        repaired = repair_after_removal(
            res.assignments, res.edges, rm,
            signatures=res.signatures, cfg=cfg,
        ).persist()
        clusters_after = cluster_summary(
            repaired, surviving_edges(res.edges, rm)
        ).persist()
        maintenance_summary = {
            "removed_requested": rm.count(),
            "survivors": repaired.count(),
            "dup_clusters_after": clusters_after.count(),
        }
        if args.output:
            repaired.write.mode("overwrite").parquet(
                f"{args.output}/assignments_after_remove"
            )
            clusters_after.write.mode("overwrite").parquet(
                f"{args.output}/clusters_after_remove"
            )
        clusters_after.unpersist()
        repaired.unpersist()
        rm.unpersist()
    if args.output:
        assignments.write.mode("overwrite").parquet(f"{args.output}/assignments")
        res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    wall = time.monotonic() - t0
    summary = {
        "clips": n_clips,
        "dup_clusters": n_clusters,
        "dup_edges": n_edges,
        "wall_s": round(wall, 2),
        "clips_per_sec": round(n_clips / wall, 1),
        "stages": [
            {"name": s.name, "rows": s.row_count, "wall_s": round(s.wall_s, 2),
             "resumed": s.skipped}
            for s in res.stages
        ],
    }
    if split_counts is not None:
        summary["split"] = split_counts
    if maintenance_summary is not None:
        summary["maintenance"] = maintenance_summary
    if decontam_summary is not None:
        summary["audio_decontam"] = decontam_summary
    if speed_summary is not None:
        summary["speed_ladder"] = speed_summary
    if repair_summary is not None:
        summary["transcript_repair"] = repair_summary
    if cfg.seg_win_s:
        # the signatures stage rows ARE the segment count (incl.
        # quarantine rows) — no extra decode pass just for the summary
        summary["segments"] = next(
            s.row_count for s in res.stages if s.name == "signatures"
        )
    if args.tier_report:
        summary["tiers"] = tier_report(res.edges)
    if args.cdc_report:
        from file_dedup_rust_spark.operators.cdc import cdc_chunks, cdc_savings

        summary["cdc"] = cdc_savings(cdc_chunks(clips)).collect()[0].asDict()
    if args.retain:
        from file_dedup_rust_spark.operators.audio_quality import (
            select_survivors,
        )

        surv = select_survivors(
            res.assignments, res.signatures, policy=args.retain
        )
        if args.holdout_pm is not None:
            # carry the leakage-safe split onto the survivors table —
            # group_safe_split assigns per CLUSTER, so the survivor
            # inherits its cluster's split unambiguously
            surv = surv.join(
                assignments.select("cluster_id", "split").distinct(),
                "cluster_id",
            )
        if args.output:
            surv.write.mode("overwrite").parquet(f"{args.output}/survivors")
            surv = spark.read.parquet(f"{args.output}/survivors")
        n_surv = surv.count()
        summary["retention"] = {
            "policy": args.retain,
            "survivors": n_surv,
            "removed": n_clips - n_surv,
        }
    if args.quality_report:
        from file_dedup_rust_spark.operators.audio_quality import (
            quality_flags,
            quality_report,
            reread_groups,
            transcript_conflicts,
        )

        summary["quality"] = quality_report(quality_flags(res.signatures, cfg))
        summary["quality"]["transcript_conflicts"] = (
            transcript_conflicts(res.signatures).count()
        )
        summary["quality"]["reread_groups"] = (
            reread_groups(res.signatures).count()
        )
        if "frame_fps" in res.signatures.columns:
            # looped-clip gate rides the fused frame pass for free
            # (only present when the sub-clip tier decoded frames)
            from file_dedup_rust_spark.operators.audio_containment import (
                frames_from_signatures,
            )
            from file_dedup_rust_spark.operators.audio_quality import (
                loop_flags,
            )

            summary["quality"]["looped_clips"] = loop_flags(
                frames_from_signatures(res.signatures)
            ).count()
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
