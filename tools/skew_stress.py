#!/usr/bin/env python
"""Adversarial skew stress at scale (VERDICT r4 item 8): a >= 1.28 M
corpus with a planted hot-key set (datagen.hot_skew_clips —
boilerplate transcripts + near-silence audio, uncollapsible by any
exact tier) driven through build_edges with the posting caps ON vs
OFF, reporting per-leg wall time, MAX TASK TIME (Spark REST
taskSummary, quantile 1.0), edge counts, and the dropped-bucket
manifests.  Results land in BENCH.md.

    python tools/skew_stress.py --n 1280000 --hot 25600 \
        --graded 2048,8192 --uncapped-timeout 600

EVERY LEG RUNS IN ITS OWN SUBPROCESS JVM.  An uncapped leg at full
hot size does hot^2 in-bucket work in ONE task and is expected to
die — by job-group cancel timer, or outright (the first full-scale
run of this tool watched hot=8192 uncapped GC-thrash the whole JVM
to death).  That failure IS the result; process isolation makes the
harness survive it and keep measuring the remaining legs.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def app_id(spark) -> str:
    return spark.sparkContext.applicationId


def completed_stage_keys(spark) -> set[tuple[int, int]]:
    out = set()
    try:
        stages = rest(spark, f"applications/{app_id(spark)}/stages?status=complete")
    except Exception:
        return out  # UI gone (dying JVM): report what we can
    for s in stages:
        out.add((s["stageId"], s["attemptId"]))
    return out


def max_task_ms(spark, before: set[tuple[int, int]]) -> float:
    """Max task duration (ms) across stages completed since `before`."""
    worst = 0.0
    for sid, att in completed_stage_keys(spark) - before:
        try:
            ts = rest(
                spark,
                f"applications/{app_id(spark)}/stages/{sid}/{att}/"
                "taskSummary?quantiles=1.0",
            )
            worst = max(worst, float(ts["duration"][0]))
        except Exception:
            pass  # tiny stages can be evicted from the UI store
    return worst


def run_leg(args) -> int:
    """Child mode: one build_edges leg in a fresh JVM; prints one JSON
    line and exits.  A JVM death here kills only this leg."""
    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.operators import candidates as C
    from file_dedup_rust_spark.plans.pipeline import (
        audio_reps,
        build_edges,
        text_reps,
    )
    from file_dedup_rust_spark.session import build_session
    from pyspark.sql import functions as F

    cfg = DedupConfig()
    c = cfg if args.capped else DedupConfig(band_cap=1_000_000_000)
    spark = build_session(
        f"skew-leg-{args.leg}", master=f"local[{args.cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sigs = spark.read.parquet(f"{args.work}/sigs").filter(
        ~F.col("clip_id").startswith("hot_")
        | (F.col("clip_id") < f"hot_{args.hot_size:012d}")
    )
    before = completed_stage_keys(spark)
    sc = spark.sparkContext
    group = f"leg-{args.leg}"
    sc.setJobGroup(group, args.leg)
    cancelled = False
    timer = None
    if args.timeout:
        timer = threading.Timer(args.timeout, lambda: sc.cancelJobGroup(group))
        timer.start()
    t0 = time.monotonic()
    try:
        edges = build_edges(sigs, c)
        edges.write.mode("overwrite").parquet(f"{args.work}/edges_{args.leg}")
        n_edges = spark.read.parquet(f"{args.work}/edges_{args.leg}").count()
    except Exception:
        cancelled = True
        n_edges = None
    finally:
        if timer:
            timer.cancel()
        sc.setJobGroup("", "")
    wall = round(time.monotonic() - t0, 1)
    res = {
        "hot": args.hot_size, "capped": args.capped, "wall_s": wall,
        "cancelled": cancelled, "edges": n_edges,
        "max_task_s": round(max_task_ms(spark, before) / 1000.0, 1),
    }
    if args.capped and not cancelled:
        treps, areps = text_reps(sigs), audio_reps(sigs)
        res["dropped"] = {
            "minhash": C.dropped_buckets(
                C.explode_keys(treps, "mh_bands"), c.band_cap
            ).count(),
            "simhash": C.dropped_buckets(
                C.explode_keys(areps, "sim_keys"), c.band_cap
            ).count(),
            "winnow": C.dropped_buckets(
                C.explode_keys(treps, "fps"), c.band_cap
            ).count(),
        }
    print(json.dumps(res), flush=True)
    spark.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_280_000)
    ap.add_argument("--hot", type=int, default=25_600)
    ap.add_argument("--graded", default="2048,8192",
                    help="hot sizes for capped-vs-uncapped comparison legs")
    ap.add_argument("--uncapped-timeout", type=int, default=600,
                    help="seconds before an uncapped leg is cancelled "
                         "(job-group timer inside the leg; the parent "
                         "adds 300 s of grace, then kills the process)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # child-mode flags
    ap.add_argument("--leg", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--work", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--hot-size", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--capped", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--timeout", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.leg:
        return run_leg(args)

    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.session import build_session

    base_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="skew-", dir=base_dir)
    spark = build_session("skew-prep", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    datagen.generate_clips(spark, args.n, seed=42, partitions=256
                           ).write.mode("overwrite").parquet(f"{work}/base")
    datagen.hot_skew_clips(spark, args.hot, seed=42
                           ).write.mode("overwrite").parquet(f"{work}/hot")
    print(f"# datagen {args.n}+{args.hot}: {time.monotonic()-t0:.0f}s",
          file=sys.stderr)

    cfg = DedupConfig()
    t0 = time.monotonic()
    clips = spark.read.parquet(f"{work}/base").unionByName(
        spark.read.parquet(f"{work}/hot")
    )
    compute_signatures(clips, cfg).write.mode("overwrite").parquet(
        f"{work}/sigs"
    )
    sig_s = round(time.monotonic() - t0, 1)
    print(f"# signatures: {sig_s}s", file=sys.stderr)
    spark.stop()  # legs bring their own JVMs

    results: dict[str, dict] = {}

    def leg(label: str, h: int, capped: bool, timeout: int = 0):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--leg", label, "--work", work, "--hot-size", str(h),
            "--cpus", str(args.cpus), "--timeout", str(timeout),
        ]
        if capped:
            cmd.append("--capped")
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                timeout=(timeout + 300) if timeout else None,
            )
            out = proc.stdout.decode().strip().splitlines()
            res = json.loads(out[-1]) if out else {
                "hot": h, "capped": capped, "cancelled": True,
                "edges": None, "max_task_s": None,
                "wall_s": round(time.monotonic() - t0, 1),
                "crashed": f"exit {proc.returncode}, no result line",
            }
        except subprocess.TimeoutExpired:
            res = {
                "hot": h, "capped": capped, "cancelled": True,
                "edges": None, "max_task_s": None,
                "wall_s": round(time.monotonic() - t0, 1),
                "crashed": "parent kill after timeout+grace",
            }
        results[label] = res
        print(f"# {label}: {json.dumps(res)}", file=sys.stderr)

    graded = [int(x) for x in args.graded.split(",") if x]
    for h in graded:
        leg(f"uncapped_{h}", h, capped=False, timeout=args.uncapped_timeout)
        leg(f"capped_{h}", h, capped=True)
    leg(f"capped_{args.hot}", args.hot, capped=True)
    leg(
        f"uncapped_{args.hot}", args.hot, capped=False,
        timeout=args.uncapped_timeout,
    )

    print(json.dumps({
        "n_base": args.n, "n_hot": args.hot, "cpus": args.cpus,
        "signatures_s": sig_s, "legs": results,
    }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
