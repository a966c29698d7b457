#!/usr/bin/env python
"""Streaming-surface throughput: drain a clips corpus through the
incremental near-dedup stream (sha256 + SimHash probes against the
accumulating stores, the reference's per-file worker loop done as
micro-batches — /root/reference/backend/src/worker/worker_process.rs:
50-89) and report end-to-end clips/s.

    python tools/streaming_bench.py [--clips 50000] [--drops 4]

Prints one JSON line; recorded in BENCH.md.  The reference's
architecture is >= 5 sequential network round-trips per file (a few
files/s per worker); this measures the batch engine's streaming mode
on identical dedup semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=50000)
    ap.add_argument("--drops", type=int, default=4)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.session import build_session
    from file_dedup_rust_spark.streaming.incremental import (
        incremental_near_dedup,
        read_store,
    )

    spark = build_session("stream-bench", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="sbench-", dir=base)
    landing = f"{work}/landing"
    cfg = DedupConfig()

    from pyspark.sql import functions as F

    # stage the drops up front (datagen excluded from the timed drain)
    clips = datagen.generate_clips(spark, args.clips, seed=42).persist()
    n = clips.count()
    drop_dfs = [
        clips.filter(F.pmod(F.xxhash64("clip_id"), args.drops) == i)
        for i in range(args.drops)
    ]

    t_total = 0.0
    for i, d in enumerate(drop_dfs):
        d.coalesce(4).write.mode("append").parquet(landing)
        t0 = time.monotonic()
        q = incremental_near_dedup(
            spark, landing, f"{work}/store", f"{work}/out",
            f"{work}/ck", cfg,
        )
        finished = q.awaitTermination(600)
        assert finished, "stream did not drain within 600s — throughput number would be bogus"
        t_total += time.monotonic() - t0
    clips.unpersist()

    matches = read_store(spark, f"{work}/out")
    n_matches = matches.count() if matches is not None else 0
    sigs_store = read_store(spark, f"{work}/store/sigs")
    n_sigs = sigs_store.count() if sigs_store is not None else 0
    print(json.dumps({
        "metric": "streaming_clips_per_sec",
        "value": round(n / t_total, 1),
        "unit": "clips/sec",
        "clips": n,
        "drops": args.drops,
        "drain_s": round(t_total, 2),
        "match_rows": n_matches,
        "sigs_stored": n_sigs,
        "cpus": args.cpus,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
