#!/usr/bin/env python
"""Stage-isolated timings for the clips_pipeline headline workload
(guide §1.4: noop-sink isolation so we time compute, not the sink).

bench.py is FROZEN for driver measurement; this file exists so the
optimization rounds can attribute the clips_pipeline seconds to its
stages (signatures / parquet roundtrip / build_edges / CC) and cite
numbers in OPTIMIZATION_r*.md.

    python bench_extra.py [n_clips]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.config import DEFAULT_CONFIG
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.operators.connected_components import (
        connected_components,
    )
    from file_dedup_rust_spark.plans.pipeline import build_edges
    from file_dedup_rust_spark.session import build_session

    spark = build_session("bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    workbase = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bx-", dir=workbase)

    clips_path = f"{work}/clips"
    datagen.generate_clips(spark, n_clips, seed=42).write.mode(
        "overwrite"
    ).parquet(clips_path)
    clips = spark.read.parquet(clips_path)

    # warm-up identical in spirit to bench.py
    compute_signatures(clips.limit(512), DEFAULT_CONFIG).write.mode(
        "overwrite"
    ).format("noop").save()

    t = {}
    for rnd in range(2):
        sc = spark.sparkContext

        sc.setJobDescription("sigs: compute+write")
        t0 = time.monotonic()
        sigs = compute_signatures(clips, DEFAULT_CONFIG)
        sigs.write.mode("overwrite").parquet(f"{work}/sigs")
        t[f"p{rnd}_sigs_write"] = round(time.monotonic() - t0, 2)

        sigs = spark.read.parquet(f"{work}/sigs")

        sc.setJobDescription("edges: build+write")
        t0 = time.monotonic()
        edges = build_edges(sigs, DEFAULT_CONFIG)
        edges.write.mode("overwrite").parquet(f"{work}/edges")
        t[f"p{rnd}_edges_write"] = round(time.monotonic() - t0, 2)

        edges = spark.read.parquet(f"{work}/edges")

        sc.setJobDescription("cc + count")
        t0 = time.monotonic()
        assignments = connected_components(
            edges.select("a", "b"), sigs.select("clip_id")
        )
        n = assignments.count()
        t[f"p{rnd}_cc_count"] = round(time.monotonic() - t0, 2)
        t[f"p{rnd}_total"] = round(
            t[f"p{rnd}_sigs_write"] + t[f"p{rnd}_edges_write"]
            + t[f"p{rnd}_cc_count"], 2
        )

    print({"n_clips": n_clips, "n_assigned": n, **t})
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
