#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion.  No multi-node cluster exists in this sandbox, so the same
clips-dedup job runs at local[N] and local[4N] cores on the SAME input
(subprocess-isolated JVMs) and we report throughput at both plus
efficiency = (T_4N / T_N) / 4.

    python tools/scaling_bench.py [--clips 20000] [--n 8]

Prints one JSON line; paste/record results into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from file_dedup_rust_spark.config import DEFAULT_CONFIG
from file_dedup_rust_spark.functions.udfs import compute_signatures
from file_dedup_rust_spark.operators.connected_components import connected_components
from file_dedup_rust_spark.plans.pipeline import build_edges
from file_dedup_rust_spark.session import build_session

cores = {cores}
clips_path = {clips_path!r}
spark = build_session("scaling", master=f"local[{{cores}}]",
                      shuffle_partitions=max(2 * cores, 16))
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="scale-")
clips = spark.read.parquet(clips_path)
t0 = time.monotonic()
sigs = compute_signatures(clips, DEFAULT_CONFIG)
sigs.write.mode("overwrite").parquet(f"{{work}}/sigs")
sigs = spark.read.parquet(f"{{work}}/sigs")
edges = build_edges(sigs, DEFAULT_CONFIG)
edges.write.mode("overwrite").parquet(f"{{work}}/edges")
edges = spark.read.parquet(f"{{work}}/edges")
n = connected_components(edges.select("a", "b"), sigs.select("clip_id")).count()
wall = time.monotonic() - t0
print(json.dumps({{"cores": cores, "wall_s": round(wall, 2),
                   "clips": n, "clips_per_sec": round(n / wall, 1)}}))
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def run_at(cores: int, clips_path: str) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, clips_path=clips_path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=20000)
    ap.add_argument("--n", type=int, default=8, help="small cluster size N (4N must be <= cores)")
    args = ap.parse_args()

    # generate the shared input once
    gen = tempfile.mkdtemp(prefix="scale-input-")
    clips_path = f"{gen}/clips"
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from file_dedup_rust_spark import datagen\n"
        "from file_dedup_rust_spark.session import build_session\n"
        "spark = build_session('gen', master='local[32]')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"datagen.generate_clips(spark, {args.clips}, seed=42)"
        f".write.mode('overwrite').parquet({clips_path!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True)

    small = run_at(args.n, clips_path)
    big = run_at(4 * args.n, clips_path)
    eff = round((big["clips_per_sec"] / small["clips_per_sec"]) / 4, 3)
    print(json.dumps({
        "clips": args.clips,
        "small": small,
        "big": big,
        "scaling_efficiency": eff,
        "criterion": "efficiency >= 0.8 (BASELINE.json north rule)",
        "pass": eff >= 0.8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
