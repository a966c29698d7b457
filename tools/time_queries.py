#!/usr/bin/env python
"""Time individual queries with the noop sink (guide §1.4): warm once,
then K timed runs, report min — for before/after attribution in
OPTIMIZATION_r*.md.

    python tools/time_queries.py q1 q2 ... [--sf-dir DIR] [--k 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    from file_dedup_rust_spark.entry import testdata_queries as Q
    from file_dedup_rust_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("time_queries", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = (
        "/root/testdata/sf0.001"
        if os.path.isdir("/root/testdata/sf0.001")
        else args.sf_dir
    )
    out = {}
    for name in args.names:
        fn = Q.QUERIES.get(name) or getattr(Q, f"q_{name}")
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        best = None
        for i in range(args.k):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
        print(f"{name}: {out[name]}s")
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
