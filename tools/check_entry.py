#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf0.01, compare row count, column names, and an order-insensitive
value hash (floats normalized to 9 significant decimals).

    python tools/check_entry.py [--sf-dir /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from file_dedup_rust_spark.session import build_session

    spark = build_session("check_entry", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    names = args.only or list(qs)
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, "
                  f"{time.monotonic()-t0:.1f}s) — no oracle")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        sc = [c.lower() for c in scols]
        problems = []
        if sorted(sc) != sorted(dcols):
            problems.append(f"cols spark={sc} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            hs = value_hash(srows, sc)
            hd = value_hash(drows, dcols)
            if hs != hd:
                problems.append(f"value-hash {hs} != {hd}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # show a few differing rows to debug
            sset = {tuple(map(norm_cell, r)) for r in srows}
            dset = {tuple(map(norm_cell, r)) for r in drows}
            for r in list(sset - dset)[:3]:
                print(f"      spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"      duck-only:  {r}")
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.monotonic()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
