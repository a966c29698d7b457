#!/usr/bin/env python
"""Build the spark-submit distribution: dist/sparkdedup.zip with the
file_dedup_rust_spark package at the archive root, ready for

    spark-submit --py-files dist/sparkdedup.zip run_pipeline.py \
        --input <clips parquet/iceberg> --checkpoint <dir> --output <dir>

(the north rule's packaging requirement; run_pipeline.py is the driver
script and stays outside the zip).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "file_dedup_rust_spark"


def main() -> int:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "sparkdedup.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
