"""The north rule's packaging requirement: the pipeline ships as a
spark-submit --py-files package.  This test builds dist/sparkdedup.zip,
copies ONLY the zip + the driver script into an isolated directory, and
runs spark-submit there — so the package itself must carry the whole
engine (the repo checkout is not on any path).  Skips when no
spark-submit binary is installed (pip-only pyspark environments)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="no spark-submit binary"
)
def test_spark_submit_py_files_isolated(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True,
    )
    iso = tmp_path / "iso"
    iso.mkdir()
    shutil.copy(os.path.join(REPO, "dist", "sparkdedup.zip"), iso)
    shutil.copy(os.path.join(REPO, "run_pipeline.py"), iso)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        ["spark-submit", "--master", "local[8]",
         "--py-files", "sparkdedup.zip", "run_pipeline.py",
         "--synthetic", "1000",
         "--checkpoint", str(iso / "ck"), "--output", str(iso / "out")],
        cwd=iso, env=env, check=True, capture_output=True, text=True,
        timeout=600,
    )
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    # the pinned N=1000 seed-42 sanity counts (see .claude/skills/verify)
    assert summary["dup_clusters"] == 222
    assert summary["dup_edges"] == 389
    assert os.path.isdir(iso / "out" / "assignments")
