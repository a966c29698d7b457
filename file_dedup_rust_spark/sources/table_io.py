"""Checkpointed table IO with a manifest — the batch replacement for
the reference's job ledger + status fan-out (jobs table,
/root/reference/backend/src/migrations/0003_jobs_table.sql; Redis
status keys, backend/src/worker/job_queue.rs:80-126).

Production target is an Iceberg catalog (`format('iceberg')`,
`writeTo(...).createOrReplace()`); this sandbox has no Iceberg runtime
jar, so TableIO transparently falls back to partitioned Parquet
directories with the same *semantics*:

  * atomic commit — data lands in a staging dir, is renamed into
    place, and only then does the manifest entry appear (a stage is
    committed iff its manifest row exists);
  * resume — a stage whose manifest entry is committed *and* carries
    the current DedupConfig fingerprint is skipped and read back;
  * lineage + metrics — every entry records parent stages, row count
    and wall time (the A8 per-stage metrics of SURVEY.md section 2.4).

Switching to Iceberg is a constructor argument, not a code change
(SURVEY.md section 7.3 item 5).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageResult:
    name: str
    row_count: int
    wall_s: float
    skipped: bool  # True when resumed from an existing checkpoint


class TableIO:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: str = "parquet",
        iceberg_catalog: str | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.fmt = fmt
        self.iceberg_catalog = iceberg_catalog
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)

    # ---- manifest ----
    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, "_manifest", f"{name}.json")

    def manifest_entry(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_committed(self, name: str, fingerprint: str) -> bool:
        e = self.manifest_entry(name)
        return bool(e and e.get("status") == "committed" and e.get("fingerprint") == fingerprint)

    def manifest_listing(self, limit: int = 100, offset: int = 0) -> list[dict]:
        """Stage-ledger listing — the GET /jobs analog (reference
        jobs.rs:29-51: ORDER BY created_at DESC LIMIT $ OFFSET $, cap
        100).  Returns manifest entries newest-first."""
        d = os.path.join(self.root, "_manifest")
        entries = []
        for fn in os.listdir(d):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    entries.append(json.load(f))
        entries.sort(
            key=lambda e: (-e.get("committed_at", 0.0), e.get("stage", ""))
        )
        limit = min(limit, 100)
        return entries[offset : offset + limit]

    def delete_stage(self, name: str) -> bool:
        """Remove a stage's data AND its manifest entry — the DELETE
        /jobs/{id} analog (jobs.rs:123-166: delete row + associated
        artifacts).  Manifest entry goes first so a crash mid-delete
        leaves an uncommitted (re-runnable) stage, never a committed
        entry pointing at missing data.  Returns False if the stage
        does not exist (the reference's 404)."""
        entry = self.manifest_entry(name)
        data = self._table_path(name)
        if entry is None and not os.path.exists(data):
            return False
        mp = self._manifest_path(name)
        if os.path.exists(mp):
            os.remove(mp)
        if os.path.exists(data):
            shutil.rmtree(data)
        return True

    # ---- data ----
    def _table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.format("iceberg").load(
                f"{self.iceberg_catalog}.{name}"
            )
        return self.spark.read.parquet(self._table_path(name))

    def write(
        self,
        name: str,
        df: DataFrame,
        fingerprint: str,
        parents: list[str] | None = None,
        partition_by: list[str] | None = None,
        extra: dict | None = None,
    ) -> StageResult:
        t0 = time.monotonic()
        if self.iceberg_catalog:
            w = df.writeTo(f"{self.iceberg_catalog}.{name}")
            w.createOrReplace()
            n = self.read(name).count()
        else:
            staging = os.path.join(self.root, f".staging-{name}-{uuid.uuid4().hex[:8]}")
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(staging)
            final = self._table_path(name)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(staging, final)
            n = self.spark.read.parquet(final).count()
            sizes, n_bytes = [], 0
            for dp, _, fns in os.walk(final):
                for fn in fns:
                    sz = os.path.getsize(os.path.join(dp, fn))
                    n_bytes += sz
                    if fn.endswith(".parquet"):
                        sizes.append(sz)
        wall = time.monotonic() - t0
        entry = {
            "stage": name,
            "status": "committed",
            "fingerprint": fingerprint,
            "row_count": n,
            "parents": parents or [],
            "wall_s": round(wall, 3),
            "committed_at": time.time(),
        }
        if not self.iceberg_catalog:
            entry["bytes"] = n_bytes
            # per-partition (output-file) skew metrics: a stage whose
            # max file dwarfs its mean had a hot key upstream — visible
            # in lineage without re-reading the table
            entry["n_files"] = len(sizes)
            entry["max_file_bytes"] = max(sizes) if sizes else 0
        if extra:
            entry.update(extra)
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1)
        os.replace(tmp, self._manifest_path(name))
        return StageResult(name, n, wall, skipped=False)

    def stage(
        self,
        name: str,
        fingerprint: str,
        build,
        parents: list[str] | None = None,
        resume: bool = True,
        partition_by: list[str] | None = None,
    ) -> tuple[DataFrame, StageResult]:
        """Run-or-resume one stage.  `build()` returns the DataFrame to
        checkpoint; when committed under the same fingerprint the build
        is skipped and the checkpoint read back (kill -> rerun resumes
        mid-pipeline)."""
        if resume and self.is_committed(name, fingerprint):
            e = self.manifest_entry(name) or {}
            return self.read(name), StageResult(
                name, int(e.get("row_count", -1)), 0.0, skipped=True
            )
        df = build()
        res = self.write(
            name, df, fingerprint, parents=parents, partition_by=partition_by
        )
        return self.read(name), res
