"""Snapshot delta: added / removed / changed rows between two corpus
snapshots.

The incremental half of the engine (streaming/incremental.py,
dedup_new_vs_corpus) assumes someone can SAY what is new; on an
Iceberg-style table the ground truth is the diff between two
committed snapshots.  This operator computes it content-aware: rows
present only in B are `added`, only in A `removed`, in both with a
different content fingerprint `changed` — unchanged rows emit
nothing, so the output is bounded by the churn, not the corpus.

Reference analog: the reference has no snapshot concept (every upload
mutates Postgres in place, /root/reference/backend/src/services/files.rs);
this is part of the beyond-reference training-pipeline surface
(SURVEY.md §2.10) — a nightly corpus rebuild wants `delta(yesterday,
today)` to drive incremental dedup instead of a full re-run.

Scale shape: one full-outer hash equi-join on the id column — both
sides shuffle once on id (or zero shuffles if the snapshots are
bucketed/partitioned by id, which Iceberg layouts are); the content
comparison rides the join as a fingerprint equality, so wide text
columns never need to be carried past the scan if the caller
pre-hashes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    snap_a: DataFrame,
    snap_b: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "t",
) -> DataFrame:
    """(id_col, status in {'added','removed','changed'}) for every row
    that differs between snapshot A (old) and B (new).

    Content equality is md5(content_col) — computed per side before
    the join so only a 32-char fingerprint (not the document) crosses
    the exchange."""
    a = snap_a.select(
        F.col(id_col).alias("_ida"), F.md5(content_col).alias("_fa")
    )
    b = snap_b.select(
        F.col(id_col).alias("_idb"), F.md5(content_col).alias("_fb")
    )
    j = a.join(b, a["_ida"] == b["_idb"], "full_outer")
    return (
        j.select(
            F.coalesce("_ida", "_idb").alias(id_col),
            F.when(F.col("_ida").isNull(), F.lit("added"))
            .when(F.col("_idb").isNull(), F.lit("removed"))
            .when(F.col("_fa") != F.col("_fb"), F.lit("changed"))
            .alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )
