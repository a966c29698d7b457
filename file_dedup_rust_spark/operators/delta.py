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


def snapshot_merge3(
    base: DataFrame,
    ours: DataFrame,
    theirs: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "t",
) -> DataFrame:
    """Three-way snapshot merge — the git-merge of corpus versions:
    two pipelines branch from one base snapshot (e.g. a main rebuild
    and a hotfix redaction pass) and edit independently; every id that
    either side touched is classified for the reconciler:

      take_ours   — only ours differs from base (theirs untouched)
      take_theirs — symmetric
      both_same   — both sides changed and AGREE (convergent edits,
                    including both-deleted and both-added-identical)
      conflict    — both sides changed, differently (needs a human or
                    a policy, e.g. conflict_repair's majority vote)

    Rows untouched on both sides emit nothing, so the output is
    bounded by the combined churn, not the corpus.

    Scale shape: per-side md5 fingerprints BEFORE two full-outer hash
    equi-joins on the id — only (id, 32-char) rows cross the
    exchanges, and all three sides shuffle on the same key so the
    second join reuses the first's partitioning.  Presence/absence
    and equality are null-safe (`eqNullSafe` / IS NOT DISTINCT FROM):
    a deletion is just fingerprint NULL, no special-casing."""
    b = base.select(F.col(id_col).alias("_id"), F.md5(content_col).alias("fb"))
    o = ours.select(F.col(id_col).alias("_id"), F.md5(content_col).alias("fo"))
    t = theirs.select(
        F.col(id_col).alias("_id"), F.md5(content_col).alias("ft")
    )
    j = b.join(o, "_id", "full_outer").join(t, "_id", "full_outer")
    ours_chg = ~F.col("fo").eqNullSafe(F.col("fb"))
    theirs_chg = ~F.col("ft").eqNullSafe(F.col("fb"))
    status = (
        F.when(ours_chg & ~theirs_chg, F.lit("take_ours"))
        .when(theirs_chg & ~ours_chg, F.lit("take_theirs"))
        .when(
            ours_chg & theirs_chg & F.col("fo").eqNullSafe(F.col("ft")),
            F.lit("both_same"),
        )
        .when(ours_chg & theirs_chg, F.lit("conflict"))
    )
    return (
        j.select(F.col("_id").alias(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
