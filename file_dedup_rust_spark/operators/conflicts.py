"""Same-content / conflicting-attribute detection with majority-vote
repair.

A 10^12-clip corpus assembled from multiple vendors routinely carries
the SAME recording several times with DIFFERENT transcripts (or
claimed durations, language tags, ...).  Whole-row exact dedup cannot
see this — the rows differ — and near-dup tiers would happily merge
them while silently keeping an arbitrary transcript.  The right
primitive is: group rows by a content identity, flag groups whose
attribute disagrees, and repair by majority vote (deterministic
tie-break) so downstream keeps ONE canonical attribution per content.

The reference repo has no analog (it ingests any new hash,
deduplicator.rs:61-84); the operation is standard corpus hygiene for
paired audio+transcript data (e.g. the "multiple reference
transcripts" handling in Common Voice / LibriVox-derived sets).

Scale design: two chained hash aggregations, both with map-side
partial agg — (key, val) -> count, then key -> (total, variants,
majority via min(struct(-count, val)), a declarative aggregate: no
window, no per-group sort, no Python).  One shuffle on the content
key; output is bounded by the number of CONFLICTED groups only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_conflicts(
    df: DataFrame, key_col: str, val_col: str
) -> DataFrame:
    """Rows (key, val, ...) -> one row per key whose val is not
    unanimous: (key, n_rows, n_variants, majority_val, majority_n).

    majority_val is the most frequent val; ties break to the smallest
    val (total order), so the repair is deterministic and
    partition-invariant on any engine.
    """
    g1 = df.groupBy(key_col, val_col).agg(F.count("*").alias("c"))
    g2 = g1.groupBy(key_col).agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_variants"),
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col(val_col).alias("v"))
        ).alias("m"),
    )
    return g2.filter(F.col("n_variants") >= 2).select(
        key_col,
        "n_rows",
        "n_variants",
        F.col("m.v").alias("majority_val"),
        (-F.col("m.nc")).cast("long").alias("majority_n"),
    )
