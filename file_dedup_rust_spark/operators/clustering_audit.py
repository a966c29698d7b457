"""Pair-confusion agreement between two clusterings of the same
element set, computed from the contingency table — the pair counts
come from closed-form C(n,2) aggregates (the Hubert & Arabie 1985
algebra behind sklearn's pair_confusion_matrix / Rand index), so the
O(n^2) pair sets are NEVER materialized.

Why a dedup engine compares clusterings: (1) lexical (Jaccard-CC) vs
semantic (embedding-CC) agreement is the corpus-level answer to "what
does each tier buy / miss" — pairs together semantically but not
lexically are the paraphrase mass, the reverse is embedding drift;
(2) re-clustering churn between corpus versions or engine configs is
the same operator applied to old-vs-new labels.  The reference keeps
one clustering and never audits it (deduplication_service.rs:374-433
create-or-join); this is the audit it lacks.

Scale shape: one equi-join on id to align labels, one groupBy into the
contingency table (bounded by the number of co-occurring cluster-id
pairs, not by items), localCheckpoint-ed ONCE so the two upstream
CC solves never re-execute across the three downstream 1-row
aggregates.  Every pair count uses integer DIV: cluster sizes of 10^9
give C(n,2) ~ 5e17, past the 2^53 point where double division would
silently round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_confusion(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """labels_a(id, ca) x labels_b(id, cb) -> ONE row
    (n_items, pairs_a, pairs_b, pairs_both) over the ids present in
    BOTH labelings:

      pairs_a    = #unordered pairs co-clustered by A  = sum C(a_i, 2)
      pairs_b    = likewise for B                      = sum C(b_j, 2)
      pairs_both = co-clustered by A AND B             = sum C(n_ij, 2)

    Rand index, split/merge churn, and conditional agreement are all
    arithmetic on these plus C(n_items, 2)."""
    j = labels_a.join(labels_b, "id")
    cont = (
        j.groupBy("ca", "cb")
        .agg(F.count("*").alias("nij"))
        .localCheckpoint(eager=True)
    )
    both = cont.agg(
        F.sum("nij").cast("long").alias("n_items"),
        F.sum(F.expr("nij * (nij - 1) DIV 2")).cast("long").alias("pairs_both"),
    )
    pa = (
        cont.groupBy("ca")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(F.expr("ai * (ai - 1) DIV 2")).cast("long").alias("pairs_a"))
    )
    pb = (
        cont.groupBy("cb")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(F.expr("bj * (bj - 1) DIV 2")).cast("long").alias("pairs_b"))
    )
    return both.crossJoin(pa).crossJoin(pb).select(
        "n_items", "pairs_a", "pairs_b", "pairs_both"
    )
