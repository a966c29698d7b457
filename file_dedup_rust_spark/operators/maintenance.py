"""Decremental cluster maintenance — remove clips and repair ONLY the
affected components.

The corpus-maintenance problem the reference never faces (it clusters
one upload at a time, deduplication_service.rs:374-433) but a 10^12-clip
corpus faces weekly: takedowns, license revocations, and GDPR erasure
remove rows AFTER clustering.  Deleting a clip can split its component
(the clip may be the only bridge between two near-dup families) and
invalidates the min-id label whenever the removed clip WAS the
representative — so the naive fix is a full re-cluster, days of compute
at corpus scale for a delete batch that touches a vanishing fraction of
components.

`repair_after_removal` is the incremental path:

  * components containing NO removed clip pass through verbatim — one
    hash semi-join to find the hit set, one anti-join to route around
    it; their min-id representative provably survives, so the labels
    are stable by construction;
  * components that lost a clip are re-solved with the SAME adaptive
    connected-components operator, but over their SURVIVING members and
    edges only — cost proportional to the affected subgraph, not the
    corpus.

Output is pinned equal to a from-scratch re-solve of the surviving
graph (the driver query's DuckDB oracle rebuilds recursively; the
pytest suite pins random graphs, bridge splits, and rep removals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.connected_components import (
    connected_components,
)


def repair_after_removal(
    assignments: DataFrame,
    edges: DataFrame,
    removed: DataFrame,
) -> DataFrame:
    """assignments(clip_id, cluster_id) + edges(a, b) + removed(clip_id)
    -> assignments(clip_id, cluster_id) over surviving clips, identical
    to connected_components over the surviving graph.

    `edges` is the verified dup-pair set the assignments were built
    from (the engine checkpoints it — plans/pipeline.py `edges` stage —
    precisely so maintenance never re-runs candidate generation).
    Plan shape: two semi/anti joins route the untouched majority
    straight to the output with no shuffle beyond the join itself; the
    re-solve sees only affected-component survivors, so at a realistic
    delete rate the repair is orders of magnitude below a rebuild."""
    rm = removed.select(
        F.col(removed.columns[0]).alias("clip_id")
    ).distinct()
    hit_clusters = (
        assignments.join(rm, "clip_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    untouched = assignments.join(hit_clusters, "cluster_id", "left_anti")
    affected_verts = (
        assignments.join(hit_clusters, "cluster_id", "left_semi")
        .join(rm, "clip_id", "left_anti")
        .select("clip_id")
    )
    surviving_edges = edges.select("a", "b").join(
        rm.select(F.col("clip_id").alias("a")), "a", "left_anti"
    ).join(rm.select(F.col("clip_id").alias("b")), "b", "left_anti")
    # both endpoints of an edge share a component, so ONE semi-join on
    # `a` restricts to affected components
    affected_edges = surviving_edges.join(
        affected_verts.select(F.col("clip_id").alias("a")), "a", "left_semi"
    )
    repaired = connected_components(affected_edges, affected_verts)
    return untouched.unionByName(repaired)
