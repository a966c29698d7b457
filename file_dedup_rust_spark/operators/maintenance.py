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
    connected-components operator, but over their SURVIVING members
    only — cost proportional to the affected subgraph, not the corpus.

Semantics of the re-solve, per edge family:

  * EQUIVALENCE tiers (exact sha256, pcm_exact, trim_exact, and the
    sim==1.0 transcript/shingle-set stars) certify a transitive
    relation: B ≡ A ≡ C implies B ≡ C, so survivors of a hash group
    whose star HUB was removed are still duplicates of each other —
    a rebuild would re-star them directly.  When `equivalence_kinds`
    is given (and `edges` carries `kind`/`sim`), those groups are
    recovered exactly: each kind's sub-graph is solved with removed
    clips kept as CONNECTOR vertices (namespaced per kind, so
    equivalences never leak across tiers), then re-starred over the
    surviving members — matching a from-scratch pipeline rerun on the
    surviving corpus, tier for tier.
  * NEAR-DUP tiers (SimHash audio, MinHash Jaccard < 1, containment,
    speed) are NOT transitive: the only evidence linking two chain
    neighbours may be the removed clip itself, so removed-incident
    near-dup edges are dropped and chains split — exactly what a
    rebuild does (every surviving direct pair was already verified in
    its bucket and keeps its edge; modulo bucket-cap boundary effects,
    which the caps report as dropped keys in both worlds).

`tests/test_maintenance.py` pins the operator against from-scratch
solves (bridge splits, rep removal, random graphs) AND the pipeline
CLI path against a full pipeline rerun on the filtered corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.connected_components import (
    connected_components,
)

# the pipeline's transitive edge families (plans/pipeline.py
# TIER_LADDER): byte hash, decoded-PCM hash, trimmed-PCM hash, and the
# transcript tier's sim==1.0 rows (identical normalized transcript or
# identical shingle SET — set equality is itself an equivalence, so
# even the MinHash-verified jac==1.0 pairs compose transitively)
PIPELINE_EQUIVALENCE_KINDS = (
    "exact", "pcm_exact", "trim_exact", "transcript",
)

# vertex namespace separator for the per-kind connector solve; U+001F
# (unit separator) never appears in clip ids (datagen + reference both
# use printable ids) and the split below uses limit=2 so a pathological
# id containing it still round-trips
_NS = "\x1f"


def surviving_edges(edges: DataFrame, removed: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints surviving: two anti-joins against the
    removal set (removed must carry a `clip_id` column)."""
    rm = removed.select("clip_id").distinct()
    return edges.join(
        rm.select(F.col("clip_id").alias("a")), "a", "left_anti"
    ).join(rm.select(F.col("clip_id").alias("b")), "b", "left_anti")


def _recovered_equivalence_stars(
    affected_edges: DataFrame,
    removed: DataFrame,
    equivalence_kinds: tuple[str, ...],
) -> DataFrame:
    """Re-star each equivalence group over its SURVIVING members,
    keeping removed clips as connector vertices during the per-kind
    sub-solve.  One namespaced CC covers every kind at once; a star
    forest converges in a single round."""
    eq = affected_edges.filter(
        F.col("kind").isin(list(equivalence_kinds)) & (F.col("sim") >= 1.0)
    )
    if eq.isEmpty():  # nothing to recover (cheap: affected set only)
        return eq.select(F.col("a"), F.col("b")).limit(0)
    ns_a = F.concat_ws(_NS, F.col("kind"), F.col("a"))
    ns_b = F.concat_ws(_NS, F.col("kind"), F.col("b"))
    eq_edges = eq.select(ns_a.alias("a"), ns_b.alias("b"))
    eq_verts = (
        eq_edges.select(F.col("a").alias("clip_id"))
        .unionByName(eq_edges.select(F.col("b").alias("clip_id")))
        .distinct()
    )
    comp = connected_components(eq_edges, eq_verts)
    # ids may be non-string (the namespacing stringifies them); cast
    # back to the caller's edge type so the union below typechecks
    id_type = dict(affected_edges.dtypes)["a"]
    members = comp.select(
        F.split("clip_id", _NS, 2).getItem(1).cast(id_type).alias("clip_id"),
        F.col("cluster_id").alias("comp"),
    ).join(removed.select("clip_id"), "clip_id", "left_anti")
    w = Window.partitionBy("comp")
    return (
        members.withColumn("rep", F.min("clip_id").over(w))
        .filter(F.col("clip_id") != F.col("rep"))
        .select(F.col("rep").alias("a"), F.col("clip_id").alias("b"))
        .distinct()
    )


def _rederived_edges(sigs_affected_surviving: DataFrame, cfg) -> DataFrame:
    """Re-run the pipeline's OWN edge derivation over the affected
    SURVIVORS' checkpointed signatures — the exact-rebuild path, with
    zero byte re-scans (the signatures were checkpointed precisely so
    post-hoc consumers never re-decode).

    Why re-derive instead of surgically patching the old edges: the
    near-dup tiers verify between content REPRESENTATIVES (one clip
    per sha256/pcm group), so removing a rep orphans its members'
    near-dup links — the checkpointed edge set has rep(X)—Y, not X—Y,
    and no graph surgery can invent the latter.  Re-derivation lets
    each survivor's own signatures decide, exactly like a rerun.

    Restricting to affected-component survivors is lossless: member
    signatures equal their rep's on every verified feature (byte-
    identical content ⇒ identical simhash/minhash/fps), so any pair
    that verifies in a full rebuild had its rep pair verified in the
    original run — same component, hence both endpoints affected."""
    from file_dedup_rust_spark.plans.pipeline import build_edges

    return build_edges(sigs_affected_surviving, cfg).select("a", "b")


def repair_after_removal(
    assignments: DataFrame,
    edges: DataFrame,
    removed: DataFrame,
    equivalence_kinds: tuple[str, ...] | None = None,
    signatures: DataFrame | None = None,
    cfg=None,
) -> DataFrame:
    """assignments(clip_id, cluster_id) + edges(a, b[, kind, sim]) +
    removed(clip_id) -> assignments(clip_id, cluster_id) over surviving
    clips.

    Three recovery levels, strongest first:

      * `signatures` (+ `cfg`) given — the pipeline's checkpointed
        signatures table: the FULL edge derivation re-runs over the
        affected survivors (no byte decode) — exact rebuild parity for
        every tier, including cross-tier chains through a removed
        representative and near-dup links the old edges carried only
        at the rep level, which no edges-only recovery can see
        (`_rederived_edges` docstring).  This is the pipeline CLI
        path; tested equal to a full pipeline rerun on the filtered
        corpus.
      * `equivalence_kinds` given and edges carry kind/sim: per-kind
        connector solve (module docstring) — rebuild parity within
        each single equivalence kind; conservative on cross-kind
        chains (equivalences of different kinds do not compose in
        general, so those links are dropped, never invented).
      * neither: the result equals connected_components over the
        surviving edge sub-graph — the pure graph contract the driver
        oracle rebuilds recursively.

    `edges` is the verified dup-pair set the assignments were built
    from (the engine checkpoints it — plans/pipeline.py `edges` stage —
    precisely so maintenance never re-runs candidate generation).
    Plan shape: two semi/anti joins route the untouched majority
    straight to the output; the re-solve sees only affected-component
    survivors, so at a realistic delete rate the repair is orders of
    magnitude below a rebuild."""
    if "clip_id" not in removed.columns:
        raise ValueError(
            "repair_after_removal: `removed` must carry a clip_id "
            f"column (got {removed.columns})"
        )
    rm = removed.select("clip_id").distinct()
    hit_clusters = (
        assignments.join(rm, "clip_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    untouched = assignments.join(hit_clusters, "cluster_id", "left_anti")
    affected_all = assignments.join(
        hit_clusters, "cluster_id", "left_semi"
    ).select("clip_id")
    affected_verts = affected_all.join(rm, "clip_id", "left_anti")
    # both endpoints of an edge share a component, so ONE semi-join on
    # `a` restricts to affected components (removed-incident edges
    # included — the connector solve below needs them)
    affected_edges = edges.join(
        affected_all.select(F.col("clip_id").alias("a")), "a", "left_semi"
    )
    if signatures is not None:
        if cfg is None:
            raise ValueError(
                "repair_after_removal: `cfg` is required with "
                "`signatures` (the edge derivation is config-bound)"
            )
        sigs_aff = signatures.join(affected_verts, "clip_id", "left_semi")
        # surviving DIRECT edges ride along: for the default tiers they
        # are a connectivity subset of the re-derivation (harmless to
        # CC), and they preserve the opt-in tiers' surviving evidence
        # (audio-containment / speed edges are not re-derivable from
        # the signature columns alone — conservative, never invented)
        solve_edges = (
            surviving_edges(affected_edges, rm)
            .select("a", "b")
            .unionByName(_rederived_edges(sigs_aff, cfg))
        )
    else:
        solve_edges = surviving_edges(affected_edges, rm).select("a", "b")
        if equivalence_kinds and {"kind", "sim"} <= set(edges.columns):
            solve_edges = solve_edges.unionByName(
                _recovered_equivalence_stars(
                    affected_edges, rm, equivalence_kinds
                )
            )
    repaired = connected_components(solve_edges, affected_verts)
    return untouched.unionByName(repaired)
