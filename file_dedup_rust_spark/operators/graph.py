"""Triangle counting and clustering coefficients over the dup graph
(degree-oriented node-iterator — Schank & Wagner 2005's forward
algorithm, the shape every distributed triangle counter uses:
Cohen's MapReduce formulation, GraphX's TriangleCount, Suri &
Vassilvitskii 2011).

Why the dedup engine carries a graph-analytics operator at all: the
edge set the tiers emit IS a graph, and its triangle structure is the
cheapest audit of candidate quality.  A near-dup tier that is
internally consistent produces transitive evidence — if a~b and b~c
at Jaccard >= t then a~c is usually present too — so multi-member
components should be triangle-dense (local clustering coefficient
near 1).  A component that chains (high degree, near-zero triangles)
is the classic signature of threshold-hopping false merges: a ladder
a~b~c~d where the endpoints share nothing.  `triangle_summary`'s
global coefficient is the corpus-level health number; `node_triangles`
flags the individual hub whose neighbourhood does not close.

Scale shape (the part that survives 100 TB): the naive wedge count is
sum(deg^2) — catastrophic on exactly our graph, because the exact
tier emits STAR edges (one rep -> every member of a sha256 group), so
a 10k-dup group plants a deg-10k hub.  Degree orientation kills this:
every edge points from its (degree, id)-SMALLER endpoint to the
larger, wedges are generated only between OUT-neighbours, and a
theorem of Chiba & Nishizeki bounds out-degree by O(sqrt(m)) —
independent of max in-degree.  The star hub has out-degree 0 or 1 (a
leaf beats the hub on degree only at ties): the 10k-star generates
ZERO wedges instead of 5*10^7.  Everything is equi-joins the optimizer
can reorder — no UDFs, no driver collect; the wedge->edge closing join
ships (src, dst) longs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical simple-graph edge set from raw (a, b) pairs: drop
    self-loops, normalize a < b, dedupe multi-edges (a pair emitted by
    BOTH the exact and a fuzzy tier must count once)."""
    return (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def degrees(uedges: DataFrame) -> DataFrame:
    """(id, degree) over the canonical edge set."""
    ends = uedges.select(F.col("a").alias("id")).unionAll(
        uedges.select(F.col("b").alias("id"))
    )
    return ends.groupBy("id").agg(F.count("*").alias("degree"))


def triangles(uedges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """One row (x, y, z) per triangle, endpoints ordered by the
    (degree, id) total order.  Degree-oriented node-iterator:

    1. orient each edge from its (degree, id)-smaller endpoint (src)
       to the larger (dst) — an acyclic orientation with out-degree
       <= O(sqrt(m));
    2. wedges: self-join oriented edges on src, keeping the two dsts
       in (degree, id) order so each candidate triangle is generated
       exactly once, at its smallest vertex;
    3. close: a wedge (src; v, w) is a triangle iff oriented edge
       v -> w exists (v precedes w in the total order, so if the pair
       is connected the oriented edge runs v -> w, never w -> v).
    """
    if deg is None:
        deg = degrees(uedges)
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("degb"))
    ed = uedges.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("ddst"),
    )
    # the oriented edge list feeds three subtrees (both wedge sides and
    # the closing join); materialize it once so the degree join behind
    # it is not re-planned per reference (round 6 — the un-materialized
    # plan re-derived the whole upstream tier derivation 3x)
    oriented = oriented.localCheckpoint(eager=True)
    o1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddst").alias("dv"))
    o2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddst").alias("dw"))
    wedges = o1.join(o2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    return wedges.join(closing, ["v", "w"]).select(
        F.col("src").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )


def pagerank(
    uedges: DataFrame, iterations: int = 6, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected dup graph:
    (id, degree, rank) after exactly `iterations` power steps from the
    uniform vector — r'(v) = (1-d)/N + d * sum_{u~v} r(u)/deg(u).

    Why a dedup engine ranks its dup graph: min-id representative
    selection (the CC convention) is arbitrary under content quality —
    the most CENTRALLY-ATTESTED member of a cluster (highest rank) is
    the copy the most other near-identical copies corroborate, which
    is the right canonical pick when clusters mix clean originals with
    degraded/truncated variants that each match only a few siblings.
    Fixed k (not convergence-tested) keeps the result deterministic
    and engine-independent: the oracle unrolls the same k steps as
    chained SQL CTEs.

    Scale shape: the input is the REP-level dup graph (orders of
    magnitude below corpus rows — see connected_components' sizing
    note).  The adjacency (src, dst, deg(src)) is localCheckpoint-ed
    once, so the expensive tier derivation behind `uedges` never
    re-executes across iterations; each step is then one shuffle of
    the 16-byte rank vector into a map-side-combined sum — no UDFs,
    no driver state beyond the single scalar N (same convention as
    connected_components' strategy count).  Every node of an
    undirected deg>=1 graph has an in-neighbour, so there is no
    dangling mass and rank sums to exactly 1 at every step.  At
    production depth (k > ~10) re-checkpoint `ranks` every few
    iterations to truncate lineage."""
    bidir = uedges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        uedges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg_src = (
        bidir.groupBy("src").agg(F.count("*").alias("degree"))
    )
    adj = bidir.join(deg_src, "src").localCheckpoint(eager=True)
    nodes = adj.select(F.col("src").alias("id"), "degree").distinct()
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "id", "degree", F.lit(0.0).alias("rank")
        )
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            adj.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("degree")).alias("c"))
        )
        ranks = contrib.select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("c")
            ).alias("rank"),
        )
    return nodes.join(ranks, "id").select("id", "degree", "rank")


def min_hop_distance(
    uedges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """(id, hop_dist) for every node within `max_hops` of a seed —
    hop_dist 0 = seed itself.  Fixed-round BFS min-propagation over
    the undirected edge set; seeds absent from the graph still emit
    distance 0 (an isolated direct hit is still a hit).

    The dedup-engine use: blast-radius queries.  Contamination spread
    (a near-dup of a contaminated doc is itself suspect — the fuzzy-
    decontam argument, iterated), takedown propagation (everything
    within k hops of a removed clip), and audit sampling by distance
    ring.  Fixed `max_hops` (not convergence) keeps the result
    engine-independent: the oracle unrolls the same k relaxation
    rounds as chained CTEs.

    Scale shape: the symmetrized edge set is localCheckpoint-ed once
    (the tier derivation behind `uedges` never re-executes); each
    round is one equi-join frontier expansion + one map-side-combined
    min — rows bounded by the k-hop neighbourhood of the seed set,
    not the graph.  Distances are small ints; every shuffle row is
    12 bytes."""
    sym = (
        uedges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            uedges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    dist = seeds.select(
        F.col("id"), F.lit(0).cast("int").alias("hop_dist")
    ).distinct()
    for i in range(max_hops):
        stepped = dist.join(sym, dist.id == sym.src).select(
            F.col("dst").alias("id"),
            (F.col("hop_dist") + F.lit(1)).cast("int").alias("hop_dist"),
        )
        dist = (
            dist.unionAll(stepped)
            .groupBy("id")
            .agg(F.min("hop_dist").alias("hop_dist"))
        )
        # each round references the previous frontier TWICE (carry +
        # step), so an unmaterialized chain doubles the plan per hop —
        # 2^k copies of the seed subtree by hop k (round 6: the
        # eccentricity query's plan carried 114 Exchange nodes).
        # Materialize every round like connected_components does; the
        # state is (id, int) rows bounded by the k-hop neighbourhood.
        # The final round is left lazy for the caller's own plan.
        if i < max_hops - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist


def node_triangle_counts(uedges: DataFrame) -> DataFrame:
    """(id, degree, triangles) for every node with degree >= 1.  Each
    triangle credits all three endpoints (explode is 3 rows per
    triangle — bounded by 3*T, not by any degree)."""
    # deg is read by the orientation join AND the final left join; the
    # (id, degree) table is tiny relative to the edge derivation, so
    # one eager materialization beats two recomputes of the degree
    # aggregation subtree
    deg = degrees(uedges).localCheckpoint(eager=True)
    tri = triangles(uedges, deg)
    per = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return deg.join(per, "id", "left").select(
        "id",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )
