"""Connected components via iterative min-label propagation.

The reference assigns clusters incrementally and order-dependently —
`update_file_clusters` joins the FIRST similar file's cluster and never
merges two existing clusters (/root/reference/backend/src/worker/
deduplication_service.rs:374-433; see SURVEY.md section 2.8).  The
batch engine computes the order-insensitive transitive closure, which
is the documented *intent* (duplicate groups) and what recall is
measured on (co-membership pairs, not cluster ids).

Algorithm: label <- min(label, min over neighbours' labels) until
fixpoint.  Each iteration is two hash joins + a groupBy; lineage is
truncated per iteration with localCheckpoint (Catalyst cannot express
iteration — SURVEY.md section 4 item 2).  Converges in O(max component
diameter) rounds; dup clusters are near-cliques/stars, so 2-5 rounds
in practice.  Convergence is detected with a cheap label-checksum
aggregate (one action, no extra join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    max_iter: int = 50,
    driver_threshold: int = 5_000_000,
    coded_threshold: int = 50_000_000,
) -> DataFrame:
    """edges(a, b) + vertices(clip_id) -> assignments(clip_id, cluster_id).

    cluster_id = min clip_id of the component (stable representative —
    deterministic across runs and cluster sizes).  Every vertex gets a
    label; singletons are their own cluster of size 1 (the reference's
    `cluster_id NULL` state, migrations/0002_file_cluster.sql:10).

    Adaptive physical strategy (three tiers, all emitting IDENTICAL
    labels): the edge set here is *verified dup pairs between content
    representatives* — orders of magnitude smaller than the input
    table (a corpus with 30% dup rate at 10^12 rows still yields
    rep-graph edges in the 10^8-10^9 range, and at bench scales mere
    millions).
      * <= `driver_threshold` edges: one Arrow collect of the string
        ids + the numpy fixpoint solve (zero extra shuffles — the
        right plan when the collect is tens of MB);
      * <= `coded_threshold`: string ids are factorized to int64 codes
        IN SPARK (distinct + monotonically_increasing_id, two
        broadcast-or-shuffle equi-joins), the driver collects 16 B/edge
        of int64 instead of ~180 B/edge of Python str objects, runs
        the same numpy solve, and min(clip_id)-per-component is
        recovered with one distributed groupBy — the encode/decode
        joins scale with the cluster while the collect stays ~16 MB
        per 10^6 edges;
      * above that: distributed min-label propagation with pointer
        jumping (O(log diameter) rounds) — the only tier whose state
        never touches the driver.

    Sizing the thresholds: toPandas of string clip_ids materializes
    Python str objects (~150-200 B per edge for two ~20-char ids, NOT
    the ~50 B Arrow wire size), so the 5M default caps the string
    tier at ~1 GB of driver object heap.  The coded tier holds two
    int64 numpy columns plus a factorize hash table (~50 B/edge peak),
    so 50M caps it at ~2.5 GB — raise it on drivers with bigger heaps.
    Measured at 6.16M edges (1.28M-clip corpus): the coded tier runs
    ~36 s at local[8] / ~54 s at local[2] where the distributed tier
    took 263 s / 579 s on the same edge set — just past the
    string-tier threshold the distributed iterations are all fixed
    overhead (driver-actioned rounds over a graph whose numpy solve
    takes under a second).

    The incoming `edges` plan is persisted before the strategy count so
    the count action and the solve (collect or iterate) share one
    computation of the (often expensive — LSH join + verify) edge
    derivation instead of running it twice."""
    edges = edges.persist()
    try:
        n_edges = edges.count()
        if n_edges <= driver_threshold:
            return _driver_cc(edges, vertices)
        if n_edges <= coded_threshold:
            return _coded_driver_cc(edges, vertices)
        return _distributed_cc(edges, vertices, max_iter)
    finally:
        # all paths have materialized what they need from `edges`
        # (driver: the Arrow collect; coded: the encode-join collect;
        # distributed: the localCheckpoint of the symmetrized edge
        # set) before returning, so the cache can be dropped eagerly
        # without recompute risk.
        edges.unpersist()


def _driver_cc(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Vectorized min-label solve on the driver (small verified-edge
    sets): one Arrow collect, then numpy edge-relaxation + pointer
    jumping (label <- label[label]) to a fixpoint.

    Two scatter-free tricks keep every pass a SIMD gather (profiled at
    1.7 M edges: 9.8 s -> ~1.5 s vs the previous np.unique +
    np.minimum.at formulation, whose unbuffered scalar scatter and
    object-string sort dominated):
      * ids are hash-factorized (pd.factorize, no 3.4 M-string sort),
        then remapped through ONE argsort of the ~distinct ids so that
        smaller code == lexicographically-smaller clip_id — the index
        minimum of a component is then its min clip_id, identical to
        the distributed path;
      * the per-iteration scatter-min (label[i] <- min over incident
        edges) becomes gather -> reorder by a PRE-sorted edge-endpoint
        permutation -> np.minimum.reduceat per endpoint group -> one
        sliced assignment.  The permutation never changes across
        iterations, so it is computed once."""
    import numpy as np
    import pandas as pd

    spark = vertices.sparkSession
    pdf = edges.select("a", "b").toPandas()
    if len(pdf) == 0:
        return vertices.select(
            "clip_id", F.col("clip_id").alias("cluster_id")
        )
    both = pd.concat([pdf["a"], pdf["b"]], ignore_index=True)
    raw_codes, uniques_unsorted = pd.factorize(both, sort=False)
    uniques_unsorted = np.asarray(uniques_unsorted)
    sort_order = np.argsort(uniques_unsorted, kind="stable")
    uniques = uniques_unsorted[sort_order]
    rank = np.empty(len(sort_order), dtype=np.int64)
    rank[sort_order] = np.arange(len(sort_order))
    codes = rank[raw_codes]  # code order == clip_id sort order
    m = len(pdf)
    label = _numpy_cc_fixpoint(codes[:m], codes[m:], len(uniques))
    labels = spark.createDataFrame(
        pd.DataFrame({"clip_id": uniques, "label": uniques[label]})
    )
    return vertices.join(labels, "clip_id", "left").select(
        "clip_id", F.coalesce("label", F.col("clip_id")).alias("cluster_id")
    )


def _numpy_cc_fixpoint(ea, eb, n_vertices: int):
    """Dense-coded edge list -> component label array (index minimum
    per component).  Scatter-free: the per-iteration scatter-min is a
    gather -> PRE-sorted permutation reorder -> np.minimum.reduceat
    -> one sliced assignment; the permutation is computed once."""
    import numpy as np

    endpoints = np.concatenate([ea, eb])
    perm = np.argsort(endpoints, kind="stable")
    sorted_endpoints = endpoints[perm]
    seg_starts = np.flatnonzero(
        np.diff(sorted_endpoints, prepend=np.int64(-1))
    )
    seg_targets = sorted_endpoints[seg_starts]

    label = np.arange(n_vertices)
    while True:
        old = label.copy()
        lo = np.minimum(label[ea], label[eb])
        vals = np.concatenate([lo, lo])[perm]
        seg_min = np.minimum.reduceat(vals, seg_starts)
        label[seg_targets] = np.minimum(label[seg_targets], seg_min)
        label = np.minimum(label, label[label])  # pointer jumping
        if np.array_equal(label, old):
            break
    return label


def _coded_driver_cc(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Middle tier: the numpy solve over int64-CODED edges.

    Just past the string-collect threshold the distributed iterations
    are pure overhead — the graph still solves in under a second of
    numpy — but collecting tens of millions of Python str objects
    would hold multi-GB of driver heap.  So the factorization moves
    INTO Spark: vertex ids get unique int64 codes (distinct +
    monotonically_increasing_id, lineage frozen with an eager
    localCheckpoint because that expression is non-deterministic
    across recomputes), the edge list is coded with two equi-joins,
    and the driver collects two int64 columns (16 B/edge over Arrow).
    The min-clip_id-per-component label is recovered DISTRIBUTED
    (groupBy(root).min(id) + one join), so no step materializes
    strings on the driver and the encode/decode work scales with the
    cluster."""
    import numpy as np
    import pandas as pd

    spark = vertices.sparkSession
    ids = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("code", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    enc = (
        edges.select("a", "b")
        .join(ids.select(F.col("id").alias("a"), F.col("code").alias("ca")), "a")
        .join(ids.select(F.col("id").alias("b"), F.col("code").alias("cb")), "b")
        .select("ca", "cb")
    )
    pdf = enc.toPandas()
    if len(pdf) == 0:
        return vertices.select(
            "clip_id", F.col("clip_id").alias("cluster_id")
        )
    both = np.concatenate(
        [pdf["ca"].to_numpy(np.int64), pdf["cb"].to_numpy(np.int64)]
    )
    codes, uniq = pd.factorize(both, sort=False)  # int64 hash, no sort
    m = len(pdf)
    label = _numpy_cc_fixpoint(codes[:m], codes[m:], len(uniq))
    lab_df = spark.createDataFrame(
        pd.DataFrame({"code": uniq, "root": uniq[label]})
    )
    labeled = ids.join(lab_df, "code").select("id", "root")
    mins = labeled.groupBy("root").agg(F.min("id").alias("cluster_id"))
    asg = (
        labeled.join(mins, "root")
        .select(F.col("id").alias("clip_id"), "cluster_id")
    )
    return vertices.join(asg, "clip_id", "left").select(
        "clip_id",
        F.coalesce("cluster_id", F.col("clip_id")).alias("cluster_id"),
    )


def _distributed_cc(
    edges: DataFrame, vertices: DataFrame, max_iter: int
) -> DataFrame:
    und = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    und = und.localCheckpoint(eager=True)

    # iterate ONLY over edge-incident vertices: singletons (the vast
    # majority of a deduped corpus) keep label == id by definition and
    # are attached after the fixpoint — the iterated state is the dup
    # subgraph, not the whole table
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    def checksum(lbl: DataFrame) -> tuple[int, int]:
        # modular sum keeps ANSI mode (Spark 4 default) overflow-free
        row = lbl.agg(
            F.sum(
                F.pmod(
                    F.xxhash64(F.concat_ws("\x1f", "id", "label")),
                    F.lit(1_000_000_007),
                )
            ).alias("c"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (int(row["c"] or 0), int(row["n"]))

    prev = checksum(labels)
    for _ in range(max_iter):
        msgs = (
            und.join(labels, und.dst == labels.id)
            .select(F.col("src").alias("id"), "label")
        )
        relaxed = (
            labels.select("id", "label")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: label <- label[label].  Every label value is
        # itself an edge-incident vertex id, so the self-join resolves
        # it to that vertex's (smaller-or-equal) label — convergence in
        # O(log diameter) rounds instead of O(diameter), which is what
        # separates chains of near-dups (long diameters) from stars.
        j = relaxed.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        new_labels = (
            relaxed.join(j, relaxed.label == j.jid, "left")
            .select("id", F.coalesce("jlabel", "label").alias("label"))
        ).localCheckpoint(eager=False)
        # the checksum action materializes the lazy checkpoint — one
        # Spark job per iteration instead of two
        cur = checksum(new_labels)
        labels = new_labels
        if cur == prev:
            break
        prev = cur

    return vertices.join(
        labels.withColumnRenamed("id", "clip_id"), "clip_id", "left"
    ).select(
        "clip_id",
        F.coalesce("label", F.col("clip_id")).alias("cluster_id"),
    )


def cluster_summary(assignments: DataFrame, edges: DataFrame) -> DataFrame:
    """clusters(cluster_id, size, intra_similarity_score).

    intra_similarity_score = avg(sim) over the component's verified
    edges — strictly better than the reference's hardcoded 0.9
    (deduplication_service.rs:407-414).  Only multi-member clusters
    are emitted (a singleton is the reference's NULL cluster)."""
    sizes = (
        assignments.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .filter(F.col("size") > 1)
    )
    a_lbl = assignments.select(
        F.col("clip_id").alias("a"), F.col("cluster_id")
    )
    edge_sims = (
        edges.join(a_lbl, "a")
        .groupBy("cluster_id")
        .agg(F.avg("sim").alias("intra_similarity_score"))
    )
    return sizes.join(edge_sims, "cluster_id", "left").select(
        "cluster_id",
        "size",
        F.coalesce("intra_similarity_score", F.lit(1.0)).alias(
            "intra_similarity_score"
        ),
    )
