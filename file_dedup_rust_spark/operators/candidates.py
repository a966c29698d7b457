"""LSH candidate-pair generation with hot-bucket skew handling.

Replaces the reference's OpenSearch k-NN index probe
(/root/reference/backend/src/worker/deduplication_service.rs:300-372,
HNSW ef_search=100) with explicit band posting lists: explode the
banded signature into (key, clip_id) rows, then self-equi-join on key.

Skew (SURVEY.md section 4 item 1): a stop-band (all-silence clips, a
boilerplate transcript) creates a posting list of size m -> m^2 pairs.
Buckets larger than cfg.band_cap are dropped *and counted* — never
silently; the numpy oracle applies the identical rule so recall
accounting stays exact.  AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_minhash_bands(docs_with_t: DataFrame, cfg, n: int = 3) -> DataFrame:
    """(doc_id, t) -> (doc_id, mh_bands array<long>) MinHash band
    signatures over the word-n-gram shingle set.

    The word-gram analog of the transcript char-gram path in
    functions/udfs.py: grams are hashed JVM-side (`xxhash64` — the
    heavy string work never reaches Python), collected per doc, and
    the MinHash + band mixing runs in ONE Arrow-vectorized
    mapInPandas over the same cache-resident group kernels as
    batch_transcript_features (functions/text.py).  Docs with no
    n-gram (fewer than n words) emit no row — they can never share a
    shingle, so downstream posting joins lose nothing.

    Shared by the self-join dedup query (minhash_lsh_pairs) and the
    asymmetric fuzzy-decontamination probe
    (operators.decontaminate.fuzzy_contamination_hits)."""
    import pandas as pd  # noqa: F401 (Arrow UDF dependency)

    from file_dedup_rust_spark.functions import hashing
    from file_dedup_rust_spark.operators.decontaminate import word_ngrams

    sh = word_ngrams(docs_with_t, n)
    hashed = sh.select("doc_id", F.xxhash64("g").alias("h"))
    grouped = hashed.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))

    def to_bands(batches):
        import numpy as np
        import pandas as pd

        from file_dedup_rust_spark.functions import text as TX

        a, b = hashing.minhash_params(cfg.minhash_seed, cfg.num_perm)
        # same cache-resident group driver as batch_transcript_features:
        # the padded-gather rectangle is n_docs x max(shingle_count), so
        # grouping by a byte budget keeps one long document from
        # inflating the whole batch's rectangle (ADVICE r2)
        budget = TX._GROUP_BYTES // 8  # uint64 shingle hashes per group
        for pdf in batches:
            arrs = [
                np.asarray(h, dtype=np.int64).view(np.uint64)
                for h in pdf["hs"]
            ]
            m = len(arrs)
            sigs = np.full((m, cfg.num_perm), -1, dtype=np.int32)
            lo = 0
            while lo < m:
                hi, acc = lo, 0
                while hi < m and (acc == 0 or acc + len(arrs[hi]) <= budget):
                    acc += len(arrs[hi])
                    hi += 1
                group = arrs[lo:hi]
                n_sh = np.array([len(x) for x in group], dtype=np.int64)
                G = np.concatenate(group)
                bnd = np.cumsum(n_sh) - n_sh
                sigs[lo:hi] = TX._minhash_gather(G, bnd, n_sh, a, b)
                lo = hi
            bands = TX._band_hashes_batch(sigs, cfg.lsh_bands, cfg.lsh_rows)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(),
                 "mh_bands": list(bands)}
            )

    return grouped.mapInPandas(
        to_bands, schema="doc_id long, mh_bands array<long>"
    )


def explode_keys(signatures: DataFrame, key_col: str) -> DataFrame:
    """signatures -> (key, clip_id) posting rows for one banded column
    (mh_bands / sim_keys / fps)."""
    return signatures.select(
        F.explode(key_col).alias("key"), F.col("clip_id")
    )


def bucket_stats(posting: DataFrame, cap: int):
    """(ok_keys_df, dropped_df): per-key counts split at the cap.
    dropped_df is small (only hot keys) — callers log it to the
    manifest (no silent truncation)."""
    counts = posting.groupBy("key").agg(F.count("*").alias("n"))
    ok = counts.filter((F.col("n") >= 2) & (F.col("n") <= cap)).select("key")
    dropped = counts.filter(F.col("n") > cap)
    return ok, dropped


def candidate_pairs(
    posting: DataFrame, cap: int, prefiltered: bool = False
) -> DataFrame:
    """(key, clip_id) -> distinct unordered pairs (a < b).

    Plan shape: filter to useful keys (>=2, <=cap members) using the
    slim per-key counts (map-side partial combine — hot keys never
    materialize their members), then group the SURVIVING posting rows
    per key (arrays bounded by the cap, so the collect is OOM-safe by
    construction) and explode the m*(m-1)/2 ordered pairs inline.  The
    a<b canonical order is also the reference's self-exclusion
    predicate P2 (deduplication_service.rs:214).  One exchange on key
    + the distinct exchange — the former self-join needed the same
    pair-expansion volume plus an extra scan of the posting table.

    `prefiltered=True` skips the bucket_stats pass for callers that
    already pruned the posting to in-cap keys (salted_candidate_pairs
    computes the per-key counts once for its normal/hot split — a
    second count over the posting would be a redundant full
    aggregation at scale).
    """
    if prefiltered:
        p = posting
    else:
        ok, _ = bucket_stats(posting, cap)
        p = posting.join(ok, "key")  # prune singleton + hot buckets first
    # (unlike verify.simhash_edges_in_bucket, this stage does NOT need
    # a pinned partition count: the MinHash branch's cost is dominated
    # by the downstream signature re-join in verify_minhash, and
    # pinning was measured neutral-to-slightly-negative at 1.28M clips)
    grouped = p.groupBy("key").agg(
        F.sort_array(F.collect_list("clip_id")).alias("ids")
    )
    return (
        grouped.select(F.explode("ids").alias("a"), "ids")
        .select(
            "a",
            F.explode(F.filter("ids", lambda x: x > F.col("a"))).alias("b"),
        )
        .distinct()
    )


def dropped_buckets(posting: DataFrame, cap: int) -> DataFrame:
    """Hot buckets excluded by the cap (for manifest metrics)."""
    _, dropped = bucket_stats(posting, cap)
    return dropped


def salted_candidate_pairs(
    posting: DataFrame, cap: int, n_salt: int = 16
) -> DataFrame:
    """candidate_pairs with hot buckets SALTED instead of dropped.

    The default engine policy for a posting list above `cap` is
    drop-and-count (candidate_pairs + dropped_buckets): a stop-band's
    m² pair explosion usually signals content that exact/rep
    contraction should have collapsed, and the numpy oracle applies
    the same rule so recall accounting stays exact.  When a caller
    NEEDS every pair from a hot bucket (an exact posting join where
    truncation is not acceptable), this variant defuses the skew the
    way the north-star describes — salted repartitioning on the band
    key:

      * normal buckets (2..cap members) take the capped grouped-array
        path unchanged;
      * a hot bucket's members are hashed into `n_salt` shards, the
        key becomes (key, shard_i, shard_j) for the upper triangle of
        shard pairs (each member row is replicated n_salt times — once
        per shard pair containing its shard), and each shard-pair task
        emits its cross/triangle pairs from two bounded arrays.

    Per-task state drops from O(m²) to O((m/n_salt)²) and the m² pair
    generation spreads over n_salt*(n_salt+1)/2 tasks instead of one
    straggler — the same total work, no single hot reducer.  Output ==
    the uncapped distinct pair set (a < b), verified against the
    unsalted join in tests/test_candidates_salting.py."""
    counts = posting.groupBy("key").agg(F.count("*").alias("n"))
    normal_keys = counts.filter(
        (F.col("n") >= 2) & (F.col("n") <= cap)
    ).select("key")
    hot_keys = counts.filter(F.col("n") > cap).select("key")

    normal = candidate_pairs(
        posting.join(normal_keys, "key"), cap, prefiltered=True
    )

    hot = posting.join(hot_keys, "key").withColumn(
        "shard", F.pmod(F.xxhash64("clip_id"), F.lit(n_salt)).cast("int")
    )
    # replicate each member to every shard pair its shard belongs to:
    # row in shard s joins pairs (i, j) with i <= j where s == i or
    # s == j — emitted as (key, i, j, side) rows, ~ (n_salt+1)/2 copies
    pairs_of = F.filter(
        F.expr(
            f"flatten(transform(sequence(0, {n_salt - 1}), i -> "
            f"transform(sequence(i, {n_salt - 1}), j -> struct(i, j))))"
        ),
        lambda p: (p["i"] == F.col("shard")) | (p["j"] == F.col("shard")),
    )
    sharded = hot.select(
        "key", "clip_id", "shard", F.explode(pairs_of).alias("p")
    ).select(
        "key", "clip_id", "shard",
        F.col("p.i").alias("si"), F.col("p.j").alias("sj"),
    )
    grouped = (
        sharded.groupBy("key", "si", "sj")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("shard") == F.col("si"), F.col("clip_id"))
                )
            ).alias("left_ids"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("shard") == F.col("sj"), F.col("clip_id"))
                )
            ).alias("right_ids"),
        )
    )
    # diagonal shard pair (si == sj): triangle within left_ids;
    # off-diagonal: full cross product left x right with a<b canonical
    diag = (
        grouped.filter(F.col("si") == F.col("sj"))
        .select(F.explode("left_ids").alias("a"), "left_ids")
        .select(
            "a",
            F.explode(F.filter("left_ids", lambda x: x > F.col("a"))).alias("b"),
        )
    )
    off = (
        grouped.filter(F.col("si") != F.col("sj"))
        .select(F.explode("left_ids").alias("l"), "right_ids")
        .select("l", F.explode("right_ids").alias("r"))
        .select(
            F.least("l", "r").alias("a"), F.greatest("l", "r").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
    )
    return normal.unionByName(diag).unionByName(off).distinct()
