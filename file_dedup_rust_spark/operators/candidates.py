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


def candidate_pairs(posting: DataFrame, cap: int) -> DataFrame:
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
    """
    ok, _ = bucket_stats(posting, cap)
    p = posting.join(ok, "key")  # prune singleton + hot buckets first
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
