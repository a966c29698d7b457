"""Sequence packing: concatenate-then-chunk block assignment.

LLM pre-training consumes documents as fixed-length token blocks: the
corpus is laid out in one deterministic order, token counts are
prefix-summed, and every document learns which context-window blocks
it lands in (GPT-2/3 style pack-and-chunk; Brown et al. 2020 §2.2).
The whole operator reduces to an EXCLUSIVE GLOBAL PREFIX SUM over the
per-document token counts — which is exactly the thing a naive Spark
plan gets catastrophically wrong: `Window.orderBy(id)` with no
partitionBy collapses the entire corpus into ONE task.

This module implements the scale-honest version as a classic two-pass
distributed scan:

  pass 1  deterministic fixed-width buckets over the id domain (at
          production scale the boundaries come from a committed range
          sample instead; the fixed-width rule keeps the operator
          replayable and oracle-checkable on the dense synthetic ids),
          then per-bucket totals — ONE partial-aggregated shuffle whose
          output is `n_buckets` rows, collected to the driver (bounded
          by construction, not by luck).
  driver  exclusive prefix over the <= n_buckets totals (trivial).
  pass 2  broadcast the bucket offsets back (map-side join, no
          shuffle), intra-bucket window cumsum partitioned BY BUCKET —
          all buckets scan in parallel; no single-partition stage
          anywhere in the plan.

Reference analog: the reference processes files strictly one at a time
(/root/reference/backend/src/worker/deduplication_service.rs:69-101),
so corpus layout for training never arises there; this operator is
part of the training-data surface layered on top (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_buckets: int = 64,
    order_col: str | None = None,
) -> DataFrame:
    """Add `_prefix` = sum of `weight_col` over all rows that sort
    earlier (exclusive scan).  Scan order is `id_col` alone, or —
    when `order_col` is given — (order_col, id_col): the buckets
    partition the ORDER column's integer domain and `id_col` breaks
    ties, so equal order keys land in one bucket and the scan stays
    globally consistent.

    Ids must be unique; weights must be non-negative; order_col (if
    given) must be integral.  Output carries every input column plus
    `_prefix` (long).  See the module docstring for the two-pass plan;
    the only full-data shuffle is the bucket-partitioned window sort.
    """
    key = order_col or id_col
    bounds = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if bounds["lo"] is None:  # empty input: scan of nothing
        return df.withColumn("_prefix", F.lit(0).cast("long"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))  # ceil div

    b = df.withColumn(
        "_bkt", ((F.col(key) - F.lit(lo)) / F.lit(width)).cast("long")
    )

    # pass 1: per-bucket totals — bounded collect (<= n_buckets rows)
    totals = (
        b.groupBy("_bkt")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_tot"))
        .collect()
    )
    totals.sort(key=lambda r: r["_bkt"])
    offsets, running = [], 0
    for r in totals:
        offsets.append((int(r["_bkt"]), running))
        running += int(r["_tot"])

    off_df = df.sparkSession.createDataFrame(offsets, "_bkt long, _off long")

    # pass 2: broadcast offsets back; window per bucket (parallel)
    order = [order_col, id_col] if order_col else [id_col]
    w = (
        Window.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(off_df), "_bkt")
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum(F.col(weight_col).cast("long")).over(w), F.lit(0)
            )
            + F.col("_off"),
        )
        .drop("_bkt", "_off")
    )


def bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_width: int,
    batch_rows: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Length-bucketed batch assembly with padding-waste accounting.

    ASR/TTS training pads every batch member to the batch's longest
    sequence, so loaders group clips of similar duration first
    (bucketed batching).  Rows land in fixed-width length buckets
    (`len div bucket_width`); within a bucket rows are taken in
    deterministic (len, id) order, `batch_rows` at a time; each batch
    reports its padded length (the max) and the padding it wastes.
    Works over any integral length column — clip `dur_ms` for audio,
    token counts for text.

    Output: one row per batch — bucket, batch_idx, n_rows, max_len,
    pad_waste (= n_rows * max_len - sum(len)).

    Scale shape.  The within-bucket index is NOT a per-length-bucket
    window (a hot bucket would serialize into one task).  Because
    buckets partition the length DOMAIN and the scan order is
    (len, id), each bucket's rows are contiguous in the global
    (len, id) rank, so the two-pass distributed prefix COUNT above
    doubles as the per-bucket index after subtracting the bucket's
    first rank — a bounded one-row-per-bucket aggregate broadcast
    back.  Parallelism is the prefix sum's `n_buckets` over the
    length domain, independent of how coarse `bucket_width` is.
    """
    p = exclusive_prefix_sum(
        df.withColumn("_one", F.lit(1)),
        id_col,
        "_one",
        n_buckets=n_buckets,
        order_col=len_col,
    ).drop("_one")
    b = p.withColumn(
        "_bucket",
        F.expr(f"cast({len_col} as long) div {int(bucket_width)}"),
    )
    # one row per non-empty length bucket — bounded by the length
    # domain / bucket_width, broadcast back
    first = b.groupBy("_bucket").agg(F.min("_prefix").alias("_first"))
    batch = (
        b.join(F.broadcast(first), "_bucket")
        .withColumn(
            "_batch", F.expr(f"(_prefix - _first) div {int(batch_rows)}")
        )
    )
    return batch.groupBy(
        F.col("_bucket").alias("bucket"), F.col("_batch").alias("batch_idx")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.max(len_col).cast("long").alias("max_len"),
        (F.count("*") * F.max(len_col) - F.sum(len_col))
        .cast("long")
        .alias("pad_waste"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    shard_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """WebDataset-style output sharding: lay the corpus out in
    deterministic `id_col` order and cut it into ~`shard_tokens`-token
    shards — each row lands in the shard where its token span STARTS
    (shard_id = tok_offset div shard_tokens, the greedy writer rule),
    so every row belongs to exactly one shard and shards are
    contiguous id ranges.

    Returns the per-shard manifest a distributed shard writer needs
    to run embarrassingly parallel afterwards (each writer task reads
    `[first_id, last_id]` and streams one shard file):
    (shard_id, n_docs, n_tokens, first_id, last_id).

    Scale shape: the global layout is the two-pass distributed prefix
    sum (no single-partition window); the manifest aggregation
    shuffles one row per input row keyed by shard_id, output bounded
    by total_tokens / shard_tokens.  A shard overshoots its target by
    at most one document, matching greedy shard writers."""
    p = exclusive_prefix_sum(df, id_col, weight_col, n_buckets=n_buckets)
    s = p.withColumn(
        "shard_id", F.expr(f"_prefix div {int(shard_tokens)}")
    )
    return s.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col(weight_col).cast("long")).alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def pack_blocks(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    block_size: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each row its [first_block, last_block] span under
    concatenate-then-chunk packing with `block_size`-token blocks.

    Output: id_col, weight_col, tok_offset (exclusive prefix sum),
    first_block, last_block.  Block arithmetic stays in integer
    domain (`div`) — no doubles, so the result is exact at any corpus
    size (a 100-TB corpus overflows float53 token offsets).
    """
    p = exclusive_prefix_sum(df, id_col, weight_col, n_buckets=n_buckets)
    return p.select(
        id_col,
        weight_col,
        F.col("_prefix").alias("tok_offset"),
        F.expr(f"_prefix div {int(block_size)}").alias("first_block"),
        F.expr(
            f"(_prefix + cast({weight_col} as long) - 1L) div {int(block_size)}"
        ).alias("last_block"),
    )
