"""Sequence packing (operators/packing.py): the two-pass distributed
prefix sum must equal a single-machine exclusive cumsum for any
bucketing and any input partitioning, and the plan must never collapse
to a single-partition global window."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_blocks,
)


def _expected(ids, weights):
    order = np.argsort(ids)
    pref = np.zeros(len(ids), dtype=np.int64)
    run = 0
    out = {}
    for i in order:
        out[ids[i]] = run
        run += weights[i]
    return out


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_prefix_sum_matches_local_cumsum(spark, n_buckets):
    rng = np.random.default_rng(7)
    ids = rng.permutation(5000)[:1200].tolist()  # sparse, shuffled ids
    weights = rng.integers(0, 400, size=1200).tolist()
    df = spark.createDataFrame(
        list(zip(ids, weights)), "doc_id long, n_tok int"
    ).repartition(7)  # arbitrary physical layout
    got = {
        r["doc_id"]: r["_prefix"]
        for r in exclusive_prefix_sum(
            df, "doc_id", "n_tok", n_buckets=n_buckets
        ).collect()
    }
    assert got == _expected(ids, weights)


def test_pack_blocks_spans(spark):
    # 3 docs, block=10: offsets 0,4,16 -> spans [0,0],[0,1],[1,2]
    df = spark.createDataFrame(
        [(1, 4), (2, 12), (3, 13)], "doc_id long, n_tok int"
    )
    rows = {
        r["doc_id"]: (r["tok_offset"], r["first_block"], r["last_block"])
        for r in pack_blocks(df, "doc_id", "n_tok", block_size=10).collect()
    }
    assert rows == {1: (0, 0, 0), 2: (4, 0, 1), 3: (16, 1, 2)}


def test_pack_blocks_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tok int")
    assert pack_blocks(df, "doc_id", "n_tok", block_size=10).count() == 0


def test_no_single_partition_window(spark):
    """The scan must be partitioned by bucket — a global orderBy window
    would show an Exchange SinglePartition in the plan."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("n_tok")
    )
    plan = exclusive_prefix_sum(
        df, "doc_id", "n_tok", n_buckets=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_prefix_sum_with_order_col(spark, n_buckets):
    """order_col scan: prefix in (order, id) order, ties broken by id,
    negative order values (the quality-descending trick) included."""
    rng = np.random.default_rng(13)
    n = 900
    ids = rng.permutation(4000)[:n].tolist()
    weights = rng.integers(0, 50, size=n).tolist()
    order = rng.integers(-8, 8, size=n).tolist()  # heavy ties
    df = spark.createDataFrame(
        list(zip(ids, weights, order)), "doc_id long, n_tok int, q long"
    ).repartition(5)
    got = {
        r["doc_id"]: r["_prefix"]
        for r in exclusive_prefix_sum(
            df, "doc_id", "n_tok", n_buckets=n_buckets, order_col="q"
        ).collect()
    }
    rows = sorted(zip(order, ids, weights))
    run, want = 0, {}
    for _, did, wt in rows:
        want[did] = run
        run += wt
    assert got == want


def test_prefix_sum_order_col_no_single_partition(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.lit(3).alias("n_tok"),
        (F.col("id") % 17).alias("q"),
    )
    plan = exclusive_prefix_sum(
        df, "doc_id", "n_tok", n_buckets=64, order_col="q"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def _brute_batches(rows, bucket_width, batch_rows):
    """rows: list of (id, length) — reference batch assembly."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, ln in rows:
        buckets[ln // bucket_width].append((ln, i))
    want = {}
    for bkt, members in buckets.items():
        members.sort()
        for b0 in range(0, len(members), batch_rows):
            chunk = members[b0 : b0 + batch_rows]
            mx = max(ln for ln, _ in chunk)
            want[(bkt, b0 // batch_rows)] = (
                len(chunk),
                mx,
                len(chunk) * mx - sum(ln for ln, _ in chunk),
            )
    return want


@pytest.mark.parametrize("bucket_width,batch_rows", [(16, 8), (50, 3), (1, 4)])
def test_bucketed_batches_matches_bruteforce(spark, bucket_width, batch_rows):
    from file_dedup_rust_spark.operators.packing import bucketed_batches

    rng = np.random.default_rng(19)
    ids = rng.permutation(3000)[:800].tolist()
    lens = rng.integers(1, 300, size=800).tolist()
    df = spark.createDataFrame(
        list(zip(ids, lens)), "doc_id long, n_tok int"
    ).repartition(6)
    got = {
        (r["bucket"], r["batch_idx"]): (r["n_rows"], r["max_len"], r["pad_waste"])
        for r in bucketed_batches(
            df, "doc_id", "n_tok", bucket_width, batch_rows
        ).collect()
    }
    assert got == _brute_batches(list(zip(ids, lens)), bucket_width, batch_rows)


def test_bucketed_batches_audio_durations(spark):
    """The ASR use: bucket synthetic clips by dur_ms (string clip_id
    tiebreak); padding waste within a bucket is bounded by
    n_rows * (bucket_width - 1)."""
    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.operators.packing import bucketed_batches

    clips = datagen.generate_clips(spark, 400, seed=42).select(
        "clip_id", "dur_ms"
    )
    width, bsz = 100, 16
    rows = [(r["clip_id"], r["dur_ms"]) for r in clips.collect()]
    got = {
        (r["bucket"], r["batch_idx"]): (r["n_rows"], r["max_len"], r["pad_waste"])
        for r in bucketed_batches(
            clips, "clip_id", "dur_ms", width, bsz
        ).collect()
    }
    assert got == _brute_batches(rows, width, bsz)
    for (_, _), (n, _, waste) in got.items():
        assert waste <= n * (width - 1)


def test_bucketed_batches_no_single_partition(spark):
    from file_dedup_rust_spark.operators.packing import bucketed_batches

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 311).alias("n_tok")
    )
    plan = bucketed_batches(
        df, "doc_id", "n_tok", 16, 8
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_shard_manifest_invariants(spark):
    """Shards are contiguous id ranges, conserve docs/tokens, start at
    multiples of the target (greedy start-offset rule), and overshoot
    the target by less than one document."""
    from file_dedup_rust_spark.operators.packing import shard_manifest

    rng = np.random.default_rng(11)
    ids = rng.permutation(9000)[:1500].tolist()
    weights = rng.integers(1, 300, size=1500).tolist()
    target = 2048
    df = spark.createDataFrame(
        list(zip(ids, weights)), "doc_id long, n_tok int"
    ).repartition(5)
    rows = sorted(
        shard_manifest(df, "doc_id", "n_tok", target).collect(),
        key=lambda r: r["shard_id"],
    )
    total = sum(weights)
    w_max = max(weights)
    assert sum(r["n_docs"] for r in rows) == len(ids)
    assert sum(r["n_tokens"] for r in rows) == total

    # contiguous, disjoint id ranges in shard order
    prev_last = -1
    for r in rows:
        assert r["first_id"] > prev_last
        assert r["first_id"] <= r["last_id"]
        prev_last = r["last_id"]

    # greedy start-offset rule: shard s covers offsets [s*t, ...) and
    # its token mass overshoots the target by < max doc weight
    off = 0
    for r in rows:
        assert off // target == r["shard_id"]
        assert r["n_tokens"] < target + w_max
        off += r["n_tokens"]

    # matches a local greedy replay exactly
    order = np.argsort(ids)
    run, local = 0, {}
    for i in order:
        sid = run // target
        local.setdefault(sid, [0, 0])
        local[sid][0] += 1
        local[sid][1] += weights[i]
        run += weights[i]
    got = {r["shard_id"]: [r["n_docs"], r["n_tokens"]] for r in rows}
    assert got == local
