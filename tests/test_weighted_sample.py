"""Efraimidis–Spirakis weighted take-k: engine output equals a python
brute force of the same md5-lane construction, the draw is partition-
invariant, and the max-of-w-lanes scheme actually samples ∝ weight."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.sampling import (
    MAX_ES_WEIGHT,
    weighted_take_k,
)


def _py_es_key(seed: str, key: int, w: int) -> str:
    return max(
        hashlib.md5(f"{seed}:{j}:{key}".encode()).hexdigest()
        for j in range(min(w, MAX_ES_WEIGHT))
    )


def _py_take_k(seed: str, rows: list[tuple[int, int]], k: int):
    ranked = sorted(
        rows, key=lambda r: (_py_es_key(seed, r[0], r[1]), -r[0]), reverse=True
    )
    return [r[0] for r in ranked[:k]]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, weight long")


def test_weighted_take_k_matches_python_brute_force(spark):
    rows = [(i, 1 + i % MAX_ES_WEIGHT) for i in range(500)]
    got = (
        weighted_take_k(_df(spark, rows), "doc_id", "weight", 40, seed="t1")
        .orderBy("draw_rank")
        .select("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in got] == _py_take_k("t1", rows, 40)


def test_weighted_take_k_partition_invariant(spark):
    rows = [(i, 1 + (i * 7) % 6) for i in range(300)]
    base = _df(spark, rows)
    a = weighted_take_k(base, "doc_id", "weight", 25, seed="t2")
    b = weighted_take_k(
        base.repartition(7, "weight"), "doc_id", "weight", 25, seed="t2"
    )
    assert sorted(
        (r["doc_id"], r["draw_rank"]) for r in a.collect()
    ) == sorted((r["doc_id"], r["draw_rank"]) for r in b.collect())


def test_weighted_take_k_seed_changes_draw(spark):
    rows = [(i, 3) for i in range(200)]
    a = {
        r["doc_id"]
        for r in weighted_take_k(
            _df(spark, rows), "doc_id", "weight", 20, seed="s-a"
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in weighted_take_k(
            _df(spark, rows), "doc_id", "weight", 20, seed="s-b"
        ).collect()
    }
    assert a != b


def test_es_scheme_samples_proportional_to_weight():
    """Scheme-level property (pure python — the Spark path is pinned
    equal to this construction above): over many seeds, P(top-1) of a
    weight-4 row vs a weight-1 row approaches 4:1.  Universe of 50
    rows, half weight 1 and half weight 4 -> heavy mass share
    4/5; 2000 seeds give ±3σ ≈ 0.027."""
    rows = [(i, 4 if i % 2 == 0 else 1) for i in range(50)]
    heavy_wins = sum(
        1
        for s in range(2000)
        if _py_take_k(f"seed{s}", rows, 1)[0] % 2 == 0
    )
    share = heavy_wins / 2000
    assert abs(share - 0.8) < 0.03, share


def test_weighted_take_k_overweight_clamps_to_max(spark):
    """weight > MAX_ES_WEIGHT behaves exactly as MAX_ES_WEIGHT (the
    lane census is capped) — the documented bucket-your-weights
    contract, not silent corruption."""
    rows9 = [(i, 9) for i in range(100)]
    rows8 = [(i, 8) for i in range(100)]
    a = weighted_take_k(_df(spark, rows9), "doc_id", "weight", 10, seed="t3")
    b = weighted_take_k(_df(spark, rows8), "doc_id", "weight", 10, seed="t3")
    assert [r["doc_id"] for r in a.orderBy("draw_rank").collect()] == [
        r["doc_id"] for r in b.orderBy("draw_rank").collect()
    ]
