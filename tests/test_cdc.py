"""Gear content-defined chunking (operators/cdc.py): tiling/bounds
invariants, duplicate detection, the shift-robustness property that
justifies CDC over fixed-size blocking, and the Spark chunk/savings
path on a planted corpus."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.cdc import (
    CDC_MAX_SIZE,
    CDC_MIN_SIZE,
    cdc_chunks,
    cdc_savings,
    chunk_offsets,
)


def _blob(seed: int, n: int) -> bytes:
    return np.random.RandomState(seed).randint(
        0, 256, n, dtype=np.uint8
    ).tobytes()


def test_chunk_offsets_tile_input_within_bounds():
    data = np.frombuffer(_blob(1, 200_000), dtype=np.uint8)
    ends = chunk_offsets(data)
    assert ends[-1] == data.size
    start = 0
    for e in ends:
        size = e - start
        assert 0 < size <= CDC_MAX_SIZE
        # every chunk except possibly the final one respects min_size
        if e != data.size:
            assert size >= CDC_MIN_SIZE
        start = e
    # deterministic
    assert ends == chunk_offsets(data)
    # sane mean chunk size for avg_bits=10 (+min-skip): ~1-1.6 KiB
    mean = data.size / len(ends)
    assert 512 < mean < 3000, mean


def test_cdc_shift_robust_fixed_block_is_not():
    """Inserting 7 bytes at the front re-aligns within one chunk for
    CDC (most chunk hashes survive) but shifts EVERY fixed-size
    block."""
    import hashlib

    base = _blob(2, 150_000)
    shifted = _blob(3, 7) + base

    def cdc_set(b: bytes) -> set[str]:
        data = np.frombuffer(b, dtype=np.uint8)
        out, start = set(), 0
        for e in chunk_offsets(data):
            out.add(hashlib.sha256(data[start:e].tobytes()).hexdigest())
            start = e
        return out

    def fixed_set(b: bytes, blk: int = 1024) -> set[str]:
        return {
            hashlib.sha256(b[i : i + blk]).hexdigest()
            for i in range(0, len(b), blk)
        }

    a, b = cdc_set(base), cdc_set(shifted)
    cdc_overlap = len(a & b) / len(a)
    fa, fb = fixed_set(base), fixed_set(shifted)
    fixed_overlap = len(fa & fb) / len(fa)
    assert cdc_overlap >= 0.8, cdc_overlap
    assert fixed_overlap <= 0.05, fixed_overlap


def test_cdc_spark_chunks_and_savings(spark):
    """A corpus with one exact byte copy and one prefix-extended copy:
    the exact copy's chunks dedup 100%, the extended copy shares its
    tail, and the savings summary accounts every byte exactly."""
    base = _blob(4, 60_000)
    rows = [
        ("orig", bytearray(base)),
        ("copy", bytearray(base)),
        ("tagged", bytearray(_blob(5, 11) + base)),
        ("other", bytearray(_blob(6, 60_000))),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    chunks = cdc_chunks(df).cache()
    try:
        per = {
            r["id"]: (r["n"], r["tot"])
            for r in chunks.groupBy("id")
            .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("tot"))
            .collect()
        }
        # chunks tile each input exactly
        assert per["orig"][1] == 60_000
        assert per["tagged"][1] == 60_011
        # exact copy -> identical chunk hash multiset
        shas = {
            r["id"]: sorted(
                (r2["idx"], r2["chunk_sha"])
                for r2 in chunks.where(chunks.id == r["id"]).collect()
            )
            for r in chunks.select("id").distinct().collect()
        }
        assert [s for _, s in shas["orig"]] == [s for _, s in shas["copy"]]
        # tagged copy shares most chunks with orig
        o = {s for _, s in shas["orig"]}
        t = {s for _, s in shas["tagged"]}
        assert len(o & t) / len(o) >= 0.8
        s = cdc_savings(chunks).collect()[0]
        assert s["total_bytes"] == 60_000 * 3 + 60_011 + 0
        # at least the whole exact copy dedups away
        assert s["unique_bytes"] <= s["total_bytes"] - 60_000
        assert s["savings_pct"] > 24.0
    finally:
        chunks.unpersist()


def test_chunk_offsets_property_random_sizes():
    """Tiling/bounds invariants hold at every size, including empty,
    sub-min_size, exactly-max_size, and boundary-free inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=0, max_value=20_000),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def run(n, seed):
        data = np.frombuffer(_blob(seed, n), dtype=np.uint8) if n else (
            np.empty(0, dtype=np.uint8)
        )
        ends = chunk_offsets(data)
        if n == 0:
            assert ends == []
            return
        assert ends[-1] == n
        assert all(e2 > e1 for e1, e2 in zip(ends, ends[1:]))
        start = 0
        for e in ends:
            assert 0 < e - start <= CDC_MAX_SIZE
            if e != n:
                assert e - start >= CDC_MIN_SIZE
            start = e

    run()
