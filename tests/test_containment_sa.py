from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.operators.containment import (
    containment_pairs_in_bucket,
    suffix_array,
)


def test_suffix_array_small():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(s[i:].astype(np.uint8)) for i in sa]
    assert suffixes == sorted(suffixes)


def test_suffix_array_matches_naive_random():
    rng = np.random.default_rng(11)
    for _ in range(5):
        s = rng.integers(0, 4, size=int(rng.integers(1, 200))).astype(np.int64)
        sa = suffix_array(s)
        naive = sorted(range(s.size), key=lambda i: s[i:].tolist())
        assert sa.tolist() == naive


def test_containment_bucket_pairs():
    ids = ["c", "a", "b", "d"]
    texts = [
        "the quick brown fox jumps over the lazy dog",      # c
        "PREFIX the quick brown fox jumps over the lazy dog SUFFIX".lower(),  # a contains c
        "unrelated words entirely different content here",  # b
        "the quick brown fox jumps over the lazy dog",      # d == c exactly
    ]
    pairs = containment_pairs_in_bucket(ids, texts, min_len=10)
    got = {(a, b) for a, b, _ in pairs}
    assert ("c", "a") in got          # c contained in a
    assert ("d", "a") in got
    assert ("c", "d") in got          # equal texts -> (min_id, max_id)
    assert not any("b" in p for p in got)


def test_containment_min_len_filter():
    pairs = containment_pairs_in_bucket(["a", "b"], ["abc", "xx abc yy"], min_len=10)
    assert pairs == set()


def test_containment_edges_both_branches(spark, cfg):
    """containment_edges splits verification by container size: short
    containers go through JVM `contains`, containers >=
    cfg.sa_container_bytes through the grouped-map suffix array.  Both
    must emit the same edge shape."""
    from file_dedup_rust_spark.functions import text as TX
    from file_dedup_rust_spark.operators.containment import containment_edges

    base = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"tok{i:04d} pad word" for i in range(400))
    mega = f"{filler} {base} {filler}"          # > 4096 bytes -> SA branch
    short_cont = f"prefix words {base} suffix words"  # JVM branch
    rows = {
        "pat": base,
        "short_cont": short_cont,
        "mega_cont": mega,
        "other": "completely different material with no overlap at all xyz",
    }
    assert len(mega.encode()) >= cfg.sa_container_bytes

    recs = []
    for cid, text in rows.items():
        t_norm = TX.normalize_transcript(text)
        fps = TX.transcript_fingerprints(text, cfg)
        recs.append((cid, t_norm.decode(), len(t_norm),
                     fps.view("int64").tolist()))
    sig = spark.createDataFrame(
        recs, "clip_id string, t_norm string, t_len int, fps array<long>"
    )
    got = {(r["a"], r["b"]): r["kind"] for r in containment_edges(sig, cfg).collect()}
    assert ("pat", "short_cont") in got          # JVM contains branch
    assert ("mega_cont", "pat") in got or ("pat", "mega_cont") in got  # SA branch
    assert all(k == "containment" for k in got.values())
    assert not any("other" in p for p in got)
