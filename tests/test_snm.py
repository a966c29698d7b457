"""Sorted-neighborhood candidates (operators/snm.py): distributed
global rank correctness, multi-pass key coverage, and the documented
blind spot."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.snm import (
    SNM_WINDOW,
    global_rank,
    snm_candidates,
)


def test_global_rank_matches_single_node_sort(spark):
    """The two-pass distributed rank (range repartition + partition
    row_number + broadcast offsets) equals the plain sorted position —
    bucket boundaries must never leak into the output."""
    rows = [(i, f"key {(i * 7919) % 97:03d} tail {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        r["id"]: r["_rank"]
        for r in global_rank(df, "k", "id", n_buckets=13).collect()
    }
    want = {
        rid: pos
        for pos, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_global_rank_empty_and_single_row(spark):
    df0 = spark.createDataFrame([], "id long, k string")
    assert global_rank(df0, "k", "id").count() == 0
    df1 = spark.createDataFrame([(1, "x")], "id long, k string")
    assert global_rank(df1, "k", "id").collect()[0]["_rank"] == 0


def test_multipass_keys_catch_head_and_tail_edits(spark):
    """Pass 1 (text prefix) finds tail-edited twins; pass 2 (reversed-
    text prefix) finds head-edited twins — each edit class defeats
    exactly one key, which is why SNM is run multi-pass."""
    base = " ".join(f"w{i:04d}" for i in range(40))
    tail_edit = base[: len(base) - 5] + "zzzzz"   # same head, new tail
    head_edit = "zzzzz" + base[5:]                # new head, same tail
    filler = [
        (100 + i, f"unrelated document {i} " + " ".join(["pad"] * 30))
        for i in range(50)
    ]
    docs = spark.createDataFrame(
        [(1, base), (2, tail_edit), (3, head_edit)] + filler,
        "doc_id long, t string",
    )
    cand = {
        (r["ia"], r["ib"]) for r in snm_candidates(docs).collect()
    }
    assert (1, 2) in cand  # prefix pass
    assert (1, 3) in cand  # reversed pass


def test_snm_misses_midkey_scramble_documented_blind_spot(spark):
    """A twin whose first AND last key regions both changed sorts far
    from its original under BOTH passes — the documented sort-key
    blind spot (the LSH tier exists for exactly this mode).  Build
    enough in-between rows that the window cannot bridge the gap."""
    base = "aaa " + " ".join(f"m{i:03d}" for i in range(30)) + " zzz"
    both_edit = "qqq " + " ".join(f"m{i:03d}" for i in range(30)) + " bbb"
    # spacer heads sort between 'aaa' and 'qqq'; spacer TAILS end in
    # 'm', so their REVERSED keys start with 'm' — between 'bbb' and
    # 'zzz' — keeping the planted pair separated under both passes
    spacers = [
        (10 + i, f"c{i:03d} " + " ".join(["mid"] * 20) + f" x{i:03d}m")
        for i in range(3 * SNM_WINDOW)
    ]
    docs = spark.createDataFrame(
        [(1, base), (2, both_edit)] + spacers, "doc_id long, t string"
    )
    cand = {(r["ia"], r["ib"]) for r in snm_candidates(docs).collect()}
    assert (1, 2) not in cand


def test_candidate_count_is_bounded_and_deterministic(spark):
    """|candidates| <= passes * n * w (exact-budget contract), and two
    runs over the same input are identical."""
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string"))
        .alias("t"),
    )
    c1 = snm_candidates(docs)
    n = c1.count()
    assert n <= 2 * 300 * SNM_WINDOW
    assert {(r["ia"], r["ib"]) for r in c1.collect()} == {
        (r["ia"], r["ib"]) for r in snm_candidates(docs).collect()
    }
