"""PMI collocation properties (entry q_pmi_top_bigrams): chance
bigrams sit near 0, planted collocations score ln-scale high, and the
Spark arithmetic pins to a hand-computed reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.decontaminate import word_ngrams


def _pmi_rows(spark, docs):
    """The q_pmi_top_bigrams core (no threshold filter) over in-memory
    (doc_id, t) rows: {(w1, w2): (n_pair, pmi)}."""
    df = spark.createDataFrame(docs, "doc_id long, t string")
    uni = (
        word_ngrams(df, 1, distinct=False)
        .groupBy(F.col("g").alias("w"))
        .agg(F.count("*").alias("cu"))
    )
    bi = (
        word_ngrams(df, 2, distinct=False)
        .groupBy("g")
        .agg(F.count("*").alias("cb"))
        .select(
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
            "cb",
        )
    )
    totals = uni.agg(F.sum("cu").alias("n_tok")).crossJoin(
        bi.agg(F.sum("cb").alias("n_bi"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2"))
    out = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "cb",
            F.round(
                F.log(
                    (F.col("cb").cast("double") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_bi").cast("double") * F.col("c1") * F.col("c2"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return {(r["w1"], r["w2"]): (r["cb"], r["pmi"]) for r in out.collect()}


def test_planted_collocation_beats_chance(spark):
    """Words that ONLY ever appear together score far above ANY
    bigram of independently-ordered common words."""
    import random

    docs = []
    for k in range(8):
        words = [f"f{i % 6}" for i in range(30)]  # 6 hot words
        random.Random(k).shuffle(words)  # break fixed adjacency
        docs.append((k, " ".join(words) + " zeta prime"))
    got = _pmi_rows(spark, docs)
    colloc = got[("zeta", "prime")][1]
    chance_max = max(
        p for (a, b), (_, p) in got.items() if a.startswith("f") and b.startswith("f")
    )
    assert colloc > chance_max + 1.5
    assert chance_max < 1.5  # shuffled filler pairs stay near chance


def test_exact_value_matches_hand_computation(spark):
    """Pin the arithmetic: corpus 'a b a b' x 2 docs.
    N=8 tokens, B=6 bigrams; c(a)=c(b)=4; c(a,b)=4, c(b,a)=2.
    pmi(a,b) = ln(4*8*8/(6*4*4)) = ln(8/3)."""
    docs = [(1, "a b a b"), (2, "a b a b")]
    got = _pmi_rows(spark, docs)
    assert got[("a", "b")][0] == 4
    assert got[("a", "b")][1] == round(math.log(8.0 / 3.0), 4)
    assert got[("b", "a")][0] == 2
    assert got[("b", "a")][1] == round(math.log(2 * 8 * 8 / (6 * 4 * 4.0)), 4)


def test_rare_pair_of_common_words_scores_negative(spark):
    """Two individually common words that almost never co-occur get
    NEGATIVE pmi — the anti-collocation direction."""
    docs = [(k, "x q " * 10 + "y r") for k in range(4)]
    # x and y both common; (x, y) occurs 0 times -> absent; the weak
    # (y, r)-style chance pair exists once per doc
    got = _pmi_rows(spark, docs)
    assert ("x", "y") not in got
    # (q, x) repeats inside each doc: frequent but expected-frequent,
    # so its pmi stays near 0 rather than ln-scale high
    assert abs(got[("q", "x")][1]) < 1.0
