"""Bag (multiset) Jaccard near-dup metric (entry q_bag_jaccard_pairs):
the padding-robustness property that motivates it, plus exact-value
pins against hand-computed multiset arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F


def _bag_pairs(spark, docs, threshold):
    """Run the q_bag_jaccard_pairs core over an in-memory (doc_id, t)
    corpus at an arbitrary threshold (the driver query binds the
    corpus and JACCARD_T; the arithmetic under test is identical)."""
    from file_dedup_rust_spark.operators.decontaminate import word_ngrams

    df = spark.createDataFrame(docs, "doc_id long, t string")
    grams = word_ngrams(df, 3, distinct=False)
    cnt = grams.groupBy("doc_id", F.xxhash64("g").alias("h")).agg(
        F.count("*").alias("cn")
    )
    tot = cnt.groupBy("doc_id").agg(F.sum("cn").alias("n"))
    a = cnt.select(F.col("doc_id").alias("ia"), "h", F.col("cn").alias("ca"))
    b = cnt.select(F.col("doc_id").alias("ib"), "h", F.col("cn").alias("cb"))
    inter = (
        a.join(b, "h")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(F.least("ca", "cb")).alias("m"))
    )
    ta = tot.select(F.col("doc_id").alias("ia"), F.col("n").alias("na"))
    tb = tot.select(F.col("doc_id").alias("ib"), F.col("n").alias("nb"))
    out = (
        inter.join(ta, "ia")
        .join(tb, "ib")
        .select(
            "ia",
            "ib",
            (F.col("m") / (F.col("na") + F.col("nb") - F.col("m"))).alias(
                "bag_jac"
            ),
        )
        .filter(F.col("bag_jac") >= threshold)
    )
    return {(r["ia"], r["ib"]): r["bag_jac"] for r in out.collect()}


def _set_jac(ta: str, tb: str) -> float:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    A, B = sh(ta), sh(tb)
    return len(A & B) / len(A | B)


def test_identical_docs_score_one(spark):
    base = " ".join(f"w{i:03d}" for i in range(30))
    got = _bag_pairs(spark, [(1, base), (2, base)], 0.5)
    assert got == {(1, 2): 1.0}


def test_self_padding_decays_bag_but_not_set_jaccard(spark):
    """A doc padded by repeating its own first half: every padded gram
    already exists in the original, so SET Jaccard stays ~1.0 (the
    saturation bag-Jaccard exists to fix) while the bag score decays
    toward the unpadded fraction."""
    words = [f"w{i:03d}" for i in range(40)]
    base = " ".join(words)
    padded = " ".join(words + words[:20] * 3)  # 60 extra occurrences
    set_j = _set_jac(base, padded)
    assert set_j > 0.9  # set form barely notices the padding...
    got = _bag_pairs(spark, [(1, base), (2, padded)], 0.0)
    bag_j = got[(1, 2)]
    # ...the bag form decays well below it (exact value pinned below)
    assert bag_j < set_j - 0.2
    # hand arithmetic: na=38 grams; padding appends 60 words => the
    # padded doc has 96 grams.  Every base gram occurs once in base;
    # shared mass m = Σ min(c1, c2) over base grams = 38 minus the
    # boundary grams the pad rewrites, so compute it exactly:
    def bags(t):
        w = t.split(" ")
        out: dict[str, int] = {}
        for i in range(len(w) - 2):
            g = " ".join(w[i : i + 3])
            out[g] = out.get(g, 0) + 1
        return out

    b1, b2 = bags(base), bags(padded)
    m = sum(min(c, b2.get(g, 0)) for g, c in b1.items())
    expect = m / (sum(b1.values()) + sum(b2.values()) - m)
    assert abs(bag_j - expect) < 1e-9


def test_disjoint_docs_emit_no_pair(spark):
    a = " ".join(f"a{i}" for i in range(20))
    b = " ".join(f"b{i}" for i in range(20))
    assert _bag_pairs(spark, [(1, a), (2, b)], 0.0) == {}


def test_multiset_min_arithmetic_exact(spark):
    """3 copies of a gram vs 1 copy: min contributes 1, max keeps 3 —
    J_bag = Σmin / (na + nb − Σmin) checked against hand numbers."""
    # 'x y z' appears 3x in doc1 (with separator words so no other
    # gram repeats), 1x in doc2
    d1 = "x y z p1 x y z p2 x y z"
    d2 = "x y z q1 q2 q3 q4 q5"
    # doc1 grams: 9 total; doc2 grams: 6 total
    # shared grams: 'x y z' min(3,1)=1 -> m=1; J = 1/(9+6-1)
    got = _bag_pairs(spark, [(1, d1), (2, d2)], 0.0)
    assert abs(got[(1, 2)] - 1.0 / 14.0) < 1e-9
