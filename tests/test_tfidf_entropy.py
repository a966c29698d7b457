"""Property tests for the two newest quality/verification metrics:

* q_tfidf_cosine_pairs — IDF-weighted shingle cosine: the boilerplate-
  discounting property that motivates it (corpus-frequent shingles get
  weight ~0, rare shingles dominate), plus exact-value pins against
  hand-computed tf-idf arithmetic.
* q_token_entropy — per-doc Shannon entropy/evenness: the degenerate
  endpoints (single repeated token -> 0, uniform distinct -> ln n /
  evenness 1) plus a hand-computed mixed case.

Both cores are re-run over in-memory corpora (the driver queries bind
the documents table and JACCARD_T; the arithmetic under test is
identical)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.decontaminate import word_ngrams


# ---------------------------------------------------------------------------
# tf-idf shingle cosine
# ---------------------------------------------------------------------------


def _tfidf_pairs(spark, docs, threshold):
    """q_tfidf_cosine_pairs core over (doc_id, t) rows at an arbitrary
    threshold; returns {(ia, ib): cos} (4-dp rounded, like the query)."""
    df = spark.createDataFrame(docs, "doc_id long, t string")
    grams = word_ngrams(df, 3, distinct=False)
    cnt = grams.groupBy("doc_id", F.xxhash64("g").alias("h")).agg(
        F.count("*").alias("tf")
    )
    n_docs = df.select(F.count("*").alias("nd"))
    df_census = cnt.groupBy("h").agg(F.count("*").alias("df"))
    w = (
        cnt.join(df_census, "h")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "h",
            (
                F.col("tf")
                * F.log((F.col("nd") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("ia"), "h", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("ib"), "h", F.col("w").alias("wb"))
    dot = (
        a.join(b, "h")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("ia"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("ib"), F.col("nrm").alias("nb"))
    out = (
        dot.join(na, "ia")
        .join(nb, "ib")
        .select(
            "ia",
            "ib",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias(
                "c"
            ),
        )
        .filter(F.col("c") >= threshold)
    )
    return {(r["ia"], r["ib"]): r["c"] for r in out.collect()}


def _py_tfidf_cos(corpus: list[str], i: int, j: int) -> float:
    """Reference tf-idf cosine between corpus[i] and corpus[j] in
    plain Python (multiset word-3-grams, idf = ln((N+1)/(df+1)))."""

    def bag(t):
        w = t.split(" ")
        out: dict[str, int] = {}
        for k in range(len(w) - 2):
            g = " ".join(w[k : k + 3])
            out[g] = out.get(g, 0) + 1
        return out

    bags = [bag(t) for t in corpus]
    n = len(corpus)
    df: dict[str, int] = {}
    for b in bags:
        for g in b:
            df[g] = df.get(g, 0) + 1

    def vec(b):
        return {
            g: c * math.log((n + 1.0) / (df[g] + 1.0)) for g, c in b.items()
        }

    va, vb = vec(bags[i]), vec(bags[j])
    dot = sum(w * vb[g] for g, w in va.items() if g in vb)
    na = math.sqrt(sum(w * w for w in va.values()))
    nb = math.sqrt(sum(w * w for w in vb.values()))
    return dot / (na * nb)


def test_identical_docs_score_one(spark):
    base = " ".join(f"w{i:03d}" for i in range(30))
    other = " ".join(f"x{i:03d}" for i in range(30))
    got = _tfidf_pairs(spark, [(1, base), (2, base), (3, other)], 0.5)
    assert got == {(1, 2): 1.0}


def test_boilerplate_only_overlap_is_discounted(spark):
    """Two docs sharing ONLY the corpus-wide boilerplate header score
    near zero on tf-idf cosine even though their set-Jaccard overlap
    is substantial — the discounting property the unweighted tiers
    lack.  The header appears in EVERY doc, so its grams carry
    idf = ln((N+1)/(N+1)) = 0 exactly."""
    header = "standard license header applies to this file"
    bodies = [
        " ".join(f"a{i:02d}" for i in range(8)),
        " ".join(f"b{i:02d}" for i in range(8)),
        " ".join(f"c{i:02d}" for i in range(8)),
        " ".join(f"d{i:02d}" for i in range(8)),
    ]
    docs = [(k + 1, f"{header} {b}") for k, b in enumerate(bodies)]
    # set-Jaccard of the header-sharing pairs is well above 0.2 ...
    w = docs[0][1].split(" ")
    grams0 = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    w = docs[1][1].split(" ")
    grams1 = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    set_jac = len(grams0 & grams1) / len(grams0 | grams1)
    assert set_jac > 0.2
    # ... yet no pair survives even a LOW tf-idf threshold: only the
    # zero-idf header grams and the two header->body boundary grams
    # (df=1 each side, disjoint) are involved.
    got = _tfidf_pairs(spark, docs, 0.05)
    assert got == {}


def test_rare_gram_overlap_dominates(spark):
    """Sharing one rare phrase scores higher than sharing the same
    number of corpus-common grams."""
    rare = "zq zr zs zt zu"
    common = "the quick brown fox jumps"
    docs = [
        (1, f"{rare} p00 p01 p02 p03"),
        (2, f"{rare} q00 q01 q02 q03"),
        (3, f"{common} r00 r01 r02 r03"),
        (4, f"{common} s00 s01 s02 s03"),
        (5, common),
        (6, common),
        (7, common),
    ]
    got = _tfidf_pairs(spark, docs, 0.0)
    # rare-phrase pair outranks the common-phrase pair (docs 3,4)
    assert got[(1, 2)] > got[(3, 4)]


def test_exact_value_matches_python_reference(spark):
    corpus = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma zeta eta theta",
        "iota kappa lambda mu nu xi",
        "alpha beta gamma delta epsilon zeta",
    ]
    docs = [(k + 1, t) for k, t in enumerate(corpus)]
    got = _tfidf_pairs(spark, docs, 0.01)
    want12 = _py_tfidf_cos(corpus, 0, 1)
    assert got[(1, 4)] == 1.0
    assert abs(got[(1, 2)] - round(want12, 4)) <= 1e-9


# ---------------------------------------------------------------------------
# token entropy / evenness
# ---------------------------------------------------------------------------


def _entropy_rows(spark, docs):
    """q_token_entropy core over (doc_id, t) rows."""
    df = spark.createDataFrame(docs, "doc_id long, t string")
    toks = word_ngrams(df, 1, distinct=False)
    cnt = toks.groupBy("doc_id", F.xxhash64("g").alias("h")).agg(
        F.count("*").alias("c")
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.log("c")).alias("clnc"),
    )
    h = F.log("n_tokens") - F.col("clnc") / F.col("n_tokens")
    out = agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(h, 4).alias("entropy"),
        F.round(
            F.when(F.col("n_types") > 1, h / F.log("n_types")).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("evenness"),
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repeated_token_has_zero_entropy(spark):
    got = _entropy_rows(spark, [(1, "spam spam spam spam spam")])
    assert got[1]["n_tokens"] == 5
    assert got[1]["n_types"] == 1
    assert got[1]["entropy"] == 0.0
    assert got[1]["evenness"] == 0.0


def test_uniform_distinct_tokens_hit_ln_n(spark):
    n = 16
    t = " ".join(f"t{i:02d}" for i in range(n))
    got = _entropy_rows(spark, [(1, t)])
    assert got[1]["n_tokens"] == n
    assert got[1]["n_types"] == n
    assert got[1]["entropy"] == round(math.log(n), 4)
    assert got[1]["evenness"] == 1.0


def test_hand_computed_mixed_distribution(spark):
    # counts {a: 2, b: 1}: H = ln 3 - (2 ln 2)/3
    got = _entropy_rows(spark, [(1, "a a b")])
    want = math.log(3) - (2 * math.log(2)) / 3
    assert got[1]["entropy"] == round(want, 4)
    assert got[1]["evenness"] == round(want / math.log(2), 4)


def test_entropy_flags_loops_below_natural_text(spark):
    """The quality-filter property: a looped doc scores strictly lower
    evenness than natural-ish text of the same length."""
    loop = " ".join(["lorem ipsum"] * 20)  # 40 tokens, 2 types
    natural = " ".join(f"w{i:02d}" for i in range(40))
    got = _entropy_rows(spark, [(1, loop), (2, natural)])
    assert got[1]["evenness"] == 1.0  # balanced but tiny vocab...
    assert got[1]["entropy"] < 0.2 * got[2]["entropy"]  # ...low entropy
    assert got[2]["evenness"] == 1.0
