from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.repetition import repetition_stats, run_stats


def _py_run_stats(tokens: list[str]) -> tuple[int, int]:
    """Reference: (modal count, tokens in runs>1) of the multiset."""
    if not tokens:
        return 0, 0
    c = Counter(tokens)
    best = max(c.values())
    dup = sum(v for v in c.values() if v > 1)
    return best, dup


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "e f"]), max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_run_stats_matches_counter(spark, arrays):
    df = spark.createDataFrame(
        [(i, sorted(a)) for i, a in enumerate(arrays)], "id long, s array<string>"
    )
    got = {
        r["id"]: (r["st"]["best"], r["st"]["dup"])
        for r in df.select("id", run_stats("s").alias("st")).collect()
    }
    for i, a in enumerate(arrays):
        assert got[i] == _py_run_stats(a), (a, got[i])


def test_repetition_stats_flags_planted_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, " ".join(["spam"] * 30)),                 # modal word = 1.0
        (3, " ".join(["buy", "now", "cheap"] * 20)),  # bigram-heavy, word-light
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, t string")
        ).collect()
    }
    assert out[1]["rep_flag"] == 0
    assert out[2]["rep_flag"] == 1 and out[2]["top_word_frac"] == 1.0
    assert out[3]["rep_flag"] == 1
    assert out[3]["top_word_frac"] < 0.5          # flags only via bigrams
    assert out[3]["dup_bigram_frac"] == 1.0


def test_repetition_stats_plan_has_no_exchange(spark):
    df = repetition_stats(
        spark.createDataFrame([(1, "a b c")], "doc_id long, t string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_run_stats_single_and_empty(spark):
    df = spark.createDataFrame(
        [(0, []), (1, ["x"]), (2, ["x", "x"])], "id long, s array<string>"
    )
    got = {
        r["id"]: (r["st"]["best"], r["st"]["dup"])
        for r in df.select("id", run_stats("s").alias("st")).collect()
    }
    assert got == {0: (0, 0), 1: (1, 0), 2: (2, 2)}
