"""DSIR importance weighting (operators/dsir.py): property test vs a
pure-Python reference, the bucketed (hashing-trick) scale path, and a
directional sanity check — a verbatim copy of a target doc must
outscore a disjoint-vocabulary doc."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.dsir import (
    dsir_log_ratios,
    ngram_features,
)

TGT_MOD = 3


def _grams(t: str) -> list[str]:
    w = t.split(" ")
    return w + [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]


def _ref_dsir(docs: dict[int, str]) -> dict[int, tuple[int, float]]:
    """Unrounded reference: mean over feature occurrences of
    ln p_tgt(f) - ln p_raw(f), add-1 smoothed over the union vocab."""
    ct: Counter = Counter()
    cr: Counter = Counter()
    docfeats = {}
    for d, t in docs.items():
        g = _grams(t)
        docfeats[d] = g
        (ct if d % TGT_MOD == 1 else cr).update(g)
    v = len(set(ct) | set(cr))
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for d, g in docfeats.items():
        if d % TGT_MOD == 1:
            continue
        vals = [
            math.log(ct[f] + 1)
            - math.log(tt + v)
            - math.log(cr[f] + 1)
            + math.log(tr + v)
            for f in g
        ]
        out[d] = (len(g), sum(vals) / len(vals))
    return out


WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
DOC = st.lists(WORD, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(DOC, min_size=4, max_size=12))
def test_dsir_matches_python_reference(spark, texts):
    docs = dict(enumerate(texts))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, t string")
    out = {
        r["doc_id"]: (r["n_feats"], r["dsir_logratio"])
        for r in dsir_log_ratios(
            ngram_features(df), F.col("doc_id") % TGT_MOD == 1
        ).collect()
    }
    ref = _ref_dsir(docs)
    assert set(out) == set(ref)
    for d, (n, val) in ref.items():
        assert out[d][0] == n
        # Spark rounds to 4 decimals; allow the rounding half-step
        assert abs(out[d][1] - val) <= 6e-5, (d, out[d][1], val)


def test_dsir_bucketed_shape_and_direction(spark):
    """The hashing-trick path (n_buckets) must keep the output
    row-set identical and still rank a verbatim copy of a target doc
    above a disjoint-vocabulary doc (collision-tolerant property —
    holds at any bucket count large vs the vocab)."""
    target = "red green blue red green"
    rows = [
        (1, target),              # target slice (1 % 3 == 1)
        (4, target),              # also target
        (0, target),              # raw: verbatim copy of the target
        (2, "zig zag quux corge grault"),  # raw: disjoint vocab
        (3, "red blue zig zag corge"),     # raw: mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    feats = ngram_features(df)
    for nb in (None, 4096):
        out = {
            r["doc_id"]: r["dsir_logratio"]
            for r in dsir_log_ratios(
                feats, F.col("doc_id") % TGT_MOD == 1, n_buckets=nb
            ).collect()
        }
        assert set(out) == {0, 2, 3}
        assert out[0] > out[3] > out[2], (nb, out)


def test_dsir_query_plan_is_jvm_only(spark):
    """No per-row Python and no cartesian pair enumeration in the
    driver query's physical plan (the 1-row totals broadcast is the
    only nested-loop source allowed)."""
    from file_dedup_rust_spark.entry import testdata_queries as Q

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        Q.q_dsir_weights(spark, "/root/testdata/sf0.001").explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_unimax_allocation_property_vs_python(spark):
    """The window/aggregate water-fill matches an iterative
    plain-Python water-fill on arbitrary small censuses: capped
    strata get exactly epochs*tok, uncapped strata share the rest
    equally, and sum(alloc) == min(budget, sum(caps))."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.functions.sampling import unimax_allocation

    census = st.dictionaries(
        st.sampled_from(["en", "zh", "es", "de", "fr", "sw"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=10, deadline=None)
    @given(census, st.sampled_from([0.5, 1.0, 1.5]),
           st.sampled_from([1, 2, 4]))
    def run(tok, frac, epochs):
        df = spark.createDataFrame(list(tok.items()), "lang string, tok long")
        got = {
            r["lang"]: (r["n_tokens"], r["alloc_tokens"], r["epochs"])
            for r in unimax_allocation(
                df, "lang", "tok", epochs, frac
            ).collect()
        }
        budget = float(int(frac * sum(tok.values())))
        remaining, left = budget, len(tok)
        ref = {}
        for cap, lang in sorted((t * epochs, l) for l, t in tok.items()):
            share = remaining / left
            alloc = cap if cap < share else share
            ref[lang] = alloc
            remaining -= alloc
            left -= 1
        assert set(got) == set(ref)
        for lang, alloc in ref.items():
            n, a, e = got[lang]
            assert n == tok[lang]
            assert abs(a - round(alloc, 4)) <= 1e-6, (lang, a, alloc)
            assert abs(e - round(round(alloc, 4) / tok[lang], 4)) <= 1e-6
        total_alloc = sum(v[1] for v in got.values())
        assert abs(total_alloc - min(budget, sum(ref.values()))) < 1e-3 + \
            1e-6 * budget

    run()
