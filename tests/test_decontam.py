"""Fuzzy (paraphrase-robust) decontamination semantics.

The oracle-checked driver query (fuzzy_decontam_hits) pins the
numbers; these tests pin the SEMANTIC claim that motivates the
operator — an edited eval leak that exact long-gram decontamination
cannot see is still caught by the MinHash near-dup probe — plus the
plan shape (no cartesian / nested-loop pair enumeration).
"""

from __future__ import annotations

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.operators.decontaminate import (
    contamination_hits,
    fuzzy_contamination_hits,
)

# 42 distinct words — long enough for 8-gram windows and stable
# word-3-gram statistics
_EVAL_TEXT = " ".join(f"w{i:02d}" for i in range(42))


def _edited_every(text: str, k: int) -> str:
    """Substitute every k-th word (1-based) — breaks every window of
    length >= k while most short grams survive."""
    w = text.split()
    return " ".join(
        f"sub{i}" if (i + 1) % k == 0 else x for i, x in enumerate(w)
    )


def test_fuzzy_catches_edit_exact_misses(spark):
    """Substituting every 7th word leaves no shared 8-gram (max kept
    run = 6) so exact decontamination reports NOTHING — but ~57% of
    word-3-grams survive, so the fuzzy probe flags the leak."""
    ev = spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, t string")
    train = spark.createDataFrame(
        [
            (100, _edited_every(_EVAL_TEXT, 7)),  # the edited leak
            (101, " ".join(f"zz{i}" for i in range(40))),  # unrelated
        ],
        "doc_id long, t string",
    )

    exact = contamination_hits(train, ev, n=8).collect()
    assert exact == [], f"exact decontam should miss the edit: {exact}"

    hits = fuzzy_contamination_hits(
        train, ev, DedupConfig(), threshold=0.35, n=3
    ).collect()
    assert [r["doc_id"] for r in hits] == [100]
    assert hits[0]["n_eval_matches"] == 1
    assert 0.35 <= hits[0]["max_jac"] < 0.75


def test_fuzzy_verbatim_leak_scores_one(spark):
    ev = spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, t string")
    train = spark.createDataFrame(
        [(200, _EVAL_TEXT)], "doc_id long, t string"
    )
    hits = fuzzy_contamination_hits(
        train, ev, DedupConfig(), threshold=0.8, n=3
    ).collect()
    assert len(hits) == 1
    assert hits[0]["max_jac"] == 1.0


def test_fuzzy_clean_corpus_empty(spark):
    ev = spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, t string")
    train = spark.createDataFrame(
        [(300, " ".join(f"qq{i}" for i in range(50)))],
        "doc_id long, t string",
    )
    assert (
        fuzzy_contamination_hits(train, ev, DedupConfig(), 0.35, 3).count()
        == 0
    )


def test_fuzzy_plan_no_cartesian(spark):
    """Candidate generation is a band-key equi-join with the eval side
    broadcast; verification joins are bounded equi-joins — the plan
    must never fall back to pair enumeration."""
    ev = spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, t string")
    train = spark.createDataFrame(
        [(100, _edited_every(_EVAL_TEXT, 7))], "doc_id long, t string"
    )
    import contextlib
    import io

    df = fuzzy_contamination_hits(train, ev, DedupConfig(), 0.35, 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_coverage_interval_union_planted(spark):
    """contamination_coverage on hand-built docs with KNOWN coverage:
    one matching window covers exactly n tokens; two overlapping
    windows union (not sum); a full leak covers everything; clean docs
    emit nothing."""
    from file_dedup_rust_spark.operators.decontaminate import (
        contamination_coverage,
    )

    ev_words = [f"e{i}" for i in range(12)]           # 12-token eval doc
    ev = spark.createDataFrame(
        [(1, " ".join(ev_words))], "doc_id long, t string"
    )
    filler = [f"f{i}" for i in range(20)]
    docs = [
        # one 8-gram graft at the front: covers tokens 1..8 of 28
        (10, " ".join(ev_words[:8] + filler)),
        # 9-token graft = two overlapping matching windows (i=1,2):
        # union covers 9 tokens, not 16
        (11, " ".join(ev_words[:9] + filler)),
        # the full eval doc leaked verbatim: 5 windows, 12/12 covered
        (12, " ".join(ev_words)),
        # clean doc: no row
        (13, " ".join(filler + ["z1", "z2", "z3"])),
    ]
    train = spark.createDataFrame(docs, "doc_id long, t string")
    got = {
        r["doc_id"]: r
        for r in contamination_coverage(train, ev, 8).collect()
    }
    assert set(got) == {10, 11, 12}
    assert got[10]["matched_grams"] == 1
    assert got[10]["covered_tokens"] == 8
    assert got[11]["matched_grams"] == 2
    assert got[11]["covered_tokens"] == 9          # union, not 16
    assert got[12]["matched_grams"] == 5
    assert got[12]["covered_tokens"] == 12
    assert got[12]["covered_frac"] == 1.0


def test_redact_surgical_planted(spark):
    # clean doc with one eval 8-gram grafted mid-document: redact must
    # excise exactly the covered window and keep everything else in
    # order; a fully-leaked doc must route to 'drop' with NULL text
    from file_dedup_rust_spark.operators.decontaminate import (
        contamination_coverage,
        redact_contaminated,
    )

    ev_toks = [f"e{i}" for i in range(8)]
    ev = spark.createDataFrame(
        [(1, " ".join(ev_toks))], "doc_id long, t string"
    )
    pre = [f"p{i}" for i in range(10)]
    post = [f"q{i}" for i in range(10)]
    train = spark.createDataFrame(
        [
            (10, " ".join(pre + ev_toks + post)),  # partial -> redact
            (11, " ".join(ev_toks)),               # total -> drop
            (12, " ".join(pre + post)),            # clean -> absent
        ],
        "doc_id long, t string",
    )
    out = {r.doc_id: r for r in redact_contaminated(train, ev, 8).collect()}
    assert set(out) == {10, 11}
    r10 = out[10]
    assert r10.action == "redact"
    assert r10.covered_tokens == 8
    assert r10.redacted_text == " ".join(pre + post)
    r11 = out[11]
    assert r11.action == "drop"
    assert r11.redacted_text is None
    assert r11.covered_frac == 1.0

    # covered_tokens equality across the two independent derivations:
    # interval-union aggregate (coverage) vs kept-token mask (redact)
    cov = {
        r.doc_id: r.covered_tokens
        for r in contamination_coverage(train, ev, 8).collect()
    }
    assert cov == {d: out[d].covered_tokens for d in out}


def test_redact_mask_matches_coverage_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.decontaminate import (
        contamination_coverage,
        redact_contaminated,
    )

    tok = st.sampled_from(list("abcde"))

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(tok, min_size=8, max_size=12),
        st.lists(st.lists(tok, min_size=8, max_size=30), min_size=1, max_size=4),
    )
    def run(ev_toks, train_toks):
        ev = spark.createDataFrame(
            [(1, " ".join(ev_toks))], "doc_id long, t string"
        )
        train = spark.createDataFrame(
            [(i, " ".join(ts)) for i, ts in enumerate(train_toks)],
            "doc_id long, t string",
        )
        cov = {
            r.doc_id: r.covered_tokens
            for r in contamination_coverage(train, ev, 8).collect()
        }
        red = {
            r.doc_id: r for r in redact_contaminated(train, ev, 8).collect()
        }
        assert set(cov) == set(red)
        for d, r in red.items():
            assert cov[d] == r.covered_tokens
            if r.action == "redact":
                # kept + covered partitions the doc
                assert len(r.redacted_text.split(" ")) == (
                    r.n_tokens - r.covered_tokens
                )

    run()
