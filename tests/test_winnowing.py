"""Winnowing fingerprint tier (operators/winnowing.py) vs a pure-Python
reference implementation of Schleimer et al. 2003, plus the scheme's
two published properties: window coverage (every w-window selects) and
the match guarantee (shared runs >= w + k - 1 tokens share a
fingerprint)."""

from __future__ import annotations

import hashlib

from file_dedup_rust_spark.operators.winnowing import (
    WINNOW_K,
    WINNOW_W,
    winnow_census,
    winnow_matches,
    winnow_select,
)

_POS_BASE = 1_000_000_000


def _py_winnow(tokens: list[str], k: int, w: int) -> set[str]:
    """Reference selection: for each window of w consecutive gram sort
    keys (clipped at the end like a window frame), pick the minimum;
    the composite key encodes (md5 asc, pos desc) so min = rightmost
    minimal hash."""
    n = len(tokens) - k + 1
    if n < 1:
        return set()
    keys = []
    for i in range(1, n + 1):
        h = hashlib.md5(" ".join(tokens[i - 1 : i - 1 + k]).encode()).hexdigest()
        keys.append(f"{h}#{_POS_BASE - i:010d}")
    last_start = max(n - w + 1, 1)
    return {min(keys[s - 1 : s - 1 + w]) for s in range(1, last_start + 1)}


def _spark_sel(spark, docs: dict[int, str], k: int, w: int) -> dict[int, set[str]]:
    df = spark.createDataFrame(list(docs.items()), "doc_id long, t string")
    rows = winnow_select(df, k, w).collect()
    out: dict[int, set[str]] = {}
    for r in rows:
        out.setdefault(r.doc_id, set()).add(r.sel)
    return out


def test_selection_matches_python_reference(spark):
    docs = {
        1: "the cat sat on the mat by the red door and slept",
        2: "a b c d e f g h i j k l m n",
        3: "one two three",  # 3 tokens < k: no grams, no fingerprints
        4: "x x x x x x x x x x",  # all-identical grams: tie-breaks bind
        5: "p q r s t",  # 2 grams < w: single clipped window
    }
    got = _spark_sel(spark, docs, WINNOW_K, WINNOW_W)
    for did, t in docs.items():
        want = _py_winnow(t.split(" "), WINNOW_K, WINNOW_W)
        assert got.get(did, set()) == want, did


def test_property_selection_and_coverage(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.sampled_from(list("abcdefgh"))  # small alphabet: many ties

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.lists(tok, min_size=1, max_size=40), min_size=1, max_size=6))
    def run(doc_toks):
        docs = {i: " ".join(ts) for i, ts in enumerate(doc_toks)}
        got = _spark_sel(spark, docs, WINNOW_K, WINNOW_W)
        for did, ts in enumerate(doc_toks):
            want = _py_winnow(ts, WINNOW_K, WINNOW_W)
            assert got.get(did, set()) == want
            # window coverage: selections at a and b with b - a > w
            # would leave the window starting at a+1 empty — so
            # consecutive selected positions are at most w apart
            pos = sorted(
                _POS_BASE - int(s.split("#")[1]) for s in want
            )
            assert all(b - a <= WINNOW_W for a, b in zip(pos, pos[1:]))

    run()


def test_match_guarantee_and_census(spark):
    # docs 1 and 2 share three disjoint runs of w + k - 1 = 8 tokens;
    # the guarantee promises >= 1 shared fingerprint per run, so the
    # pair must clear min_shared = 3.  Doc 3 shares nothing.
    runs = [
        "r1a r1b r1c r1d r1e r1f r1g r1h",
        "r2a r2b r2c r2d r2e r2f r2g r2h",
        "r3a r3b r3c r3d r3e r3f r3g r3h",
    ]
    docs = {
        1: " ".join([runs[0], "u1 u2 u3 u4 u5", runs[1], "u6 u7 u8 u9 u0", runs[2]]),
        2: " ".join([runs[2], "v1 v2 v3 v4 v5", runs[0], "v6 v7 v8 v9 v0", runs[1]]),
        3: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w0 wa wb wc wd we wf",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, t string")
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps for r in winnow_matches(df).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert all(p == (1, 2) for p in pairs)

    # census: density and checksum agree with the reference selection
    cen = {r.doc_id: r for r in winnow_census(df).collect()}
    for did, t in docs.items():
        want = sorted(_py_winnow(t.split(" "), WINNOW_K, WINNOW_W))
        assert cen[did].n_fps == len(want)
        assert cen[did].fp_checksum == hashlib.md5(
            ",".join(want).encode()
        ).hexdigest()
