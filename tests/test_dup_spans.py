from __future__ import annotations

from collections import Counter

from file_dedup_rust_spark.operators.dup_spans import dup_span_stats


def _brute(docs: dict[int, str], l: int) -> dict[int, dict]:
    grams: dict[int, list[tuple[int, str]]] = {}
    census: Counter = Counter()
    for did, t in docs.items():
        w = t.split(" ")
        g = [(i + 1, " ".join(w[i : i + l])) for i in range(len(w) - l + 1)]
        grams[did] = g
        census.update(s for _, s in g)
    out = {}
    for did, t in docs.items():
        w = t.split(" ")
        g = grams[did]
        if not g:
            continue
        dup_pos = [i for i, s in g if census[s] > 1]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + l))
        out[did] = {
            "n_tokens": len(w),
            "n_grams": len(g),
            "dup_grams": len(dup_pos),
            "covered_tokens": len(covered),
        }
    return out


def test_dup_span_stats_matches_bruteforce(spark):
    shared = "the cat sat on the mat by the red door"  # 10 tokens
    docs = {
        1: shared + " and slept all afternoon quietly",
        2: "yesterday i saw that " + shared,
        3: "completely unrelated words with no overlap at all here today",
        4: "too short for grams",  # < 8 tokens -> omitted
        5: "x y " + shared + " x y " + shared,  # within-doc repeat
    }
    df = dup_span_stats(
        spark.createDataFrame(list(docs.items()), "doc_id long, t string"), l=8
    )
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    want = _brute(docs, 8)
    assert set(got) == set(want)
    for did, w in want.items():
        for k, v in w.items():
            assert got[did][k] == v, (did, k, got[did], w)
        assert got[did]["dup_fraction"] == round(w["dup_grams"] / w["n_grams"], 4)
        assert got[did]["covered_frac"] == round(
            w["covered_tokens"] / w["n_tokens"], 4
        )
    # doc 3 shares no 8-gram with anything: zero coverage
    assert got[3]["dup_grams"] == 0 and got[3]["covered_tokens"] == 0
    # doc 5 repeats a span internally: its copies are duplicated even
    # if no other doc matched them
    assert got[5]["dup_grams"] > 0


def test_dup_span_stats_property_random_corpora(spark):
    """Randomized corpora (tiny vocab forces heavy gram collisions,
    within-doc and cross-doc) against the brute-force reference."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    l = 3
    for trial in range(4):
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
            for i in range(12)
        }
        df = dup_span_stats(
            spark.createDataFrame(list(docs.items()), "doc_id long, t string"),
            l=l,
        )
        got = {r["doc_id"]: r.asDict() for r in df.collect()}
        want = _brute(docs, l)
        assert set(got) == set(want), trial
        for did, w in want.items():
            for k, v in w.items():
                assert got[did][k] == v, (trial, did, k, got[did], w)


def test_dup_span_interval_union_handles_gaps(spark):
    # two disjoint duplicated spans inside one long doc: coverage is
    # the union, not 2*l blindly, and not merged across the gap
    span_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    span_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    filler = " ".join(f"f{i}" for i in range(10))
    docs = {
        1: f"{span_a} {filler} {span_b}",
        2: span_a,
        3: span_b,
    }
    df = dup_span_stats(
        spark.createDataFrame(list(docs.items()), "doc_id long, t string"), l=8
    )
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert got[1]["covered_tokens"] == 16  # 8 + 8, gap untouched
    assert got[2]["covered_tokens"] == 8 and got[3]["covered_tokens"] == 8


def _brute_blocks(docs: dict[int, str], l: int) -> dict[int, dict]:
    import hashlib

    blocks: dict[int, list[str]] = {}
    first: dict[str, tuple[int, int]] = {}
    for did in sorted(docs):
        w = docs[did].split(" ")
        bs = [" ".join(w[i : i + l]) for i in range(0, len(w), l)]
        blocks[did] = bs
        for idx, b in enumerate(bs):
            first.setdefault(b, (did, idx))
    out = {}
    for did, bs in blocks.items():
        kept = [b for i, b in enumerate(bs) if first[b] == (did, i)]
        txt = " ".join(kept)
        out[did] = {
            "n_blocks": len(bs),
            "n_dropped": len(bs) - len(kept),
            "kept_tokens": sum(len(b.split(" ")) for b in kept),
            "kept_sha": hashlib.sha256(txt.encode()).hexdigest(),
        }
    return out


def test_dedup_blocks_matches_bruteforce(spark):
    from file_dedup_rust_spark.operators.dup_spans import dedup_blocks

    shared = "the cat sat on the mat by th"  # exactly one 8-token block
    docs = {
        1: shared,
        2: shared + " plus eight more trailing words here now ok",
        3: "totally distinct words that no other document carries at all",
        5: shared + " " + shared,  # within-doc repeated block
    }
    df = dedup_blocks(
        spark.createDataFrame(list(docs.items()), "doc_id long, t string"), l=8
    )
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    want = _brute_blocks(docs, 8)
    assert set(got) == set(want)
    for did, w in want.items():
        for k, v in w.items():
            assert got[did][k] == v, (did, k, got[did], w)
    # doc 1 owns the shared block (smallest doc_id); docs 2/5 drop it
    assert got[1]["n_dropped"] == 0
    assert got[2]["n_dropped"] == 1
    # doc 5 = the shared 8-token block twice; both copies lose to
    # doc 1, leaving an empty doc (kept_sha = sha256(''))
    assert got[5]["n_dropped"] == 2 and got[5]["kept_tokens"] == 0


def test_dedup_blocks_property_random_corpora(spark):
    """Randomized tiny-vocab corpora (heavy block collisions, ragged
    tails, empty-after-dedup docs) against the brute-force reference."""
    import random

    from file_dedup_rust_spark.operators.dup_spans import dedup_blocks

    rng = random.Random(11)
    vocab = ["a", "b", "c"]
    l = 3
    for trial in range(4):
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20)))
            for i in range(14)
        }
        df = dedup_blocks(
            spark.createDataFrame(list(docs.items()), "doc_id long, t string"),
            l=l,
        )
        got = {r["doc_id"]: r.asDict() for r in df.collect()}
        want = _brute_blocks(docs, l)
        assert set(got) == set(want), trial
        for did, w in want.items():
            for k, v in w.items():
                assert got[did][k] == v, (trial, did, k, got[did], w)


def _brute_boiler(docs: dict[int, str], l: int, min_docs: int) -> dict:
    """Plain-Python reference for prune_boilerplate."""
    import hashlib

    blocks = {
        did: [
            " ".join(t.split(" ")[i : i + l])
            for i in range(0, len(t.split(" ")), l)
        ]
        for did, t in docs.items()
    }
    dfreq: dict[str, set[int]] = {}
    for did, bs in blocks.items():
        for b in bs:
            dfreq.setdefault(b, set()).add(did)
    out = {}
    for did, bs in blocks.items():
        kept = [b for b in bs if len(dfreq[b]) < min_docs]
        txt = " ".join(kept)
        out[did] = {
            "n_blocks": len(bs),
            "n_boiler": len(bs) - len(kept),
            "kept_tokens": sum(len(b.split(" ")) for b in kept),
            "kept_sha": hashlib.sha256(txt.encode()).hexdigest(),
        }
    return out


def test_prune_boilerplate_drops_all_occurrences(spark):
    """Unlike dedup_blocks (first occurrence survives), the frequency
    rule removes EVERY copy of a cross-doc block — including from the
    doc that had it first — and leaves within-doc repeats alone."""
    import hashlib

    from file_dedup_rust_spark.operators.dup_spans import prune_boilerplate

    shared = "the cat sat on the mat by th"  # exactly one 8-token block
    docs = {
        1: shared,
        2: shared + " plus eight more trailing words here now ok",
        3: "totally distinct words that no other document carries at all",
        5: "solo words repeated here in one doc now yes " * 2,
    }
    docs[5] = docs[5].strip()
    df = prune_boilerplate(
        spark.createDataFrame(list(docs.items()), "doc_id long, t string"),
        l=8, min_docs=2,
    )
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    want = _brute_boiler(docs, 8, 2)
    assert set(got) == set(want)
    for did, w in want.items():
        for k, v in w.items():
            assert got[did][k] == v, (did, k, got[did], w)
    # the shared block dies in BOTH docs 1 and 2 (doc 1 kept nothing)
    assert got[1]["n_boiler"] == 1 and got[1]["kept_tokens"] == 0
    assert got[1]["kept_sha"] == hashlib.sha256(b"").hexdigest()
    assert got[2]["n_boiler"] == 1 and got[2]["kept_tokens"] == 8
    # within-doc repetition is NOT boilerplate under the distinct-doc rule
    assert got[5]["n_boiler"] == 0


def test_prune_boilerplate_property_random_corpora(spark):
    import random

    from file_dedup_rust_spark.operators.dup_spans import prune_boilerplate

    rng = random.Random(23)
    vocab = ["a", "b", "c"]
    l = 3
    for trial in range(4):
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20)))
            for i in range(14)
        }
        min_docs = 2 + trial % 2
        df = prune_boilerplate(
            spark.createDataFrame(list(docs.items()), "doc_id long, t string"),
            l=l, min_docs=min_docs,
        )
        got = {r["doc_id"]: r.asDict() for r in df.collect()}
        want = _brute_boiler(docs, l, min_docs)
        assert set(got) == set(want), trial
        for did, w in want.items():
            for k, v in w.items():
                assert got[did][k] == v, (trial, did, k, got[did], w)


def test_covered_tokens_expr_matches_python_interval_union(spark):
    """Property: the JVM aggregate equals a plain-Python interval
    union of [i, i+L) windows for random sorted position lists."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.dup_spans import (
        covered_tokens_expr,
    )
    import pyspark.sql.functions as F

    L = 8

    def py_union(dps):
        covered = set()
        for i in dps:
            covered.update(range(i, i + L))
        return len(covered)

    @given(
        st.lists(
            st.lists(st.integers(1, 60), min_size=0, max_size=25),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=15, deadline=None)
    def check(cases):
        rows = [(k, sorted(set(c))) for k, c in enumerate(cases)]
        df = spark.createDataFrame(rows, "k long, dps array<int>")
        got = {
            r["k"]: r["cov"]
            for r in df.select(
                "k", covered_tokens_expr(L).alias("cov")
            ).collect()
        }
        for k, dps in rows:
            assert got[k] == py_union(dps), (dps, got[k])

    check()
