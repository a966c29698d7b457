from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import hashing as H
from file_dedup_rust_spark.functions import text as TX

CFG = DedupConfig()


def test_splitmix_deterministic():
    a = H.splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    b = H.splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 3


def test_kgram_hashes_shift_invariant():
    # same k-gram hashes regardless of position
    h1 = H.kgram_hashes(b"abcdefgh", 5)
    h2 = H.kgram_hashes(b"XXabcdefgh", 5)
    assert set(h1.tolist()) <= set(h2.tolist())


def test_kgram_short_input():
    assert H.kgram_hashes(b"ab", 5).size == 0


def test_minhash_jaccard_estimate():
    # MinHash lane agreement approximates true Jaccard
    rng = np.random.default_rng(7)
    a_set = rng.integers(0, 2**63, 400, dtype=np.uint64)
    # 80% overlap
    b_set = np.concatenate([a_set[:320], rng.integers(0, 2**63, 80, dtype=np.uint64)])
    a, b = H.minhash_params(CFG.minhash_seed, 256)
    sa = H.minhash_signature(a_set, a, b)
    sb = H.minhash_signature(b_set, a, b)
    true_j = len(set(a_set.tolist()) & set(b_set.tolist())) / len(
        set(a_set.tolist()) | set(b_set.tolist())
    )
    est = float(np.mean(sa == sb))
    assert abs(est - true_j) < 0.1


def test_minhash_identical_inputs_identical_sig():
    a, b = H.minhash_params(CFG.minhash_seed, CFG.num_perm)
    s = np.array([5, 6, 7], dtype=np.uint64)
    assert np.array_equal(H.minhash_signature(s, a, b), H.minhash_signature(s, a, b))


def test_minhash_empty():
    a, b = H.minhash_params(CFG.minhash_seed, CFG.num_perm)
    sig = H.minhash_signature(np.empty(0, dtype=np.uint64), a, b)
    assert (sig == -1).all()


def test_band_hashes_band_position_matters():
    a, b = H.minhash_params(CFG.minhash_seed, CFG.num_perm)
    sig = H.minhash_signature(np.arange(100, dtype=np.uint64), a, b)
    bands = H.band_hashes(sig, CFG.lsh_bands, CFG.lsh_rows)
    assert bands.shape == (CFG.lsh_bands,)
    # identical row values in different bands must not collide
    flat = np.zeros(CFG.num_perm, dtype=np.int64)
    bands0 = H.band_hashes(flat, CFG.lsh_bands, CFG.lsh_rows)
    assert len(set(bands0.tolist())) == CFG.lsh_bands


def test_winnow_substring_guarantee():
    # any shared substring of length >= w + k - 1 shares a fingerprint
    rng = np.random.default_rng(3)
    alphabet = b"abcdefghijklmnopqrstuvwxyz "
    inner = bytes(rng.choice(list(alphabet), 60).tolist())
    prefix = bytes(rng.choice(list(alphabet), 37).tolist())
    suffix = bytes(rng.choice(list(alphabet), 41).tolist())
    k, w = CFG.winnow_k, CFG.winnow_w
    assert len(inner) >= w + k - 1
    fa = set(H.winnow_fingerprints(inner, k, w).tolist())
    fb = set(H.winnow_fingerprints(prefix + inner + suffix, k, w).tolist())
    assert fa & fb


def test_transcript_normalization():
    assert TX.normalize_transcript("  Hello\t WORLD \n") == b"hello world"
    assert TX.normalize_transcript(None) == b""


def test_jaccard_self_is_one():
    t = "the quick brown fox jumps over the lazy dog repeatedly today"
    assert TX.jaccard(t, t, CFG) == 1.0
    assert TX.jaccard(t, "completely different words here", CFG) < 0.2


def test_batch_transcript_parity():
    """The cross-row vectorized batch path (one concatenated buffer +
    reduceat) must be bit-identical to the per-row definition on every
    edge case: None, empty, shorter than k, exactly k, below/above the
    winnow window, long texts, duplicates."""
    import numpy as np

    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.functions import text as TX

    cfg = DedupConfig()
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        None, "", "ab", "abcde", "abcdef",
        "  Mixed   CASE   and   spaces  ",
        "abcdefghijklmnopqrstuvwxyz0123",   # just below winnow guarantee
        "abcdefghijklmnopqrstuvwxyz01234",  # at the guarantee boundary
    ]
    for _ in range(40):
        n_words = int(rng.integers(1, 60))
        texts.append(" ".join(rng.choice(vocab, n_words).tolist()))
    texts.append(texts[-1])  # exact duplicate rows

    norms = [TX.normalize_transcript(t) for t in texts]
    sigs, bands, fps = TX.batch_transcript_features(norms, cfg)
    for i, t in enumerate(texts):
        ref_sig = TX.transcript_minhash(t, cfg)
        assert np.array_equal(sigs[i], ref_sig), f"minhash mismatch row {i}"
        if ref_sig[0] >= 0:
            assert np.array_equal(bands[i], TX.minhash_bands(ref_sig, cfg)), i
        ref_fps = TX.transcript_fingerprints(t, cfg)
        assert np.array_equal(fps[i], ref_fps), f"fps mismatch row {i}"


def test_batch_transcript_parity_hypothesis():
    """Property form of the batch/per-row parity: arbitrary unicode
    (surrogate-free) transcripts, any batch composition — the grouped
    vectorized path must match the scalar definition bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from file_dedup_rust_spark.config import DedupConfig
    from file_dedup_rust_spark.functions import text as TX

    cfg = DedupConfig()

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.text(max_size=150),
                st.text(alphabet="ab ", max_size=400),  # dup-heavy shingles
            ),
            min_size=1,
            max_size=12,
        )
    )
    def run(texts):
        norms = [TX.normalize_transcript(t) for t in texts]
        sigs, bands, fps = TX.batch_transcript_features(norms, cfg)
        for i, t in enumerate(texts):
            ref = TX.transcript_minhash(t, cfg)
            assert np.array_equal(sigs[i], ref)
            if ref[0] >= 0:
                assert np.array_equal(bands[i], TX.minhash_bands(ref, cfg))
            assert np.array_equal(fps[i], TX.transcript_fingerprints(t, cfg))

    run()


def test_stratified_sample_partition_invariant(spark):
    """The deterministic sampler must keep the SAME rows under any
    partitioning (the property df.sample() lacks), and land near the
    configured per-stratum rates."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import stratified_sample

    base = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("other").alias("s"),
    )
    rates = {"en": 800}
    kept1 = stratified_sample(base.repartition(3), "k", "s", rates, 250)
    kept2 = stratified_sample(base.repartition(17, "s"), "k", "s", rates, 250)
    ids1 = sorted(r["k"] for r in kept1.collect())
    ids2 = sorted(r["k"] for r in kept2.collect())
    assert ids1 == ids2
    n_en = sum(1 for r in kept1.collect() if r["s"] == "en")
    n_other = len(ids1) - n_en
    # ~6,667 en rows at 80%, ~13,333 other at 25%
    assert abs(n_en / 6667 - 0.8) < 0.05
    assert abs(n_other / 13333 - 0.25) < 0.05


def test_word_ngrams_property_vs_python(spark):
    """Property test: the JVM transform/sequence n-gram expression in
    operators.decontaminate must match the plain-Python sliding-window
    definition on arbitrary space-separated text (including empty
    tokens from repeated spaces), for several n."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.decontaminate import word_ngrams

    def ref(t: str, n: int) -> set[str]:
        w = t.split(" ")
        if len(w) < n:
            return set()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.text(alphabet="ab x", max_size=60), min_size=1, max_size=6),
        st.integers(min_value=2, max_value=9),
    )
    def run(texts, n):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, t string"
        )
        got: dict[int, set] = {i: set() for i in range(len(texts))}
        for r in word_ngrams(df, n).collect():
            got[r["doc_id"]].add(r["g"])
        for i, t in enumerate(texts):
            assert got[i] == ref(t, n), (t, n)

    run()


def test_sample_bucket_matches_python(spark):
    """sample_bucket must equal the arithmetic definition
    (key * KNUTH) % 2^32 % 1000 — the contract the DuckDB oracle and
    any other engine reimplements."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import (
        KNUTH_MULT,
        sample_bucket,
    )

    keys = [0, 1, 2, 999, 123_457, 9_999_991, 3_000_000_000]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", sample_bucket(F.col("k")).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == (k * KNUTH_MULT) % (2**32) % 1000


def test_group_safe_split_invariants(spark):
    """No group straddles the split; the decision is partition- and
    arrival-order-invariant; the held-out share of GROUPS lands near
    the configured rate."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import group_safe_split

    # 10k rows in 2.5k groups of 4 (ids interleaved so group members
    # are scattered across partitions)
    base = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 2_500).alias("g")
    )
    out1 = group_safe_split(base.repartition(7), "k", "g", 100)
    out2 = group_safe_split(base.repartition(13, "g"), "k", "g", 100)
    rows1 = sorted((r["k"], r["group_rep"], r["split"]) for r in out1.collect())
    rows2 = sorted((r["k"], r["group_rep"], r["split"]) for r in out2.collect())
    assert rows1 == rows2
    by_group: dict[int, set[str]] = {}
    for k, rep, split in rows1:
        by_group.setdefault(rep, set()).add(split)
        assert rep == k % 2_500  # min member is the group id here
    assert all(len(s) == 1 for s in by_group.values())  # no straddling
    held = sum(1 for s in by_group.values() if s == {"held_out"})
    assert abs(held / 2_500 - 0.10) < 0.03


def test_group_safe_split_neardup_clusters(spark):
    """The near-dup composition: split by the PIPELINE's cluster ids so
    near-duplicates (not just byte-identical rows) never straddle the
    boundary — singleton docs split independently."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import group_safe_split

    # fabricated cluster assignment table of the pipeline's shape:
    # (clip_id, cluster_id), singletons carry their own id
    rows = [(i, i // 3 * 3 if i < 60 else i) for i in range(100)]
    asg = spark.createDataFrame(rows, "clip_id long, cluster_id long")
    out = group_safe_split(asg, "clip_id", "cluster_id", 200).collect()
    by_cluster: dict[int, set[str]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # group_rep must equal the cluster's min clip_id
    for r in out:
        assert r["group_rep"] == min(
            k for k, c in rows if c == r["cluster_id"]
        )


def test_mixture_rates_realizes_target_mix(spark):
    """The binding stratum keeps rate exactly 1.0; applying the rates
    through stratified_sample yields the target token mix (within
    bucket-quantization noise); no stratum is upsampled."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import (
        mixture_rates,
        stratified_sample,
    )

    base = spark.range(0, 30_000).select(
        F.col("id").alias("k"),
        # 2/3 of rows (and tokens) are 'web', 1/3 'code'
        F.when(F.col("id") % 3 < 2, "web").otherwise("code").alias("s"),
        F.lit(100).cast("long").alias("tok"),
    )
    target = {"web": 500, "code": 500}  # want 50/50, have 67/33
    rates = {
        r["s"]: r.asDict()
        for r in mixture_rates(base, "s", "tok", target).collect()
    }
    assert set(rates) == {"web", "code"}
    # code is binding (scarcer than its target): rate exactly 1.0
    assert rates["code"]["sample_rate"] == 1.0
    assert 0.49 < rates["web"]["sample_rate"] < 0.51
    assert rates["web"]["natural_pm"] == 666
    # apply and measure the realized mix
    pm = {s: int(1000 * r["sample_rate"]) for s, r in rates.items()}
    kept = stratified_sample(base, "k", "s", pm, 0)
    mix = {
        r["s"]: r["n"]
        for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    share_web = mix["web"] / (mix["web"] + mix["code"])
    assert abs(share_web - 0.5) < 0.02
    # zero-target stratum -> rate 0.0 (dropped from the mix)
    rates2 = {
        r["s"]: r["sample_rate"]
        for r in mixture_rates(base, "s", "tok", {"code": 1000}).collect()
    }
    assert rates2["web"] == 0.0 and rates2["code"] == 1.0


def test_group_safe_split_string_keys(spark):
    """The pipeline's cluster ids are STRINGS (min clip_id of the
    component): the split folds them through xxhash64 under the ANSI
    overflow bound, stays group-consistent, partition-invariant, and
    lands near the configured rate."""
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import group_safe_split

    base = spark.range(0, 9_000).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("k"),
        F.concat(F.lit("clip-"), (F.col("id") % 3_000)).alias("g"),
    )
    out1 = group_safe_split(base.repartition(5), "k", "g", 250)
    out2 = group_safe_split(base.repartition(11, "g"), "k", "g", 250)
    rows1 = sorted((r["k"], r["group_rep"], r["split"]) for r in out1.collect())
    assert rows1 == sorted(
        (r["k"], r["group_rep"], r["split"]) for r in out2.collect()
    )
    by_group: dict[str, set[str]] = {}
    for _, rep, split in rows1:
        by_group.setdefault(rep, set()).add(split)
    assert all(len(s) == 1 for s in by_group.values())
    held = sum(1 for s in by_group.values() if s == {"held_out"})
    assert abs(held / 3_000 - 0.25) < 0.05


def test_value_conflicts_property_vs_python(spark):
    """Property test: value_conflicts matches a plain-Python majority
    count on arbitrary tiny-domain (key, val) multisets — heavy ties,
    singleton keys, unanimous groups, empty-string values."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.conflicts import value_conflicts

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.sampled_from(["", "a", "b", "ab"]),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=12, deadline=None)
    @given(rows_strategy)
    def run(rows):
        df = spark.createDataFrame(
            [(k, v) for k, v in rows], "h long, v string"
        )
        got = {
            r["h"]: (r["n_rows"], r["n_variants"], r["majority_val"],
                     r["majority_n"])
            for r in value_conflicts(df, "h", "v").collect()
        }
        want = {}
        by_key: dict[int, Counter] = {}
        for k, v in rows:
            by_key.setdefault(k, Counter())[v] += 1
        for k, cnt in by_key.items():
            if len(cnt) < 2:
                continue
            # max count, ties to smallest value
            maj_v = min(cnt, key=lambda v: (-cnt[v], v))
            want[k] = (sum(cnt.values()), len(cnt), maj_v, cnt[maj_v])
        assert got == want

    run()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_medoid_repair_property_vs_python(spark):
    """Property test: medoid_repair matches a plain-Python
    multiplicity-weighted medoid on arbitrary tiny-domain multisets —
    ties on cost fall to the smallest value, unanimous and singleton
    keys never appear."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.conflicts import medoid_repair

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["", "a", "b", "ab", "ba", "abc"]),
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=10, deadline=None)
    @given(rows_strategy)
    def run(rows):
        df = spark.createDataFrame(
            [(k, v) for k, v in rows], "h long, v string"
        )
        got = {
            r["h"]: (r["n_rows"], r["n_variants"], r["medoid_val"],
                     r["medoid_cost"])
            for r in medoid_repair(df, "h", "v").collect()
        }
        want = {}
        by_key: dict[int, Counter] = {}
        for k, v in rows:
            by_key.setdefault(k, Counter())[v] += 1
        for k, cnt in by_key.items():
            if len(cnt) < 2:
                continue
            costs = {
                v: sum(c * _lev(v, w) for w, c in cnt.items())
                for v in cnt
            }
            med = min(costs, key=lambda v: (costs[v], v))
            want[k] = (sum(cnt.values()), len(cnt), med, costs[med])
        assert got == want

    run()


def test_medoid_repair_variant_cap_counted_not_silent(spark):
    """A hot key with more variants than variant_cap is EXCLUDED from
    the pairwise stage (its cost would be quadratic) and surfaced by
    oversize_groups — the capped+counted convention."""
    from file_dedup_rust_spark.operators.conflicts import (
        medoid_repair,
        oversize_groups,
    )

    rows = [(1, f"v{i:03d}") for i in range(20)]          # hot: 20 variants
    rows += [(2, "aa"), (2, "ab"), (2, "aa")]             # normal group
    df = spark.createDataFrame(rows, "h long, v string")
    out = medoid_repair(df, "h", "v", variant_cap=8).collect()
    assert [r["h"] for r in out] == [2]
    assert out[0]["medoid_val"] == "aa"
    over = oversize_groups(df, "h", "v", variant_cap=8).collect()
    assert len(over) == 1 and over[0]["h"] == 1
    assert over[0]["n_variants"] == 20 and over[0]["n_rows"] == 20


def test_stratified_take_k_exact_and_salt_invariant(spark):
    """The salted two-stage draw equals the naive one-window rank for
    any n_salt, returns the whole stratum when it is smaller than k,
    and is invariant to input partitioning."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from file_dedup_rust_spark.functions.sampling import (
        KNUTH_MULT,
        _MOD,
        stratified_take_k,
    )

    rows = [(i, "big" if i % 7 else "tiny") for i in range(200)]
    tiny_n = sum(1 for _, s in rows if s == "tiny")
    assert tiny_n < 50
    df = spark.createDataFrame(rows, "doc_id long, s string")

    perm = F.pmod(F.col("doc_id") * F.lit(KNUTH_MULT), F.lit(_MOD))
    naive = (
        df.withColumn(
            "draw_rank",
            F.row_number().over(W.partitionBy("s").orderBy(perm, "doc_id")),
        )
        .filter(F.col("draw_rank") <= 50)
    )
    want = {(r.doc_id, r.s, r.draw_rank) for r in naive.collect()}
    for n_salt in (1, 4, 32):
        got = {
            (r.doc_id, r.s, r.draw_rank)
            for r in stratified_take_k(
                df.repartition(n_salt + 3), "doc_id", "s", 50, n_salt=n_salt
            ).collect()
        }
        assert got == want
    assert sum(1 for _, s, _ in want if s == "tiny") == tiny_n


def test_temperature_rates_property_vs_python(spark):
    """temperature_rates matches a plain-Python alpha-sampling
    computation on arbitrary small weighted strata — rarest stratum
    binds at exactly 1.0, shares sum to ~1."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.functions.sampling import temperature_rates

    strata = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=8, deadline=None)
    @given(strata, st.sampled_from([0.3, 0.5, 0.7, 1.0]))
    def run(rows, alpha):
        df = spark.createDataFrame(rows, "s string, w long")
        got = {
            r["s"]: (r["n_rows"], r["weight"], r["p"], r["q"],
                     r["sample_rate"])
            for r in temperature_rates(df, "s", "w", alpha).collect()
        }
        agg: dict[str, list[int]] = {}
        for s, w in rows:
            agg.setdefault(s, [0, 0])
            agg[s][0] += 1
            agg[s][1] += w
        total = sum(v[1] for v in agg.values())
        wmin = min(v[1] for v in agg.values())
        zs = sum((v[1] / total) ** alpha for v in agg.values())
        for s, (n, w) in agg.items():
            p = w / total
            want = (
                n, w, round(p, 4), round(p ** alpha / zs, 4),
                round((w / wmin) ** (alpha - 1.0), 4),
            )
            assert got[s] == want, (s, got[s], want)
        binding = min(agg, key=lambda s: (agg[s][1], s))
        assert got[binding][4] == 1.0
        assert abs(sum(v[3] for v in got.values()) - 1.0) < 1e-2

    run()


def test_novelty_scores_property_vs_python(spark):
    """novelty_scores matches a brute-force Python first-occurrence
    count on tiny-vocab corpora (heavy gram sharing, short docs
    dropping out, exact copies scoring 0)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from file_dedup_rust_spark.operators.dup_spans import novelty_scores

    word = st.sampled_from(["x", "y", "z"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=10))
    def run(texts):
        n = 3
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, t string")
        got = {
            r["doc_id"]: (r["n_grams"], r["novel_grams"],
                          r["novelty_frac"])
            for r in novelty_scores(df, n=n).collect()
        }
        grams = {}
        for i, t in rows:
            ws = t.split(" ") if t else []
            gs = {
                " ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)
            } if len(ws) >= n else set()
            grams[i] = gs
        first = {}
        for i in sorted(grams):
            for g in grams[i]:
                first.setdefault(g, i)
        want = {}
        for i, gs in grams.items():
            if not gs:
                continue
            nov = sum(1 for g in gs if first[g] == i)
            want[i] = (len(gs), nov, round(nov / len(gs), 4))
        assert got == want

    run()


def test_simhash_band_keys_batch_parity():
    """The round-6 cross-row vectorized LSH key path must be
    bit-identical to the per-row definition (the numpy oracle and the
    signature UDF consume the same keys)."""
    import numpy as np

    from file_dedup_rust_spark.config import DEFAULT_CONFIG as cfg
    from file_dedup_rust_spark.functions.audio import (
        simhash_band_keys,
        simhash_band_keys_batch,
    )

    rng = np.random.default_rng(123)
    sims = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    # include edge values
    sims[:4] = [0, -1, 2**63 - 1, -(2**63)]
    batch = simhash_band_keys_batch(sims, cfg)
    for i, s in enumerate(sims.tolist()):
        assert batch[i].tolist() == simhash_band_keys(s, cfg).tolist()
