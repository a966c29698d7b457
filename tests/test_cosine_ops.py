"""Blocked cosine backbone + hyperplane-LSH candidate path.

The blocked operators must reproduce the all-pairs semantics exactly
(they are the oracle surface for three driver-contract queries); the
LSH path must recover every pair above a realistic near-dup threshold
while generating far fewer candidates than all pairs — the n^(1+rho)
scale route the exact operator hands off to at 100x data.
"""

from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.operators.cosine import (
    cosine_pairs_blocked,
    cosine_sims_histogram,
    lsh_cosine_pairs,
)


def _planted_embeddings(spark, n=600, d=64, dup_every=6, noise=0.22, seed=7):
    """Random unit vectors; every `dup_every`-th vector gets a noisy
    near-copy (cosine ~0.92-0.98) appended — planted near-dups over an
    isotropic background (background pairwise cosine ~ N(0, 1/sqrt(d)))."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    rows = [(i, V[i].tolist()) for i in range(n)]
    for j, i in enumerate(range(0, n, dup_every)):
        g = rng.standard_normal(d)
        g /= np.linalg.norm(g)
        w = V[i] + noise * g  # unit noise direction: cos ~ 1/sqrt(1+noise^2)
        w /= np.linalg.norm(w)
        rows.append((n + j, w.tolist()))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        V,
        rows,
    )


def _numpy_pairs(rows, threshold):
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r[1]) for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(M @ M.T, 4)
    out = set()
    n = len(ids)
    iu, ju = np.triu_indices(n, 1)
    keep = S[iu, ju] >= threshold
    for a, b in zip(ids[iu[keep]], ids[ju[keep]]):
        out.add((int(min(a, b)), int(max(a, b))))
    return out


def test_blocked_pairs_match_numpy_all_pairs(spark):
    df, _, rows = _planted_embeddings(spark)
    got = {
        (r["ia"], r["ib"])
        for r in cosine_pairs_blocked(df, 0.9, block_rows=128).collect()
    }
    assert got == _numpy_pairs(rows, 0.9)
    # multi-block grid (block_rows < n forces >= 25 block pairs) agrees
    # with the single-block degenerate case
    got1 = {
        (r["ia"], r["ib"])
        for r in cosine_pairs_blocked(df, 0.9, block_rows=100000).collect()
    }
    assert got == got1


def test_blocked_histogram_is_exact_multiset(spark):
    df, _, rows = _planted_embeddings(spark, n=300)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r[1]) for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(M @ M.T, 4)
    iu, ju = np.triu_indices(len(ids), 1)
    vals, cnts = np.unique(S[iu, ju], return_counts=True)
    want = {float(v): int(c) for v, c in zip(vals, cnts)}
    got = {
        float(r["sim"]): int(r["n"])
        for r in cosine_sims_histogram(df, block_rows=64).collect()
    }
    assert got == want
    assert sum(got.values()) == len(ids) * (len(ids) - 1) // 2


def test_lsh_pairs_recover_planted_neardups(spark):
    """At threshold 0.9 with 96 bands x 12 rows the planted pairs
    (sim ~0.95+) are missed w.p. ~1e-20 each — the LSH
    path must emit the IDENTICAL pair set to the exact blocked
    operator (precision is exact by construction: candidates are
    re-ranked with the same rounded cosine)."""
    df, _, rows = _planted_embeddings(spark)
    want = _numpy_pairs(rows, 0.9)
    assert len(want) >= 80  # the planting actually planted
    got = {
        (r["ia"], r["ib"]) for r in lsh_cosine_pairs(df, 0.9).collect()
    }
    assert got == want


def test_lsh_pairs_plan_has_no_rowlevel_theta_join(spark):
    """The LSH candidate path must plan posting-list equi-joins + the
    capped grouped-pair expansion — never a row-level non-equi join of
    the embeddings table to itself."""
    import contextlib
    import io

    df, _, _ = _planted_embeddings(spark, n=120)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lsh_cosine_pairs(df, 0.9).explain("formatted")
    text = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_lsh_candidate_volume_is_subquadratic(spark):
    """The point of the LSH path: candidate pairs actually scored must
    be a small fraction of the n^2/2 all-pairs volume on isotropic
    background data (random pairs collide per band w.p. 2^-8)."""
    df, _, rows = _planted_embeddings(spark)
    n = df.count()
    all_pairs = n * (n - 1) // 2
    # count the candidates the operator would re-rank (same kernel path)
    scored = lsh_cosine_pairs(df, -1.1)  # threshold below -1 keeps all
    n_cand = scored.count()
    assert n_cand < 0.1 * all_pairs, (n_cand, all_pairs)


def test_lsh_hot_band_salting_keeps_cluster_pairs(spark):
    """ADVICE r3: a near-dup CLUSTER shares identical band keys, so a
    posting list above band_cap is exactly where true pairs live.  A
    planted 12-member clone cluster with band_cap=5 must still yield
    all C(12,2) pairs under the default salt_hot routing, while the
    drop-and-count policy (salt_hot=False) loses the whole cluster."""
    rng = np.random.default_rng(11)
    d = 64
    base = rng.standard_normal(d)
    base /= np.linalg.norm(base)
    rows = [(i, base.tolist()) for i in range(12)]  # identical clones
    for i in range(12, 60):  # isotropic background
        v = rng.standard_normal(d)
        v /= np.linalg.norm(v)
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    salted = lsh_cosine_pairs(df, 0.9, band_cap=5)
    got = {(r.ia, r.ib) for r in salted.collect()}
    want = {(a, b) for a in range(12) for b in range(a + 1, 12)}
    assert got == want

    dropped = lsh_cosine_pairs(df, 0.9, band_cap=5, salt_hot=False)
    assert dropped.count() == 0  # every band of the cluster is over-cap


def test_lsh_driver_query_plan_is_posting_join(spark):
    """The oracle-checked driver query (lsh_cosine_neardup_pairs) must
    keep the posting-join shape end-to-end over the planted corpus:
    no cartesian, no BNLJ, no broadcast of an embeddings-derived
    relation (broadcasts of slim key/count tables are fine — assert
    none carries an embedding column)."""
    import contextlib
    import io

    from file_dedup_rust_spark.entry import testdata_queries as Q

    df = Q.q_lsh_cosine_neardup_pairs(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    for ln in text.splitlines():
        if "BroadcastExchange" in ln or "broadcast" in ln.lower():
            assert "embedding" not in ln, ln
