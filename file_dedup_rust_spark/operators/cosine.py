"""All-pairs cosine statistics as distributed block-matmul operators —
the scale-correct replacement for the round-2 `ia < ib` theta join
(the engine analog of the reference's pairwise cosine scoring inside
k-NN verification, /root/reference/backend/src/worker/
deduplication_service.rs:300-372,347-348).

Round 2 computed `embedding_neardup_pairs` / `sim_histogram` /
`embedding_clusters` off a self-join with a `ia < ib` predicate: a
BroadcastNestedLoopJoin shuffling O(n^2) ROWS, each scored by per-row
`F.aggregate` lambdas.  These operators keep the exact semantics (so
the DuckDB all-pairs oracles stay hash-green) but change the physical
shape to the same block-matmul layout as `ann.knn_topk_blocked`:

* the table is packed into B dense blocks (one Arrow pass, ~8192
  vectors each);
* only the upper triangle of block pairs joins (B*(B+1)/2 rows — the
  cross join moves PACKED BLOCKS, never row pairs);
* each block pair computes one BLAS matmul and reduces it locally —
  either to the >= threshold survivors (pairs) or to a per-4th-decimal
  histogram of at most 2*10^4+1 bins (histogram).

Shuffle volume is O(n * B) block bytes + O(output), never O(n^2) rows;
per-task memory is one (block_rows x block_rows) score tile.  The
O(n^2) FLOPs are inherent to exact all-pairs semantics and run inside
BLAS; the sub-quadratic route for realistic (high) thresholds is
`lsh_cosine_pairs` below — signed-random-projection banding that feeds
this exact scorer only candidate pairs, the same candidates->verify
shape as the MinHash path (operators/candidates.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.ann import _pack_blocks


def _block_pairs(e: DataFrame, n_blocks: int | None, block_rows: int,
                 n_rows: int | None) -> DataFrame:
    """Upper-triangle join of packed blocks: (p_*, c_*) with
    p_block <= c_block.  The filter rides on a cross join of two
    B-row packed relations, so the executed join is a cartesian
    product of block manifests — no row-level non-equi join exists
    anywhere in the plan."""
    import math

    if n_blocks is None:
        # parquet-backed counts are metadata-only after column pruning;
        # callers that already know n pass n_rows to skip even that
        n = n_rows if n_rows is not None else e.count()
        n_blocks = max(1, math.ceil(n / block_rows))
    blocks = _pack_blocks(e, n_blocks)
    probe = blocks.select(
        F.col("block_id").alias("p_block"),
        F.col("ids").alias("p_ids"), F.col("mat").alias("p_mat"),
        F.col("d").alias("p_d"),
    )
    corp = blocks.select(
        F.col("block_id").alias("c_block"),
        F.col("ids").alias("c_ids"), F.col("mat").alias("c_mat"),
    )
    # SHUFFLE_REPLICATE_NL: without it Catalyst broadcasts the smaller
    # packed relation — i.e. the ENTIRE corpus as one broadcast (the
    # packed table is few rows but n*d*8 bytes).  The hint forces the
    # grid-partitioned cartesian (classic distributed block matmul):
    # each task reads one (probe-slice, corpus-slice) pair, nothing is
    # ever broadcast or collected.
    return (
        probe.hint("SHUFFLE_REPLICATE_NL")
        .crossJoin(corp.hint("SHUFFLE_REPLICATE_NL"))
        .filter(F.col("p_block") <= F.col("c_block"))
    )


def _tile(row):
    """Decode one joined block pair into (p_ids, P, c_ids, C, same)."""
    d = int(row.p_d)
    p_ids = np.frombuffer(row.p_ids, dtype=np.int64)
    P = np.frombuffer(row.p_mat, dtype=np.float64).reshape(-1, d)
    c_ids = np.frombuffer(row.c_ids, dtype=np.int64)
    C = np.frombuffer(row.c_mat, dtype=np.float64).reshape(-1, d)
    return p_ids, P, c_ids, C, int(row.p_block) == int(row.c_block)


def cosine_pairs_blocked(
    e: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    block_rows: int = 8192,
    round_digits: int = 4,
    n_rows: int | None = None,
) -> DataFrame:
    """EXACT (ia, ib, sim) for every unordered pair with
    round(cos, round_digits) >= threshold; ia < ib.  Identical output
    to the all-pairs SQL formulation, produced with O(n*B) shuffle."""

    def kernel(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                p_ids, P, c_ids, C, same = _tile(row)
                S = np.round(P @ C.T, round_digits)
                keep = S >= threshold
                if same:
                    keep &= p_ids[:, None] < c_ids[None, :]
                pi, ci = np.nonzero(keep)
                if len(pi) == 0:
                    continue
                a, b = p_ids[pi], c_ids[ci]
                # cross-block pairs appear once (upper-triangle join)
                # but with arbitrary id order — canonicalize
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                outs.append(pd.DataFrame(
                    {"ia": lo, "ib": hi, "sim": S[pi, ci]}
                ))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"ia": pd.Series([], dtype=np.int64),
                 "ib": pd.Series([], dtype=np.int64),
                 "sim": pd.Series([], dtype=np.float64)}
            )

    return _block_pairs(e, n_blocks, block_rows, n_rows).mapInPandas(
        kernel, schema="ia long, ib long, sim double"
    )


def cosine_sims_histogram(
    e: DataFrame,
    n_blocks: int | None = None,
    block_rows: int = 8192,
    round_digits: int = 4,
    n_rows: int | None = None,
) -> DataFrame:
    """The exact multiset of all-pairs round(cos, round_digits) values,
    pre-aggregated: (sim double, n long) with one row per distinct
    value (<= 2*10^round_digits + 1 rows total).  Each block pair
    reduces its score tile to integer-keyed bin counts locally, so the
    shuffle after the matmul stage is a few thousand (int, count) rows
    per task — downstream bucketings (e.g. round(sim, 1) histograms)
    are then trivial hash aggregates on a bounded table."""
    scale = float(10 ** round_digits)

    def kernel(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                p_ids, P, c_ids, C, same = _tile(row)
                S = np.round(P @ C.T, round_digits)
                if same:
                    vals = S[p_ids[:, None] < c_ids[None, :]]
                else:
                    vals = S.ravel()
                if len(vals) == 0:
                    continue
                # exact integer keys: vals are multiples of 1/scale up
                # to double rounding, |vals*scale - m| << 0.5
                m = np.round(vals * scale).astype(np.int64)
                uniq, cnt = np.unique(m, return_counts=True)
                outs.append(pd.DataFrame({"m": uniq, "n": cnt}))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"m": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )

    partials = _block_pairs(e, n_blocks, block_rows, n_rows).mapInPandas(
        kernel, schema="m long, n long"
    )
    return (
        partials.groupBy("m").agg(F.sum("n").alias("n"))
        # m/scale reproduces np.round's representative double exactly
        # (np.round(x, d) == round(x*10^d)/10^d in double arithmetic)
        .select((F.col("m") / F.lit(scale)).alias("sim"), "n")
    )


# ---------------------------------------------------------------------------
# sub-quadratic candidate generation: signed random projections
# ---------------------------------------------------------------------------

def lsh_cosine_pairs(
    e: DataFrame,
    threshold: float,
    bands: int = 96,
    rows_per_band: int = 12,
    seed: int = 977,
    round_digits: int = 4,
    band_cap: int = 20_000,
    salt_hot: bool = True,
) -> DataFrame:
    """Near-dup cosine pairs via hyperplane LSH: candidates from
    signed-random-projection band collisions, exact cosine re-rank on
    candidates only.  Same (ia, ib, sim) schema as
    `cosine_pairs_blocked`, approximate by the banding miss
    probability: a pair at collision prob p = 1 - acos(sim)/pi is
    missed w.p. (1 - p^rows_per_band)^bands — at sim 0.9 with the
    defaults (96 bands x 12 rows) that is (1 - 0.8564^12)^96 ~ 1e-7
    (and ~1e-22 at sim 0.95), while random (sim~0) pairs collide per
    band w.p. 2^-12, i.e. ~2% of all pairs become candidates.  This is the engine's n^(1+rho) scale path
    (rho = ln(1/p1)/ln(1/p2), Indyk-Motwani 1998 / Charikar 2002)
    for the thresholds real near-dup corpora use; the exact blocked
    operator remains the oracle surface.

    Hot bands: dedup-typical corpora concentrate near-dup clusters on
    IDENTICAL band keys, so a posting list above `band_cap` is exactly
    where the true pairs live.  With `salt_hot` (the default) over-cap
    bands are salted across the shard-pair triangle
    (operators.candidates.salted_candidate_pairs) — candidate output
    equals the uncapped join and the miss probability above holds
    unconditionally, with no single hot reducer.  With
    `salt_hot=False` over-cap bands are dropped-and-counted instead
    (candidate_pairs policy); then the miss probability claim holds
    only below the cap, and callers should surface
    `operators.candidates.dropped_buckets` in their metrics.

    Physical shape mirrors the MinHash text path: one Arrow pass
    computes all band keys per vector, explode -> capped posting-list
    self-join (operators.candidates.candidate_pairs) -> exact re-rank
    of the O(candidates) survivors via a cogrouped matmul against the
    vectors, never an all-pairs join.
    """
    from file_dedup_rust_spark.operators.candidates import (
        candidate_pairs,
        salted_candidate_pairs,
    )

    n_planes = bands * rows_per_band

    def band_keys(batches):
        state = {"H": None, "d": None}  # hyperplanes, rebuilt if d changes
        w = 1 << np.arange(rows_per_band, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                    "keys": pd.Series([], dtype=object)})
                continue
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = V.shape[1]
            if state["d"] != d:
                # seeded per-worker: every task derives the SAME planes
                state["H"] = np.random.default_rng(seed).standard_normal(
                    (d, n_planes)
                )
                state["d"] = d
            bits = ((V @ state["H"]) > 0.0).astype(np.uint64)
            # pack each band's rows_per_band sign bits + band index
            packed = (
                bits.reshape(len(V), bands, rows_per_band) @ w
            ).astype(np.int64)
            packed = packed * np.int64(bands) + np.arange(
                bands, dtype=np.int64
            )
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                 "keys": list(packed)}
            )

    # the posting table feeds 2 (drop-policy) or 3 (salted) subtrees
    # in the candidate join — materialize the band-key pass once so
    # the Python projection kernel runs once, not per reference
    # (round 6; the explode below re-derives cheaply JVM-side)
    keys = e.select("vec_id", "embedding").mapInPandas(
        band_keys, schema="vec_id long, keys array<long>"
    ).localCheckpoint(eager=True)
    posting = keys.select(
        F.explode("keys").alias("key"), F.col("vec_id").alias("clip_id")
    )
    pair_fn = salted_candidate_pairs if salt_hot else candidate_pairs
    cand = pair_fn(posting, band_cap).select(
        F.col("a").alias("ia"), F.col("b").alias("ib")
    )
    # exact re-rank: ship each candidate's two vectors through one
    # equi-join each and score with a vectorized Arrow kernel
    va = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    vb = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    joined = cand.join(va, "ia").join(vb, "ib")

    def rerank(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"ia": pd.Series([], dtype=np.int64),
                     "ib": pd.Series([], dtype=np.int64),
                     "sim": pd.Series([], dtype=np.float64)}
                )
                continue
            A = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", A, B)
            na = np.linalg.norm(A, axis=1)
            nb = np.linalg.norm(B, axis=1)
            sim = np.round(dots / np.maximum(na * nb, 1e-300), round_digits)
            yield pd.DataFrame(
                {"ia": pdf["ia"].to_numpy(dtype=np.int64),
                 "ib": pdf["ib"].to_numpy(dtype=np.int64),
                 "sim": sim}
            )

    scored = joined.mapInPandas(rerank, schema="ia long, ib long, sim double")
    return scored.filter(F.col("sim") >= threshold)
