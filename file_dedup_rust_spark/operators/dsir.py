"""DSIR-style importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every raw-corpus document by how much more
likely its hashed n-gram features are under a small TARGET corpus
(the distribution you want more of) than under the raw corpus itself:

    log w(x) = sum_f  c_x(f) * [ ln p_tgt(f) - ln p_raw(f) ]

with add-1-smoothed multinomials over the feature vocabulary.  Docs
are then kept by weight (top-k / Gumbel resampling) — the selection
step is deliberately left to the existing `token_budget_select` /
`stratified_sample` operators so this module stays a pure scoring
pass.

The reference has no corpus-selection surface at all (its pipeline
scores nothing; clips are processed in upload order —
/root/reference/backend/src/worker/deduplication_service.rs:143-182),
so this operator is part of the training-data slate built on top of
the reference's dedup semantics.

Scale shape (the whole point of doing this in Spark):
  * features are word unigrams + bigrams, built with one JVM
    transform/sequence projection per doc — no Python, never
    crossing doc boundaries;
  * every feature becomes an 8-byte xxhash64 before any exchange —
    no strings through a shuffle;
  * the two censuses (target, raw) are map-side partially aggregated
    groupBys on the hash;
  * the per-feature log-ratio table has |V| rows (vocabulary-sized,
    not corpus-sized) and joins back to the raw feature stream on the
    8-byte key; totals ride a broadcast 1-row literal;
  * optional `n_buckets` applies the paper's hashing trick
    (pmod(hash, B) buckets, B ~ 1e4) so the ratio table is CONSTANT
    size at any corpus scale and the join-back side always
    broadcasts.  The exact-feature variant (n_buckets=None) is the
    oracle surface; bucketing only coarsens the multinomials.

No window functions, no collect, linear in corpus tokens.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd


def ngram_features(docs: DataFrame, text_col: str = "t") -> DataFrame:
    """(doc_id, t) -> (doc_id, fh): one row per unigram + bigram
    occurrence, features pre-hashed to 8 bytes.  Pure JVM expressions
    (split / transform / sequence / xxhash64) — stays inside
    whole-stage codegen."""
    w = docs.select("doc_id", F.split(text_col, " ").alias("w"))
    uni = w.select("doc_id", F.explode("w").alias("f"))
    bi = w.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(w)),"
                " i -> concat_ws(' ', w[i-2], w[i-1]))"
            )
        ).alias("f"),
    )
    return uni.unionByName(bi).select(
        "doc_id", F.xxhash64("f").alias("fh")
    )


def dsir_log_ratios(
    feats: DataFrame,
    is_target: Column,
    n_buckets: int | None = None,
) -> DataFrame:
    """Score every non-target doc: avg over its feature occurrences of
    ln p_tgt(f) - ln p_raw(f), add-1 smoothed over the union vocab.

    `feats` is (doc_id, fh) from `ngram_features`; `is_target` is a
    boolean Column over doc_id splitting target from raw.  Returns
    (doc_id, n_feats, dsir_logratio) for raw docs only (the target
    slice is the distribution, not a candidate).

    The mean (not the paper's sum) keeps the score length-robust and
    the magnitude O(1); ranking by mean*len recovers the paper's sum
    exactly if wanted downstream.
    """
    if n_buckets is not None:
        feats = feats.select(
            "doc_id", F.pmod(F.col("fh"), F.lit(n_buckets)).alias("fh")
        )
    tgt = feats.filter(is_target)
    raw = feats.filter(~is_target)
    ct = tgt.groupBy("fh").agg(F.count("*").alias("ct"))
    cr = raw.groupBy("fh").agg(F.count("*").alias("cr"))
    vocab = ct.join(cr, "fh", "full_outer").select(
        "fh",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    tots = vocab.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        F.count("*").alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(tots)).select(
        "fh",
        (
            F.log(F.col("ct") + 1)
            - F.log(F.col("tt") + F.col("v"))
            - F.log(F.col("cr") + 1)
            + F.log(F.col("tr") + F.col("v"))
        ).alias("lr"),
    )
    return (
        raw.join(ratio, "fh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            round_dd(F.avg("lr"), 4).alias("dsir_logratio"),
        )
    )
