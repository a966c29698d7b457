"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) — the MOSS local fingerprinting scheme, as a dedup tier.

The reference has no sub-sampled fingerprint tier (its near-dup path
is embedding k-NN, /root/reference/backend/src/worker/
deduplication_service.rs:300-372); BASELINE.json's north rule adds
substring/containment dedup.  The engine already winnows INSIDE the
containment tier (operators/containment.py: character-level k=16/w=16
fingerprints feed the suffix-array verify) — this module is the
word-level, ORACLE-CHECKED surface of the same scheme: the census
exposes the selected set itself (checksum-verified against DuckDB)
and the MOSS-style match query scores document pairs directly,
without the suffix-array verify step.  Winnowing selects, from each
sliding window of ``w``
consecutive k-gram hashes, the minimum hash (ties broken to the
RIGHTMOST position).  Properties (Schleimer et al. §3):

  * every window contributes a fingerprint, so any shared token run of
    length >= w + k - 1 between two documents yields at least one
    SHARED selected fingerprint — a detection GUARANTEE the engine's
    MinHash tier (a per-doc sample) cannot make;
  * expected density is 2 / (w + 1) of gram positions, i.e. the
    posting join downstream handles ~2/(w+1) of the rows a full-gram
    join (ngram_containment_pairs) would, with the guarantee intact.

That combination — sub-linear posting volume WITH a hard guarantee on
long matches — is what makes this the scale path between "every gram"
(exact, expensive) and "MinHash" (cheap, probabilistic).

Cross-engine determinism.  The per-gram hash is md5 of the gram text
(lowercase hex in Spark, DuckDB and hashlib alike), and the window
minimum is taken over the composite string key

    sk = h || '#' || lpad(10^9 - pos, 10, '0')

whose lexicographic minimum is exactly (min hash, rightmost position)
— both engines compare plain ASCII strings, so the SELECTED SET is
bit-identical and the oracle can check the fingerprints themselves,
not just counts.  The 43-byte sk is bounded (unlike raw text keys) and
only crosses the single per-doc exchange; the downstream posting join
re-keys on xxhash64(h) so only 8-byte keys shuffle corpus-wide (same
collision convention as operators/dup_spans.py: p ~ n²/2⁶⁵, and the
oracle joins on the md5 string itself, so a collision would surface as
a hash mismatch).

Scale shape.  Selection is one exchange on doc_id (the per-doc window
sort is bounded by the document's own gram count) and the per-doc
census groupBy reuses that partitioning — one shuffle total.  The
match query adds the standard capped posting join: fingerprints with
document frequency > max_df are dropped (boilerplate fingerprints
carry no pair information, exactly the containment tier's stop-hash
rule) and pair counting is a map-side-combining agg on (a, b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd

WINNOW_K = 4   # tokens per gram (noise threshold: matches shorter
               # than k tokens are never detected — Schleimer §2)
WINNOW_W = 5   # window size: guarantee threshold t = w + k - 1 = 8
               # tokens, matching DUP_SPAN_L so the two tiers agree on
               # what "a duplicated span" means; density ~ 2/(w+1) = 1/3
WINNOW_MAX_DF = 16   # posting-list df cap for the match join
WINNOW_MIN_SHARED = 3  # shared selected fingerprints to emit a pair

_POS_BASE = 1_000_000_000  # pos < 10^9 always (docs are bounded);
                           # 10-digit zero-padded reversal makes
                           # lexicographic min pick the RIGHTMOST pos


def winnow_select(
    docs_with_t: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, t) -> selected fingerprints (doc_id, n_grams, sel)
    where sel = md5(gram) || '#' || lpad(10^9 - pos).

    One exchange (doc_id window); rows out ~ 2/(w+1) of gram count.
    Documents with fewer than k tokens have no grams and select
    nothing; documents with fewer than w grams form a single clipped
    window (the frame clips at the partition edge identically in Spark
    and DuckDB), so every non-trivial doc yields >= 1 fingerprint.
    """
    toks = docs_with_t.select("doc_id", F.split("t", " ").alias("wd"))
    # sequence(1, 0) yields [1, 0] in Spark, not [] — filter first.
    g = (
        toks.filter(F.size("wd") >= k)
        .select(
            "doc_id",
            (F.size("wd") - (k - 1)).cast("long").alias("n_grams"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(wd) - {k - 1}), "
                    f"i -> md5(concat_ws(' ', slice(wd, i, {k}))))"
                )
            ).alias("p0", "h"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("p0") + 1).alias("pos"),
            F.concat(
                F.col("h"),
                F.lit("#"),
                F.lpad((F.lit(_POS_BASE) - (F.col("p0") + 1)).cast("string"), 10, "0"),
            ).alias("sk"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        g.withColumn("sel", F.min("sk").over(win))
        # valid window starts only: 1 .. max(n_grams - w + 1, 1)
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
        .select("doc_id", "n_grams", "sel")
    )


def winnow_census(
    docs_with_t: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Per-doc fingerprint census: (doc_id, n_grams, n_fps, density,
    fp_checksum) with fp_checksum = md5 over the ','-joined SORTED
    distinct selected keys — the oracle recomputes the identical
    checksum in DuckDB, so the fingerprint SET itself is verified,
    not just its size.  The groupBy reuses the window's doc_id
    partitioning: one shuffle total."""
    sel = winnow_select(docs_with_t, k, w)
    return (
        sel.groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.sort_array(F.collect_set("sel")).alias("fa"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.size("fa").cast("long").alias("n_fps"),
            round_dd(F.size("fa") / F.col("n_grams"), 4).alias("density"),
            F.md5(F.concat_ws(",", "fa")).alias("fp_checksum"),
        )
    )


def winnow_matches(
    docs_with_t: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_df: int = WINNOW_MAX_DF,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """MOSS-style match pairs: (doc_a, doc_b, shared_fps) for document
    pairs sharing >= min_shared selected fingerprint HASHES, after
    dropping fingerprints seen in more than max_df documents (the
    boilerplate / stop-fingerprint cap, part of the tier's semantics
    and therefore mirrored in the oracle SQL).

    Any pair sharing min_shared disjoint token runs of >= w + k - 1
    tokens is guaranteed caught.  Posting join keys are 8-byte
    xxhash64 of the md5 hash string; pair counting is one
    map-side-combining agg."""
    # fingerprint HASH per doc (strip the position suffix), distinct
    fps = (
        winnow_select(docs_with_t, k, w)
        .select("doc_id", F.xxhash64(F.substring("sel", 1, 32)).alias("fh"))
        .distinct()
    )
    df_ok = (
        fps.groupBy("fh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fh")
    )
    p = fps.join(df_ok, "fh")
    a = p.select("fh", F.col("doc_id").alias("doc_a"))
    b = p.select("fh", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
