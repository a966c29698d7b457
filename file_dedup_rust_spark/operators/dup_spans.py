"""Corpus-level duplicated-span census (ExactSubstr-lite).

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") remove every substring that occurs more than once ANYWHERE in
the corpus — a different operation from this engine's pairwise tiers
(whole-doc hash, MinHash, containment): boilerplate shared by thousands
of otherwise-distinct documents never forms a near-dup PAIR yet still
dominates training data.  The suffix-array formulation is the
within-pair containment tier (operators/containment.py); at corpus
scale the standard distributed relaxation is a fixed-length token-gram
census, as in Gopher's "duplicated n-gram fraction" (Rae et al. 2021)
and Dolma/RefinedWeb-style pipelines:

  * a gram POSITION is duplicated iff its L-token gram occurs > 1 time
    corpus-wide (counting every occurrence, same-doc repeats included);
  * a TOKEN is covered iff any duplicated gram window contains it (the
    interval union of [i, i+L) over duplicated positions i — the exact
    mass ExactSubstr would cut).

Scale design.  Gram identities cross the shuffle as 8-byte xxhash64
values, never strings: positions → hash → count (map-side partial agg)
→ hash-keyed join back → per-doc agg.  Two shuffles total on ~16-byte
rows, linear in corpus tokens.  The per-doc interval union runs inside
a JVM `aggregate` over the SORTED duplicated-position list — bounded by
the document's own token count, the same bound as holding its text.
Collision note: two distinct grams sharing an xxhash64 (p ≈ n²/2⁶⁵)
would overcount one duplicated position; the oracle groups by the gram
string itself and agrees at every tested scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd

DUP_SPAN_L = 8  # tokens per gram (Lee et al. use 50 BPE tokens; the
                # synthetic docs are 10-99 words, so 8 keeps multiple
                # windows per doc while staying selective)

BLOCK_L = 8     # tokens per dedup block (dedup_blocks) — disjoint
                # windows, unlike the census's overlapping grams


def covered_tokens_expr(l: int):
    """Interval-union token coverage over a SORTED gram-position array
    column `dps`: the number of token positions inside at least one
    [i, i+l) window — a JVM `aggregate` bounded by the document's own
    token count.  Shared by the corpus dup-span census and the
    decontamination coverage metric."""
    return F.expr(
        f"""
        CASE WHEN size(dps) = 0 THEN CAST(0 AS BIGINT)
        ELSE aggregate(
          slice(dps, 2, size(dps) - 1),
          named_struct('prev', element_at(dps, 1),
                       'cov', CAST({l} AS BIGINT)),
          (acc, p) -> named_struct(
            'prev', p,
            'cov', acc.cov + least(CAST({l} AS BIGINT),
                                   CAST(p - acc.prev AS BIGINT))),
          acc -> acc.cov)
        END
        """
    )


def dup_span_stats(docs_with_t: DataFrame, l: int = DUP_SPAN_L) -> DataFrame:
    """(doc_id, t) -> per-doc duplicated-span census.

    Columns: doc_id, n_tokens, n_grams, dup_grams, dup_fraction,
    covered_tokens, covered_frac.  Docs with fewer than `l` tokens
    have no gram positions and are omitted (mirrored in the oracle).
    """
    toks = docs_with_t.select(
        "doc_id", F.split("t", " ").alias("w")
    ).select("doc_id", "w", F.size("w").alias("n_tokens"))

    grams = F.expr(
        f"CASE WHEN size(w) >= {l} THEN "
        f"transform(sequence(1, size(w) - {l - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice(w, i, {l})))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    pos = toks.select(
        "doc_id", "n_tokens", F.posexplode(grams).alias("p0", "gh")
    ).select("doc_id", "n_tokens", (F.col("p0") + 1).alias("i"), "gh")

    cnt = pos.groupBy("gh").agg(F.count("*").alias("c"))
    per_doc = (
        pos.join(cnt, "gh")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("c") > 1).cast("long")).alias("dup_grams"),
            F.sort_array(
                F.collect_list(F.when(F.col("c") > 1, F.col("i")))
            ).alias("dps"),
        )
    )
    covered = covered_tokens_expr(l)
    # round_dd, not F.round: these are integer ratios — the same double
    # on both engines — and the DuckDB oracle rounds doubles with
    # std::round semantics, which disagrees with Spark's HALF_UP on
    # half-way ratios (the round-5 driver hash mismatch; see
    # functions/rounding.py)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_grams",
        "dup_grams",
        round_dd(F.col("dup_grams") / F.col("n_grams"), 4).alias(
            "dup_fraction"
        ),
        covered.alias("covered_tokens"),
        round_dd(covered / F.col("n_tokens"), 4).alias("covered_frac"),
    )


def dedup_blocks(docs_with_t: DataFrame, l: int = BLOCK_L) -> DataFrame:
    """(doc_id, t) -> block-level dedup under GLOBAL first-occurrence
    retention: partition each document's tokens into disjoint l-token
    blocks, keep every block's first occurrence corpus-wide (ordered by
    (doc_id, block index)), drop the rest, and reassemble what remains.

    This is the REMOVE side of the census above — the operation
    CCNet/RefinedWeb-style pipelines actually run (line-level dedup;
    Penedo et al. 2023 §4.2) re-expressed over this corpus's
    newline-free word soup as fixed-width blocks.  Whole-doc exact
    tiers (operators/exact.py, reference analog
    backend/src/worker/deduplication_service.rs:69-101) cannot cut
    boilerplate shared by thousands of otherwise-distinct docs; this
    removes exactly that mass while keeping one canonical copy.

    Columns: doc_id, n_blocks, n_dropped, kept_tokens, kept_sha
    (sha256 hex of the reassembled kept text — '' hashes if everything
    was dropped).  Deterministic for a fixed corpus.

    Scale design.  One explode (n_tokens / l rows), block identities
    cross the shuffle as 8-byte xxhash64 values; first occurrences via
    min(struct(doc_id, idx)) — a declarative aggregate, so map-side
    partial agg bounds any hot boilerplate block's reduce-side group;
    join back is hash-keyed with ONE row per distinct block on the
    build side (AQE handles the hot-key probe skew); reassembly is a
    per-doc sort bounded by the document's own block count.  Same
    xxhash64 collision note as the census: the oracle groups by the
    block STRING and agrees at every tested scale.
    """
    pos = _block_positions(docs_with_t, l)
    firsts = pos.groupBy("bh").agg(
        F.min(F.struct("doc_id", "idx")).alias("f")
    )
    keep = (F.col("doc_id") == F.col("f.doc_id")) & (
        F.col("idx") == F.col("f.idx")
    )
    tagged = pos.join(firsts, "bh").select(
        "doc_id", "idx", "blk", keep.alias("keep")
    )
    return _reassemble(tagged, dropped_col="n_dropped")


def _block_positions(docs_with_t: DataFrame, l: int) -> DataFrame:
    """(doc_id, t) -> one row per disjoint l-token block:
    (doc_id, idx, blk, bh) with bh = xxhash64(blk)."""
    toks = docs_with_t.select("doc_id", F.split("t", " ").alias("w"))
    blocks = F.expr(
        f"transform(sequence(0, int(ceil(size(w) / {l}.0)) - 1), "
        f"i -> concat_ws(' ', slice(w, i * {l} + 1, {l})))"
    )
    return toks.select(
        "doc_id", F.posexplode(blocks).alias("idx", "blk")
    ).withColumn("bh", F.xxhash64("blk"))


def _reassemble(tagged: DataFrame, dropped_col: str) -> DataFrame:
    """(doc_id, idx, blk, keep) -> per-doc kept/dropped counts + the
    sha256 of the in-order reassembly of kept blocks.  The per-doc sort
    is bounded by the document's own block count."""
    # collect_list drops the NULLs the unmatched when() produces, so
    # only kept blocks reach the sort
    kept_txt = F.concat_ws(
        " ",
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("keep"), F.struct("idx", "blk"))
                )
            ),
            lambda x: x["blk"],
        ),
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum((~F.col("keep")).cast("long")).alias(dropped_col),
        F.coalesce(
            F.sum(
                F.when(F.col("keep"), F.size(F.split("blk", " ")).cast("long"))
            ),
            F.lit(0).cast("long"),
        ).alias("kept_tokens"),
        F.sha2(kept_txt, 256).alias("kept_sha"),
    )


BOILER_MIN_DOCS = 2  # a block is boilerplate iff it appears in at
                     # least this many DISTINCT docs (RefinedWeb's
                     # line rule uses source-level dup counts; the
                     # synthetic corpus's only cross-doc repeats are
                     # the planted copies, so 2 is the selective
                     # choice there)


def prune_boilerplate(
    docs_with_t: DataFrame, l: int = BLOCK_L, min_docs: int = BOILER_MIN_DOCS
) -> DataFrame:
    """(doc_id, t) -> frequency-threshold boilerplate removal: drop
    EVERY occurrence (the first included) of any l-token block whose
    exact content appears in >= min_docs distinct documents, and
    reassemble what remains.

    This is the other standard line-rule semantics next to
    dedup_blocks' first-occurrence retention: CCNet/RefinedWeb-style
    pipelines (Penedo et al. 2023 §4.2, Wenzek et al. 2020) treat a
    line shared by many documents as navigation chrome / license
    headers — noise in every copy, so no canonical copy is kept.
    Re-expressed over this corpus's newline-free word soup as
    fixed-width blocks; real corpora swap the splitter for
    newline-split lines, the operator is unchanged.

    Columns: doc_id, n_blocks, n_boiler (occurrences dropped),
    kept_tokens, kept_sha.

    Scale design.  Same two-shuffle shape as dedup_blocks: block
    identities cross the shuffle as 8-byte xxhash64 values; the doc
    frequency is a map-side-partial count over per-doc-distinct rows;
    the boilerplate set (one row per distinct offending block) is the
    join build side — tiny unless the corpus is mostly boilerplate,
    so AQE broadcasts it; a LEFT join keeps clean blocks flowing
    without a match.  Reassembly is bounded per doc.  Same xxhash64
    collision note as the census: the oracle groups by the block
    string and agrees at every tested scale.
    """
    pos = _block_positions(docs_with_t, l)
    boiler = (
        pos.select("bh", "doc_id")
        .distinct()
        .groupBy("bh")
        .agg(F.count("*").alias("dfreq"))
        .filter(F.col("dfreq") >= min_docs)
        .select("bh", F.lit(True).alias("is_boiler"))
    )
    tagged = pos.join(boiler, "bh", "left").select(
        "doc_id", "idx", "blk",
        F.col("is_boiler").isNull().alias("keep"),
    )
    return _reassemble(tagged, dropped_col="n_boiler")


def novelty_scores(docs_with_t: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, t) -> (doc_id, n_grams, novel_grams, novelty_frac):
    the fraction of a doc's DISTINCT word-n-grams whose first corpus
    occurrence (min doc_id over docs containing the gram) is this doc.

    This is the marginal-contribution score data-curation pipelines
    rank by (a re-crawl of yesterday's page scores ~0, a genuinely new
    page ~1) — dedup's complement: instead of dropping the k-th copy it
    VALUES each doc by how much it adds to everything ingested before
    it (doc_id = ingestion order).  Exact copies planted after their
    original score exactly 0.

    Scale shape: grams shuffle once as 8-byte xxhash64 keys for the
    min-doc census (map-side combined), join back once, then one
    per-doc agg — the same two-shuffle budget as dup_span_stats; no
    Python, no window.  Docs with fewer than n words have no grams and
    are omitted (mirrored in the oracle).
    """
    from file_dedup_rust_spark.operators.decontaminate import word_ngrams

    gh = word_ngrams(docs_with_t, n).select(
        "doc_id", F.xxhash64("g").alias("gh")
    )
    first = gh.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    return (
        gh.join(first, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long"))
            .alias("novel_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "novel_grams",
            round_dd(F.col("novel_grams") / F.col("n_grams"), 4).alias(
                "novelty_frac"
            ),
        )
    )
