#!/usr/bin/env python
"""Dump .explain('formatted') for the engine's key plans and run the
plan-quality assertions we care about at 100 TB scale:

  * parquet scans carry PushedFilters / pruned ReadSchema (never the
    binary `bytes` column past the signature stage);
  * small dimension sides broadcast (BroadcastHashJoin), big joins
    stay shuffle/sort-merge on their keys;
  * hash aggregates show partial_* (map-side combine) before the
    exchange;
  * WholeStageCodegen spans cover the verify expressions (no Python
    in the hot pair path).

    python tools/explain_plans.py [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.config import DEFAULT_CONFIG
    from file_dedup_rust_spark.entry import testdata_queries as Q
    from file_dedup_rust_spark.functions.udfs import compute_signatures
    from file_dedup_rust_spark.plans.pipeline import build_edges
    from file_dedup_rust_spark.session import build_session

    spark = build_session("explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str, list[str]]] = []

    # signatures over a parquet clips table: ReadSchema must include
    # bytes (it is consumed here) but nothing downstream re-reads it
    clips_path = "/tmp/explain-clips"
    if not os.path.exists(clips_path):
        datagen.generate_clips(spark, 200, seed=42).write.mode(
            "overwrite"
        ).parquet(clips_path)
    clips = spark.read.parquet(clips_path)
    sigs = compute_signatures(clips, DEFAULT_CONFIG)
    sections.append((
        "signatures (mapInPandas over parquet scan)",
        plan_text(sigs),
        ["ArrowEvalPython|MapInPandas", "ReadSchema"],
    ))

    edges = build_edges(sigs, DEFAULT_CONFIG)
    sections.append((
        "build_edges (LSH candidates + verify, end-to-end)",
        plan_text(edges),
        ["HashAggregate", "Exchange", "hashpartitioning"],
    ))

    # verify must be pure JVM expressions — no BatchEvalPython rows
    sections.append((
        "minhash_lsh_pairs over documents",
        plan_text(Q.q_minhash_lsh_pairs(spark, args.sf_dir)),
        ["PushedFilters", "HashAggregate"],
    ))

    sections.append((
        "knn_topk (distributed block-matmul: packed blocks cross-join, "
        "partial top-k, window merge — no driver collect)",
        plan_text(Q.q_knn_topk(spark, args.sf_dir)),
        ["ReadSchema", "MapInPandas", "CartesianProduct|BroadcastNestedLoop",
         "Window"],
    ))

    sections.append((
        "ann_ivf_topk (fused one-shot, round 4: ONE posexploded "
        "relation carries both roles — pos<assign_m is the cell's "
        "inverted list, pos<nprobe probes it — so one grouped-map per "
        "cell replaces the two-branch cogroup that recomputed the "
        "assignment per side; then global rank.  Round 5: the driver "
        "query runs over the planted clustered corpus — one extra "
        "broadcast-able anchor equi-join + zip_with derives it, the "
        "IVF plan itself is unchanged)",
        plan_text(Q.q_ann_ivf_topk(spark, args.sf_dir)),
        ["FlatMapGroupsInPandas", "HashAggregate", "Window", "posexplode"],
    ))

    sections.append((
        "ann_ivf_topk_iso (the round-1..4 pinned bench workload over "
        "raw isotropic embeddings — identical operator plan, no "
        "corpus-derivation join)",
        plan_text(Q.q_ann_ivf_topk_iso(spark, args.sf_dir)),
        ["FlatMapGroupsInPandas", "Window", "posexplode"],
    ))

    sections.append((
        "ann_ivf_pq_topk (fused one-shot: assign+PQ-encode in one "
        "narrow Arrow chain, posexploded once; per-cell grouped-map "
        "ADC scan -> survivor re-rank joins -> global rank; cell "
        "payload is 8-byte codes)",
        plan_text(Q.q_ann_ivf_pq_topk(spark, args.sf_dir)),
        ["FlatMapGroupsInPandas", "Window", "posexplode"],
    ))

    sections.append((
        "lsh_cosine_neardup_pairs (hyperplane-LSH band keys -> "
        "salted/capped posting join -> exact re-rank of candidates "
        "only; no cartesian, no BNLJ, no corpus broadcast)",
        plan_text(Q.q_lsh_cosine_neardup_pairs(spark, args.sf_dir)),
        ["MapInPandas", "HashAggregate"],
    ))

    sections.append((
        "semdedup_prune (nearest-seed assignment in one MapInPandas "
        "BLAS pass, per-cluster gram-matrix prune as one grouped-map "
        "behind a single hashpartitioning on cluster_id — no "
        "all-pairs relation anywhere)",
        plan_text(Q.q_semdedup_prune(spark, args.sf_dir)),
        ["MapInPandas", "FlatMapGroupsInPandas", "hashpartitioning"],
    ))

    sections.append((
        "dedup_new_vs_corpus (incremental tier ladder: semi/anti exact "
        "split, then base shingle postings joined against NEW keys "
        "only — base-side work scales with the batch, not the corpus)",
        plan_text(Q.q_dedup_new_vs_corpus(spark, args.sf_dir)),
        ["LeftSemi", "LeftAnti", "HashAggregate", "partial", "xxhash64"],
    ))

    sections.append((
        "keep_capped_copies (bounded repetition: ONE window shuffle "
        "keyed on xxhash64(t) — 8-byte shuffle keys, text as payload)",
        plan_text(Q.q_keep_capped_copies(spark, args.sf_dir)),
        ["Window", "xxhash64"],
    ))

    sections.append((
        "decontam_hits (benchmark decontamination: corpus word-8-grams "
        "stream through ONE BroadcastHashJoin against the tiny eval "
        "gram set — the corpus is never shuffled on the gram key)",
        plan_text(Q.q_decontam_hits(spark, args.sf_dir)),
        ["BroadcastHashJoin", "HashAggregate"],
    ))

    sections.append((
        "embedding_decontam_hits (semantic decontamination: corpus "
        "streams through ONE mapInPandas BLAS pass against the bounded "
        "collected eval matrix — ZERO Exchange, no join operator in "
        "the plan at all)",
        plan_text(Q.q_embedding_decontam_hits(spark, args.sf_dir)),
        ["MapInPandas"],
    ))

    sections.append((
        "soft_dedup_weights (SoftDeDup reweighting: partial-agg "
        "groupBy count + join back on xxhash64(t) — map-side combine "
        "beats a window count 1.5x at the 50%-hot-key worst case, and "
        "AQE can skew-split the join where a window partition cannot "
        "split)",
        plan_text(Q.q_soft_dedup_weights(spark, args.sf_dir)),
        ["HashAggregate", "partial", "xxhash64"],
    ))

    sections.append((
        "bow_dup_groups (reorder-invariant exact tier: split -> "
        "array_sort -> md5 inside one codegen projection, then one "
        "groupBy on the 32-byte digest — no Python, no text through "
        "the exchange)",
        plan_text(Q.q_bow_dup_groups(spark, args.sf_dir)),
        ["md5", "HashAggregate", "partial"],
    ))

    sections.append((
        "corpus_build_funnel (raw -> exact-dedup reps -> decontaminate "
        "-> stratified sample: window rep contraction, broadcast eval "
        "grams, Knuth-hash sample filter — four operators, no "
        "cartesian, no per-row Python)",
        plan_text(Q.q_corpus_build_funnel(spark, args.sf_dir)),
        ["BroadcastHashJoin", "HashAggregate", "xxhash64"],
    ))

    sections.append((
        "repetition_flags (Gopher repetition quality signals: "
        "array_sort + aggregate run-length pass inside ONE projection "
        "— zero Exchange, zero Python; the explode->groupBy plan this "
        "replaces would shuffle the corpus token stream twice)",
        plan_text(Q.q_repetition_flags(spark, args.sf_dir)),
        ["Union"],
    ))

    sections.append((
        "dup_span_stats (ExactSubstr-lite duplicated-span census: gram "
        "identities shuffle as 8-byte xxhash64, map-side partial agg "
        "on the census, per-doc interval union as a JVM aggregate — "
        "two shuffles, linear in corpus tokens)",
        plan_text(Q.q_dup_span_stats(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate"],
    ))

    sections.append((
        "unigram_nll (CCNet-style corpus unigram scoring: word tokens "
        "shuffle once as xxhash64 keys with map-side partial agg, the "
        "1-row corpus total broadcasts — no strings through exchanges)",
        plan_text(Q.q_unigram_nll(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial", "BroadcastNestedLoopJoin|BroadcastExchange"],
    ))

    sections.append((
        "pii_redaction (email/phone scrub: regexp_replace + "
        "regexp_extract_all inside one codegen projection — zero "
        "Exchange, zero Python)",
        plan_text(Q.q_pii_redaction(spark, args.sf_dir)),
        [r"\* Project"],  # '*' = whole-stage-codegen node in formatted explain
    ))

    sections.append((
        "tfidf_top_terms (tf census -> df census -> broadcast N -> "
        "per-doc window top-k; rank on the ROUNDED score so libm ulp "
        "skew cannot flip cross-engine ordering)",
        plan_text(Q.q_tfidf_top_terms(spark, args.sf_dir)),
        ["HashAggregate", "partial", "Window", "BroadcastNestedLoopJoin|BroadcastExchange"],
    ))

    sections.append((
        "redacted_dup_groups (normalize-then-hash dedup: PII scrub "
        "fused in front of the exact-dedup groupBy on "
        "xxhash64(scrubbed) — ONE shuffle, 8-byte keys)",
        plan_text(Q.q_redacted_dup_groups(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "regexp_replace"],
    ))

    sections.append((
        "embedding_neardup_pairs (blocked all-pairs cosine: packed-block "
        "grid cartesian, per-tile BLAS + threshold reduce — no "
        "BroadcastNestedLoopJoin, no packed-corpus broadcast)",
        plan_text(Q.q_embedding_neardup_pairs(spark, args.sf_dir)),
        ["CartesianProduct", "MapInPandas"],
    ))

    sections.append((
        "sim_histogram (blocked all-pairs cosine reduced to <=20001 "
        "integer bins per tile; post-matmul shuffle carries bin counts)",
        plan_text(Q.q_sim_histogram(spark, args.sf_dir)),
        ["CartesianProduct", "HashAggregate"],
    ))

    sections.append((
        "events_page2 (OFFSET via TakeOrdered(offset+limit) + window "
        "over the page span only)",
        plan_text(Q.q_events_page2(spark, args.sf_dir)),
        ["TakeOrderedAndProject", "Window"],
    ))

    sections.append((
        "events_keyset_page (cursor broadcast — pagination cost "
        "independent of page number)",
        plan_text(Q.q_events_keyset_page(spark, args.sf_dir)),
        ["TakeOrderedAndProject", "BroadcastNestedLoopJoin"],
    ))

    sections.append((
        "job_lookup (1-row key side broadcast)",
        plan_text(Q.q_job_lookup(spark, args.sf_dir)),
        ["BroadcastHashJoin"],
    ))

    sections.append((
        "jobs_delete_remaining (left_anti delete-set + partial agg)",
        plan_text(Q.q_jobs_delete_remaining(spark, args.sf_dir)),
        ["LeftAnti", "HashAggregate"],
    ))

    sections.append((
        "events_window_agg (event-time tumbling window as a hash "
        "aggregate with map-side combine)",
        plan_text(Q.q_events_window_agg(spark, args.sf_dir)),
        ["HashAggregate", "partial"],
    ))

    sections.append((
        "block_dedup (global first-occurrence block retention: block "
        "identities shuffle as 8-byte xxhash64, first-occurrence via "
        "min(struct) with map-side partial agg, hash join back, per-doc "
        "reassembly bounded by the doc's own block count)",
        plan_text(Q.q_block_dedup(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial", "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    ))

    sections.append((
        "cluster_best_rep (keep-best-copy retention over near-dup "
        "clusters: CC labels joined to integer quality, pick via two "
        "window functions over ONE cluster_id-partitioned shuffle)",
        plan_text(Q.q_cluster_best_rep(spark, args.sf_dir)),
        # at sf0.01 the adaptive CC solves on the driver, so labels
        # arrive as a broadcast local relation (no aggregate to pin);
        # the retention pick itself is Sort -> Exchange -> Window x2
        ["Window", "BroadcastHashJoin"],
    ))

    sections.append((
        "bucketed_batches (ASR-style length-bucketed batch assembly: "
        "global (len,id) rank via the two-pass prefix count, bucket "
        "first-rank broadcast back, batch agg with map-side combine "
        "— no per-length-bucket window, no SinglePartition)",
        plan_text(Q.q_bucketed_batches(spark, args.sf_dir)),
        ["Window", "BroadcastExchange", "HashAggregate", "partial"],
    ))

    sections.append((
        "token_budget_select (quality-ordered rank-prefix budget fill: "
        "two-pass distributed prefix sum over (_ord, doc_id) buckets — "
        "the window partitions by bucket, never SinglePartition)",
        plan_text(Q.q_token_budget_select(spark, args.sf_dir)),
        # the prefix-sum's two bounded aggregates run eagerly at build
        # time (driver collects <= n_buckets rows), so the returned
        # plan is scan -> broadcast offset join -> bucket window
        ["Window", "BroadcastExchange"],
    ))

    sections.append((
        "boilerplate_prune (frequency-threshold block removal: block "
        "identities shuffle as xxhash64, doc-frequency is a two-phase "
        "distinct+count agg, the offending-block set is the LEFT-join "
        "build side — clean blocks flow without a match)",
        plan_text(Q.q_boilerplate_prune(spark, args.sf_dir)),
        ["HashAggregate", "LeftOuter", "xxhash64"],
    ))

    sections.append((
        "leakage_safe_split (per-dup-group split: one min-agg on the "
        "content hash + one hash join back — the exact-dedup shuffle "
        "shape; the split itself is a pure Knuth-bucket expression)",
        plan_text(Q.q_leakage_safe_split(spark, args.sf_dir)),
        ["HashAggregate", "partial_min"],
    ))

    sections.append((
        "mixture_weights (target-mix sampling rates: one partial-agg "
        "groupBy over the strata; the SinglePartition window below "
        "runs on the post-agg relation bounded by stratum cardinality "
        "— rows, not data)",
        plan_text(Q.q_mixture_weights(spark, args.sf_dir)),
        ["HashAggregate", "partial_count"],
    ))

    sections.append((
        "conflict_repair (same-content conflicting-attribute majority "
        "repair: two chained hash aggs, majority via min(struct) — a "
        "declarative aggregate, no window, no per-group sort)",
        plan_text(Q.q_conflict_repair(spark, args.sf_dir)),
        ["HashAggregate", "partial_min", "partial_count"],
    ))

    sections.append((
        "edit_verified_pairs (levenshtein verify tier: shingle-posting "
        "candidate join at a coarse Jaccard floor, then the O(len^2) "
        "levenshtein runs as a JVM codegen expression on the bounded "
        "candidate relation only — never an all-pairs join)",
        plan_text(Q.q_edit_verified_pairs(spark, args.sf_dir)),
        ["HashAggregate", "levenshtein"],
    ))

    sections.append((
        "source_token_quota (per-source rank-prefix token cap: ONE "
        "window shuffle hashpartitioned on source — parallel across "
        "sources, no SinglePartition anywhere)",
        plan_text(Q.q_source_token_quota(spark, args.sf_dir)),
        ["Window", r"hashpartitioning\(source"],
    ))

    sections.append((
        "corpus_diversity (per-language 3-gram type-token ratio: "
        "multiset grams shuffle once as xxhash64 keys with map-side "
        "partial agg, then a per-language rollup bounded by language "
        "cardinality)",
        plan_text(Q.q_corpus_diversity(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial"],
    ))

    sections.append((
        "hard_negatives (contrastive-training negative mining: exact "
        "blocked kNN candidates at width top_k + max_cluster - 1, two "
        "joins against the cluster table, one window re-rank — no "
        "BroadcastNestedLoopJoin, no cartesian)",
        plan_text(Q.q_hard_negatives(spark, args.sf_dir)),
        ["Window", "SortMergeJoin|BroadcastHashJoin"],
    ))

    sections.append((
        "source_overlap_matrix (cross-source duplication: rows "
        "contract to DISTINCT (xxhash64(text), source) BEFORE the "
        "pairwise expansion, so per-text join work is bounded by the "
        "source count; hash-to-hash equi-join, never text keys)",
        plan_text(Q.q_source_overlap_matrix(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial_count"],
    ))

    sections.append((
        "eval_carve_k (exact-k stratified draw: TWO window stages — "
        "(stratum, salt) lanes then the bounded survivor re-rank — "
        "never a SinglePartition window over a whole stratum)",
        plan_text(Q.q_eval_carve_k(spark, args.sf_dir)),
        ["Window", r"hashpartitioning\(lang"],
    ))

    sections.append((
        "novelty_scores (first-occurrence gram census: grams cross "
        "both shuffles as 8-byte xxhash64 keys with map-side partial "
        "agg; no string keys, no window)",
        plan_text(Q.q_novelty_scores(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial_min"],
    ))

    sections.append((
        "consensus_transcript (medoid repair: pairwise stage joins "
        "(key, variant, count) contractions with levenshtein as a JVM "
        "codegen expression; medoid via min(struct) — declarative, no "
        "per-group sort, no Python)",
        plan_text(Q.q_consensus_transcript(spark, args.sf_dir)),
        ["levenshtein", "HashAggregate", "partial_min"],
    ))

    sections.append((
        "contam_coverage (token-level dirtiness: positioned corpus "
        "grams stream through ONE BroadcastHashJoin against the "
        "distinct eval gram set, per-doc interval union as a JVM "
        "aggregate — the corpus is never shuffled on the gram key)",
        plan_text(Q.q_contam_coverage(spark, args.sf_dir)),
        ["BroadcastHashJoin", "HashAggregate", "posexplode"],
    ))

    sections.append((
        "paraphrase_pairs (cross-modal audit: semantic-near pairs from "
        "the blocked cosine tier bound ALL lexical work — shingles are "
        "LeftSemi-pruned to candidate ids before the posting join, the "
        "exact-Jaccard verify touches candidate pairs only)",
        plan_text(Q.q_paraphrase_pairs(spark, args.sf_dir)),
        ["MapInPandas", "LeftSemi", "HashAggregate"],
    ))

    sections.append((
        "stale_embedding_pairs (embedding drift audit: lexical-dup "
        "pairs fetch exactly two embeddings each via hash joins, the "
        "cosine is a zip_with/aggregate JVM expression on the pair row "
        "— no matmul, no all-pairs vector shuffle, no Python)",
        plan_text(Q.q_stale_embedding_pairs(spark, args.sf_dir)),
        ["zip_with", "HashAggregate",
         "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    ))

    sections.append((
        "dsir_weights (DSIR importance weighting: one JVM gram "
        "projection, two map-side partially-aggregated censuses on "
        "8-byte xxhash64 keys, a vocabulary-sized log-ratio table "
        "joined back on the hash, totals broadcast as a 1-row literal "
        "— no window, no Python, no strings through any exchange)",
        plan_text(Q.q_dsir_weights(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial"],
    ))

    sections.append((
        "unimax_alloc (UniMax water-fill: ONE corpus shuffle for the "
        "per-language token census; the row_number/cumsum window runs "
        "over the bounded language table only, capped-prefix "
        "redistribution via a broadcast 1-row aggregate)",
        plan_text(Q.q_unimax_alloc(spark, args.sf_dir)),
        ["Window", "HashAggregate", "partial"],
    ))

    sections.append((
        "chunk_dedup_savings (fixed-block chunk-store accounting: "
        "sequence/explode + md5 inside one codegen projection, one "
        "groupBy on the digest, two map-side-combined aggregates as "
        "broadcast 1-row literals — linear in corpus bytes; the CDC "
        "tier in operators/cdc.py is the shift-robust mapInPandas "
        "analog)",
        plan_text(Q.q_chunk_dedup_savings(spark, args.sf_dir)),
        ["md5", "HashAggregate", "partial"],
    ))

    sections.append((
        "dsir_selected (DSIR resampling step: scores feed the two-pass "
        "distributed prefix sum ordered by the integer-scaled rounded "
        "score — budget admission with no single-task global window)",
        plan_text(Q.q_dsir_selected(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "Window"],
    ))

    sections.append((
        "hll_distinct_by_source (HLL cardinality sketch: md5 + regexp "
        "register derivation inside one codegen projection, partial-agg "
        "max over (group, bucket) — the shuffle carries <=256 register "
        "rows per group, never distinct values)",
        plan_text(Q.q_hll_distinct_by_source(spark, args.sf_dir)),
        ["md5", "HashAggregate", "partial"],
    ))

    sections.append((
        "winnow_fingerprints (winnowing census: md5 gram keys inside "
        "one codegen projection, ONE doc_id exchange feeding both the "
        "per-doc window min and the census groupBy — the sort key is "
        "a bounded 43-byte string, never raw text)",
        plan_text(Q.q_winnow_fingerprints(spark, args.sf_dir)),
        ["md5", "Window", "HashAggregate"],
    ))

    sections.append((
        "winnow_matches (MOSS-style match pairs: winnow selection as "
        "above, then a df-capped posting self-join keyed on xxhash64 "
        "of the fingerprint — 8-byte keys corpus-wide, pair counting "
        "via map-side partial agg, no cartesian)",
        plan_text(Q.q_winnow_matches(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial"],
    ))

    sections.append((
        "allpairs_jaccard (AllPairs prefix-filter exact similarity "
        "join: df census on 8-byte gram keys, per-doc rank window, "
        "posting self-join over ONLY each doc's rarest ~(1-t)*n+1 "
        "grams, exact-Jaccard verify on candidates — deterministic "
        "completeness, no cap, no cartesian)",
        plan_text(Q.q_allpairs_jaccard(spark, args.sf_dir)),
        ["xxhash64", "Window", "HashAggregate"],
    ))

    sections.append((
        "contam_redact (surgical decontamination: positioned grams "
        "stream through the same ONE BroadcastHashJoin as "
        "decontam_hits, one doc_id groupBy, one join back to the "
        "token arrays; the kept-token mask is a JVM lambda — no "
        "Python, no corpus shuffle on gram keys)",
        plan_text(Q.q_contam_redact(spark, args.sf_dir)),
        ["BroadcastHashJoin", "HashAggregate"],
    ))

    sections.append((
        "bloom_prefilter (partitioned Bloom membership: md5 bucket "
        "keys inside codegen, the sketch side is bounded at "
        "lanes x 16^w rows so it BROADCASTS; the batch explodes x4 "
        "into one BroadcastHashJoin + per-doc partial agg — the "
        "corpus never shuffles on probe keys, and the exact tier "
        "joins on 8-byte xxhash64)",
        plan_text(Q.q_bloom_prefilter(spark, args.sf_dir)),
        ["md5", "BroadcastHashJoin", "HashAggregate"],
    ))

    sections.append((
        "dedup_threshold_curve (yield curve: the exact pair set is "
        "computed ONCE at the loosest cutoff — the same posting join "
        "as ngram_jaccard_pairs — then a 7-row literal explode sweeps "
        "thresholds as a narrow map + two partial-agg groupBys, no "
        "per-threshold re-scan)",
        plan_text(Q.q_dedup_threshold_curve(spark, args.sf_dir)),
        ["HashAggregate", "Exchange", "partial"],
    ))

    sections.append((
        "snm_neardup_pairs (sorted-neighborhood, the fourth candidate "
        "family: distributed global rank = range repartition + "
        "partition row_number + broadcast offsets — rangepartitioning "
        "and a bounded-window sort, NEVER a single-partition window; "
        "the windowed pairing is a w-fold literal explode + integer "
        "equi-join on rank, then exact-Jaccard verify on candidates "
        "only)",
        plan_text(Q.q_snm_neardup_pairs(spark, args.sf_dir)),
        ["rangepartitioning", "Window", "HashAggregate"],
    ))

    sections.append((
        "user_sessions (native session_window sessionization: ONE "
        "hashpartitioning exchange on user_id feeds the sort-based "
        "session aggregation and the per-user rollup with map-side "
        "partial agg)",
        plan_text(Q.q_user_sessions(spark, args.sf_dir)),
        ["hashpartitioning", "HashAggregate", "partial"],
    ))

    sections.append((
        "table_stats (ANALYZE stats in one scan: the multi-distinct "
        "aggregate plans as one Expand + partial aggs, stacked to "
        "rows by a literal pivot — no per-column re-scan)",
        plan_text(Q.q_table_stats(spark, args.sf_dir)),
        ["Expand", "HashAggregate", "partial"],
    ))

    sections.append((
        "bag_jaccard_pairs (multiset Jaccard: word-3-gram occurrences "
        "counted per (doc, xxhash64(g)) — 8-byte keys through every "
        "exchange, text never shuffles past the gram projection; "
        "posting self-join on the gram hash with sum(least(ca,cb)) "
        "as a map-side partial agg, two size joins)",
        plan_text(Q.q_bag_jaccard_pairs(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial", "least"],
    ))

    sections.append((
        "cluster_size_histogram (dup-cluster size distribution: two "
        "back-to-back partial-agg groupBys — md5 in the scan "
        "projection, the second exchange carries one row per distinct "
        "size; no window, no join)",
        plan_text(Q.q_cluster_size_histogram(spark, args.sf_dir)),
        ["md5", "HashAggregate", "partial_count"],
    ))

    sections.append((
        "tfidf_cosine_pairs (IDF-weighted shingle cosine: the "
        "bag_jaccard posting machinery with a weight payload — the "
        "gram-level df census joins back on the 8-byte xxhash64 key "
        "(never the gram string), N rides along as a 1-row broadcast "
        "literal, per-doc norms are one partial agg, and the posting "
        "self-join accumulates sum(wa*wb) map-side)",
        plan_text(Q.q_tfidf_cosine_pairs(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial", "BroadcastExchange"],
    ))

    sections.append((
        "token_entropy (per-doc Shannon entropy: counts on (doc_id, "
        "xxhash64(token)) — token strings never cross an exchange — "
        "then ONE per-doc partial agg computing n, n_types, and "
        "sum(c*ln c) together; no join, no window, linear in corpus "
        "tokens)",
        plan_text(Q.q_token_entropy(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial_count"],
    ))

    sections.append((
        "cms_freq_estimates (Count-Min sketch point queries: the "
        "d-lane explode runs over the vocab-bounded token census, "
        "NOT the occurrences; the counter table is <= d*16^w rows; "
        "the top-25 probe joins it on (lane, bkt) and takes a "
        "partial-agg min per term)",
        plan_text(Q.q_cms_freq_estimates(spark, args.sf_dir)),
        ["md5", "HashAggregate", "partial_min", "TakeOrdered"],
    ))

    sections.append((
        "pmi_top_bigrams (collocation census: unigram census "
        "broadcast to the bigram census on BOTH sides, totals as "
        "1-row broadcast literals, no window, no posting join — "
        "linear in corpus tokens)",
        plan_text(Q.q_pmi_top_bigrams(spark, args.sf_dir)),
        ["BroadcastHashJoin", "HashAggregate", "partial_count"],
    ))

    sections.append((
        "cluster_delete_repair (decremental maintenance: untouched "
        "components route around the re-solve via semi/anti hash "
        "joins — LeftSemi/LeftAnti in the plan, never a rebuild of "
        "the surviving corpus; only affected-component survivors "
        "reach the CC operator)",
        plan_text(Q.q_cluster_delete_repair(spark, args.sf_dir)),
        ["LeftSemi", "LeftAnti", "HashAggregate", "Union"],
    ))

    sections.append((
        "node_triangles (degree-oriented triangle enumeration: edges "
        "canonicalized with least/greatest, oriented small->large by "
        "(degree,id) so the exact-tier star hub generates zero wedges "
        "(out-degree bounded O(sqrt m)); wedge self-join + closing "
        "equi-join ship (long,long) keys only — no cartesian, no UDF)",
        plan_text(Q.q_node_triangles(spark, args.sf_dir)),
        ["least", "greatest", "HashAggregate", "partial_count"],
    ))

    sections.append((
        "triangle_summary (corpus transitivity: wedge count is one "
        "partial agg over degrees — never materialized as rows — and "
        "the triangle count reuses the oriented closing join; the "
        "three 1-row aggregates meet in broadcast crossJoins)",
        plan_text(Q.q_triangle_summary(spark, args.sf_dir)),
        ["HashAggregate", "partial_count", "BroadcastNestedLoopJoin"],
    ))

    sections.append((
        "graph_pagerank (fixed-k power iteration: the adjacency with "
        "src-degree attached is localCheckpoint-ed ONCE (ExistingRDD "
        "in-plan — the tier derivation never re-executes across "
        "iterations); each step is one shuffle of the 16-byte rank "
        "vector into a map-side-combined sum; N is a single scalar, "
        "never a per-row join)",
        plan_text(Q.q_graph_pagerank(spark, args.sf_dir)),
        ["ExistingRDD", "HashAggregate", "partial_sum"],
    ))

    sections.append((
        "clustering_agreement (pair-confusion algebra: contingency "
        "table localCheckpoint-ed once (ExistingRDD — the two CC "
        "solves never re-execute across the three 1-row aggregates); "
        "pair counts are closed-form C(n,2) sums with integer DIV — "
        "exact past 2^53 — and no pair set is ever materialized)",
        plan_text(Q.q_clustering_agreement(spark, args.sf_dir)),
        ["ExistingRDD", "HashAggregate", "partial_sum", " div "],
    ))

    sections.append((
        "asof_last_touch (backward as-of join, zero-join formulation: "
        "probes and references UNION into one relation, ONE "
        "hashpartitioning exchange on user_id feeds the window sweep "
        "ordered by (ts, side, event_id); strictness is the side "
        "tag's sort position at equal ts — NO join operator exists "
        "in the plan, pinned by the negative check)",
        plan_text(Q.q_asof_last_touch(spark, args.sf_dir)),
        ["Window", "hashpartitioning\\(user_id",
         r"(?s)\A(?!.*(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
         r"|BroadcastNestedLoop|CartesianProduct))"],
    ))

    sections.append((
        "error_blast_window (bucketized range join: the non-equi time "
        "predicate becomes a shuffled equi-join on (user_id, 30-min "
        "bin) with <=2x interval replication — NO BroadcastNestedLoop "
        "/ Cartesian (negative-pinned); exact predicate refines in "
        "the join, rollup map-side-combines, zero-window errors "
        "complete via a left join back to the small error side)",
        plan_text(Q.q_error_blast_window(spark, args.sf_dir)),
        ["__bin", "HashAggregate", "partial_count|partial_sum",
         r"(?s)\A(?!.*(BroadcastNestedLoop|CartesianProduct))"],
    ))

    sections.append((
        "weighted_sample_k (Efraimidis-Spirakis weighted take-k: the "
        "ES key is greatest() over <=8 md5 lanes — one narrow "
        "projection, no floats; the global top-k is the salted "
        "two-stage pattern, so two Window nodes with a filter "
        "between, never one single-task global sort of the corpus)",
        plan_text(Q.q_weighted_sample_k(spark, args.sf_dir)),
        ["Window", "md5", "greatest",
         r"(?s)\A(?!.*(BroadcastNestedLoop|CartesianProduct))"],
    ))

    sections.append((
        "props_json_profile (semi-structured profiling: "
        "json_object_keys explode + get_json_object path eval are JVM "
        "expressions inside WholeStageCodegen — JSON never reaches "
        "Python (no ArrowEval/BatchEval anywhere); one scan, "
        "map-side-combined aggregate)",
        plan_text(Q.q_props_json_profile(spark, args.sf_dir)),
        ["jsonObjectKeys", "get_json_object", "Generate",
         "HashAggregate", "partial_count|partial_sum",
         r"(?s)\A(?!.*(ArrowEvalPython|MapInPandas|BatchEvalPython))"],
    ))

    sections.append((
        "session_funnel (ordered-step sequence matching: lag+cumsum "
        "session labels on ONE user_id exchange, then three chained "
        "conditional-min windows over (user_id, sid) sharing a single "
        "additional exchange — two shuffles total, no joins, no "
        "Python; the strictly-after step semantics live in the "
        "window expressions)",
        plan_text(Q.q_session_funnel(spark, args.sf_dir)),
        ["Window", "hashpartitioning\\(user_id", "HashAggregate",
         r"(?s)\A(?!.*(SortMergeJoin|BroadcastHashJoin|BatchEvalPython"
         r"|ArrowEvalPython))"],
    ))

    sections.append((
        "dup_rate_alerts (anomaly alerting over the drift census: the "
        "dup_rate_drift plan — map-side-combined min per 8-byte "
        "content key + bounded bucket groupBy — then ONE global "
        "window over the bucket CENSUS (corpus/100 rows, not data) "
        "computing the integer trailing median; all comparisons "
        "integer, no stddev floats)",
        plan_text(Q.q_dup_rate_alerts(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial_min", "Window",
         "array_sort"],
    ))

    sections.append((
        "cluster_eccentricity (per-cluster stretch audit: ONE "
        "multi-source BFS serves every cluster — components are "
        "disjoint so rep frontiers cannot leak; k relaxation rounds "
        "of frontier equi-join + map-side-combined min, then a "
        "partial-agg rollup per cluster)",
        plan_text(Q.q_cluster_eccentricity(spark, args.sf_dir)),
        ["ExistingRDD", "HashAggregate", "partial_min", "partial_max"],
    ))

    sections.append((
        "k_anonymity_audit (privacy release gate: ONE map-side-"
        "combined groupBy over the quasi-identifier tuple, length "
        "bucket as a pure projection — single shuffle, integer-only)",
        plan_text(Q.q_k_anonymity_audit(spark, args.sf_dir)),
        ["HashAggregate", "partial_count", "ReadSchema"],
    ))

    sections.append((
        "revenue_cube (all four grouping sets from ONE Expand + one "
        "map-side-combined aggregate; the per-year marginal rollup "
        "cannot produce comes at no extra pass)",
        plan_text(Q.q_revenue_cube(spark, args.sf_dir)),
        ["Expand", "HashAggregate", "partial_count",
         "BroadcastHashJoin", r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "embedding_component_stats (higher-order array functions: "
        "transform/filter/aggregate/array_max as JVM codegen over "
        "array<float> — zero Python, zero Arrow hop, no shuffle; "
        "the narrow projection fused into the scan)",
        plan_text(Q.q_embedding_component_stats(spark, args.sf_dir)),
        ["transform", "aggregate", "ReadSchema",
         r"(?s)\A(?!.*(ArrowEvalPython|MapInPandas|BatchEvalPython"
         r"|Exchange.*hashpartitioning))"],
    ))

    sections.append((
        "order_vs_customer_avg (decorrelated scalar subquery: ONE "
        "window over o_custkey replaces a per-row correlated "
        "subquery; integer-exact predicate in codegen; no join)",
        plan_text(Q.q_order_vs_customer_avg(spark, args.sf_dir)),
        ["Window", "hashpartitioning\(o_custkey",
         r"(?s)\A(?!.*(SortMergeJoin|BroadcastHashJoin))"],
    ))

    sections.append((
        "dormant_customers (LeftAnti churn shape: window-filtered "
        "orders pre-aggregate to distinct custkeys before the "
        "anti-join, both probe sides broadcast — the customer table "
        "streams through without shuffling)",
        plan_text(Q.q_dormant_customers(spark, args.sf_dir)),
        ["LeftAnti", "BroadcastHashJoin", "HashAggregate",
         r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "revenue_rollup (multi-level subtotals: ONE Expand into 3 "
        "grouping sets feeding one map-side-combined aggregate — the "
        "fact-dim broadcast join runs once, not once per level)",
        plan_text(Q.q_revenue_rollup(spark, args.sf_dir)),
        ["Expand", "HashAggregate", "partial_count",
         "BroadcastHashJoin", r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "events_day_pivot (declared-values pivot: one map-side-"
        "combined conditional aggregation, no distinct-values pre-job "
        "over the fact table, no join)",
        plan_text(Q.q_events_day_pivot(spark, args.sf_dir)),
        ["HashAggregate", "partial_count",
         r"(?s)\A(?!.*(SortMergeJoin|BroadcastHashJoin))"],
    ))

    sections.append((
        "tpch_q18_large_orders (aggregate-then-join: ONE map-side-"
        "combined groupBy collapses the fact table to the qualifying "
        "survivor set, which broadcasts into orders and customer — "
        "the fact table never re-shuffles; no SortMergeJoin)",
        plan_text(Q.q_tpch_q18_large_orders(spark, args.sf_dir)),
        ["HashAggregate", "partial_sum", "BroadcastHashJoin",
         r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "customer_running_revenue (cumulative-window OLAP: ONE "
        "hashpartitioning exchange on o_custkey feeds the sort-based "
        "window; row_number and running sum share the frame; cents "
        "conversion in the scan projection so no doubles accumulate)",
        plan_text(Q.q_customer_running_revenue(spark, args.sf_dir)),
        ["Window", "hashpartitioning\(o_custkey", "ReadSchema"],
    ))

    sections.append((
        "tpch_q14_promo (part broadcast into the date-pruned lineitem "
        "scan; promo and total revenue ride ONE map-side-combined "
        "aggregate — single pass, no denominator rescan)",
        plan_text(Q.q_tpch_q14_promo(spark, args.sf_dir)),
        ["PushedFilters", "BroadcastHashJoin", "partial_sum",
         r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "tpch_q5_local_supplier (six-table star join: the whole "
        "region->nation->customer dimension chain and the supplier "
        "table broadcast, date range pushed to the orders scan, fact "
        "table joins broadcast hashes only — no SortMergeJoin — and "
        "the local-supplier predicate evaluates inside codegen)",
        plan_text(Q.q_tpch_q5_local_supplier(spark, args.sf_dir)),
        ["PushedFilters", "BroadcastHashJoin", "HashAggregate",
         "partial_sum", r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "tpch_q3_shipping (join-shaped OLAP: segment + date filters "
        "pushed to the dimension scans, both dim sides broadcast so "
        "the fact table never re-partitions before the joins, "
        "map-side-combined agg, TakeOrdered top-N instead of a "
        "global sort)",
        plan_text(Q.q_tpch_q3_shipping(spark, args.sf_dir)),
        ["PushedFilters", "BroadcastHashJoin", "HashAggregate",
         "TakeOrderedAndProject",
         r"(?s)\A(?!.*SortMergeJoin)"],
    ))

    sections.append((
        "tpch_q1_pricing (plain-OLAP side: shipdate cutoff PUSHED to "
        "the parquet scan, one map-side-combined groupBy into 4 "
        "groups, exact integer money — the canonical scan+agg)",
        plan_text(Q.q_tpch_q1_pricing(spark, args.sf_dir)),
        ["PushedFilters", "HashAggregate", "partial_count",
         "partial_sum"],
    ))

    sections.append((
        "wasted_space_by_source (storage-waste attribution: map-side-"
        "combined min per 8-byte xxhash64 content key + join back, "
        "bounded source groupBy, integer per-mille rates)",
        plan_text(Q.q_wasted_space_by_source(spark, args.sf_dir)),
        ["xxhash64", "HashAggregate", "partial_min", "partial_sum"],
    ))

    sections.append((
        "tier_venn (verification-tier agreement census: two existing "
        "posting-join pair derivations, one full-outer join of (ia, "
        "ib) keys, fingerprint attach joins, <=8-group census — no "
        "new quadratic surface)",
        plan_text(Q.q_tier_venn(spark, args.sf_dir)),
        ["FullOuter", "HashAggregate", "partial_count", "xxhash64"],
    ))

    sections.append((
        "snapshot_merge3 (three-way corpus merge: per-side md5 "
        "fingerprints BEFORE two full-outer joins on the SAME id key "
        "— 40-byte rows through the exchanges, null-safe compares, "
        "output bounded by churn)",
        plan_text(Q.q_snapshot_merge3(spark, args.sf_dir)),
        ["md5", "FullOuter", "SortMergeJoin|ShuffledHashJoin"],
    ))

    sections.append((
        "contam_spread (multi-hop contamination risk: symmetrized dup "
        "edges localCheckpoint-ed once (ExistingRDD), then k BFS "
        "relaxation rounds — each one equi-join frontier expansion + "
        "map-side-combined min over 12-byte rows; the eval gram probe "
        "stays a semi-join, never a corpus shuffle on the gram)",
        plan_text(Q.q_contam_spread(spark, args.sf_dir)),
        ["ExistingRDD", "LeftSemi", "HashAggregate", "partial_min"],
    ))

    # speed-ladder edges over a tiny synthetic clips table: posting
    # equi-join on band keys, bit_count verify inline — no cartesian
    sections.append((
        "speed_edges (speed-perturbation tier: hypothesis rows join "
        "IDENTITY posting rows on band keys (asymmetric — (1+S)n "
        "rows), bit_count(xor) verify inside the join's codegen pass, "
        "min(struct) merge — no cartesian, no BNLJ)",
        plan_text(
            __import__(
                "file_dedup_rust_spark.operators.speed_ladder",
                fromlist=["speed_edges", "speed_hypothesis_rows"],
            ).speed_edges(
                __import__(
                    "file_dedup_rust_spark.operators.speed_ladder",
                    fromlist=["speed_hypothesis_rows"],
                ).speed_hypothesis_rows(clips, DEFAULT_CONFIG),
                DEFAULT_CONFIG,
            )
        ),
        ["bit_count", "HashAggregate", "partial_min"],
    ))

    failures = []
    out_lines = ["# Physical plans (generated by tools/explain_plans.py)\n"]
    for title, text, must in sections:
        out_lines.append(f"\n## {title}\n\n```\n{text}\n```\n")
        for pat in must:
            import re

            if not re.search(pat, text):
                failures.append(f"{title}: missing /{pat}/")
        if "BatchEvalPython" in text:
            failures.append(f"{title}: row-at-a-time Python UDF in plan!")

    report = "\n".join(out_lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    else:
        print(report[:4000])
    if failures:
        print("\nPLAN CHECK FAILURES:")
        for f in failures:
            print(" -", f)
    else:
        print("\nall plan checks passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
