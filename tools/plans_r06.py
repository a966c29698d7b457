#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6 optimization targets into
plans/r06/<query>_<tag>.txt (tag = before/after).

    python tools/plans_r06.py before [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "minhash_lsh_pairs", "knn_topk", "ann_ivf_topk", "ann_ivf_pq_topk",
    "cc_clusters", "ngram_jaccard_pairs", "tier_dedup_summary",
    "node_triangles", "triangle_summary", "graph_pagerank",
    "clustering_agreement", "contam_spread", "cluster_delete_repair",
    "cluster_eccentricity", "cluster_best_rep", "tier_venn",
    "allpairs_jaccard", "snm_neardup_pairs", "dedup_threshold_curve",
    "edit_verified_pairs", "winnow_matches", "ngram_containment_pairs",
    "bag_jaccard_pairs", "tfidf_cosine_pairs", "paraphrase_pairs",
    "stale_embedding_pairs", "lsh_cosine_neardup_pairs",
    "containment_pairs", "dup_span_stats", "bow_dup_groups",
    "semdedup_prune", "corpus_build_funnel",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from file_dedup_rust_spark.entry.testdata_queries import QUERIES
    from file_dedup_rust_spark.session import build_session

    spark = build_session("plans_r06", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} bytes, {n_ex} Exchange mentions")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
