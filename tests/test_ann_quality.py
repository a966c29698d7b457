"""ANN quality gate: the IVF scale path must retain a usable fraction
of the exact brute-force top-k (reference J2 semantics, OpenSearch
ef_search=100 HNSW — an approximate index with bounded per-probe work,
/root/reference/iac/opensearch_indexes.tf:8-14).

Measured on the sf0.01 embeddings table: recall@10 = 0.58 with
nprobe=2 of 10 coarse cells (i.e. scanning ~20% of the corpus per
probe).  The gate asserts >= 0.5 so regressions in the bucketing or
ranking logic fail loudly while leaving margin for data refreshes.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_recall_vs_brute(spark):
    from file_dedup_rust_spark.entry import testdata_queries as Q

    brute = {
        (r["vec_id"], r["neighbor_id"])
        for r in Q.q_knn_topk(spark, SF_DIR).collect()
    }
    ivf = {
        (r["vec_id"], r["neighbor_id"])
        for r in Q.q_ann_ivf_topk(spark, SF_DIR).collect()
    }
    assert brute, "brute-force top-k is empty"
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall@10 vs brute = {recall:.3f}"
    # every IVF probe still returns a full (or capped) neighbour list
    probes = {v for v, _ in ivf}
    assert len(ivf) >= 5 * len(probes)
