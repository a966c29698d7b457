"""k-anonymity audit: a planted singleton QI combination flags risky,
a >=k group does not, and bucket boundaries split groups correctly."""

from __future__ import annotations

import file_dedup_rust_spark.entry.testdata_queries as Q


def test_k_anonymity_flags_small_groups(spark, tmp_path):
    rows = []
    # 10 docs sharing one QI tuple (en, web, bucket 1) -> safe
    for i in range(10):
        rows.append((i, "x", "en", "web", 150))
    # a single isolated doc (de, rare-src, bucket 9) -> risky
    rows.append((100, "y", "de", "rare-src", 950))
    # 4 docs right below k=5 -> risky
    for i in range(4):
        rows.append((200 + i, "z", "fr", "web", 150))
    # same lang/source as the safe group but across a bucket edge:
    # n_chars 199 vs 200 land in buckets 1 vs 2
    rows.append((300, "w", "en", "web", 199))  # joins the 10 -> n=11
    rows.append((301, "w", "en", "web", 200))  # alone in bucket 2
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["lang"], r["source"], r["len_bucket"]): (r["n"], r["risky"])
        for r in Q.QUERIES["k_anonymity_audit"](spark, str(tmp_path)).collect()
    }
    assert got[("en", "web", 1)] == (11, 0)
    assert got[("en", "web", 2)] == (1, 1)
    assert got[("de", "rare-src", 9)] == (1, 1)
    assert got[("fr", "web", 1)] == (4, 1)
