"""Dup-rate anomaly alerts: planted re-upload buckets fire 'spike' on
testdata, a synthetic high→zero dup series fires 'collapse', and the
empty-trail first bucket is always 'none'."""

from __future__ import annotations

import file_dedup_rust_spark.entry.testdata_queries as Q


def test_alerts_on_testdata_fire_spike(spark):
    rows = Q.QUERIES["dup_rate_alerts"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_alert = {}
    for r in rows:
        by_alert.setdefault(r["alert"], []).append(r)
    assert rows[0]["alert"] == "none" and rows[0]["median_pm"] is None
    # the planted copies (doc_id + 1e6) land in late buckets at
    # dup_pm 1000 against a low organic median -> provable spike
    spikes = by_alert.get("spike", [])
    assert spikes, [r.asDict() for r in rows]
    assert any(r["dup_pm"] == 1000 for r in spikes)


def test_alerts_collapse_on_synthetic_series(spark, tmp_path):
    """Buckets 0..7 run ~50% dup; buckets 8-9 drop to 0% -> the
    trailing median stays high and the clean buckets page 'collapse'."""
    rows = []
    for b in range(10):
        for i in range(100):
            doc_id = b * 100 + i
            if b < 8 and i >= 50:
                text = f"shared text {b} {i % 10}"  # 50 dups per bucket
            else:
                text = f"unique text {doc_id}"
            rows.append((doc_id, text, "en", "s", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["bucket"]: r["alert"]
        for r in Q.QUERIES["dup_rate_alerts"](spark, str(tmp_path)).collect()
    }
    assert got[0] == "none"
    assert got[3] == "ok"  # steady 50% vs 50% median
    assert got[8] == "collapse" and got[9] == "collapse"
