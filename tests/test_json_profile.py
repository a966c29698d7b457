"""JSON payload profiling robustness: malformed / empty / NULL
payloads parse to NULL JVM-side (never an executor error) and drop out
of the key census; valid rows are unaffected."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_json_profile_survives_garbage(spark):
    rows = [
        (1, "click", '{"k": 10}'),
        (2, "click", '{"k": "notanint"}'),
        (3, "click", "{broken"),
        (4, "click", ""),
        (5, "click", None),
        (6, "view", '{"k": 99, "extra": true}'),
    ]
    e = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    k = F.get_json_object("props", "$.k").try_cast("long")
    keyed = e.select(
        "event_type",
        F.explode(F.json_object_keys("props")).alias("jkey"),
        k.alias("kv"),
    )
    got = {
        (r["event_type"], r["jkey"]): (r["n"], r["n_int"], r["sum_k"])
        for r in keyed.groupBy("event_type", "jkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("kv").isNotNull().cast("long")).alias("n_int"),
            F.sum("kv").alias("sum_k"),
        )
        .collect()
    }
    # broken/empty/null payloads vanish from the census; the
    # string-valued k row keeps its key but contributes no integer
    assert got[("click", "k")] == (2, 1, 10)
    assert got[("view", "k")] == (1, 1, 99)
    assert got[("view", "extra")] == (1, 1, 99)
    assert ("click", "broken") not in got


def test_json_profile_matches_driver_contract(spark):
    import file_dedup_rust_spark.entry.testdata_queries as Q

    rows = Q.QUERIES["props_json_profile"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5  # one key per event type
    for r in rows:
        assert r["jkey"] == "k"
        assert r["n_int"] == r["n_with_key"]  # synthetic payloads all int
