"""Three-way snapshot merge: hand-planted branch edits hit every
class, deletions are fingerprint-NULL (no special-casing), untouched
rows emit nothing, and all four classes appear in the driver fixture."""

from __future__ import annotations

from file_dedup_rust_spark.operators.delta import snapshot_merge3


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, t string")


def test_merge3_classes(spark):
    base = _snap(
        spark,
        [
            (1, "a"),  # ours edits -> take_ours
            (2, "b"),  # theirs edits -> take_theirs
            (3, "c"),  # both edit identically -> both_same
            (4, "d"),  # both edit differently -> conflict
            (5, "e"),  # untouched -> no output
            (6, "f"),  # ours deletes, theirs untouched -> take_ours
            (7, "g"),  # both delete -> both_same
            (8, "h"),  # ours deletes, theirs edits -> conflict
        ],
    )
    ours = _snap(
        spark,
        [(1, "a2"), (2, "b"), (3, "c2"), (4, "d-ours"), (5, "e"),
         (9, "new-ours")],  # 6,7,8 deleted; 9 added -> take_ours
    )
    theirs = _snap(
        spark,
        [(1, "a"), (2, "b2"), (3, "c2"), (4, "d-theirs"), (5, "e"),
         (6, "f"), (8, "h2"), (10, "new-theirs")],  # 7 deleted
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_merge3(base, ours, theirs).collect()
    }
    assert got == {
        1: "take_ours",
        2: "take_theirs",
        3: "both_same",
        4: "conflict",
        6: "take_ours",
        7: "both_same",
        8: "conflict",
        9: "take_ours",
        10: "take_theirs",
    }


def test_merge3_both_added_identical_is_both_same(spark):
    base = _snap(spark, [(1, "x")])
    ours = _snap(spark, [(1, "x"), (2, "shared-add")])
    theirs = _snap(spark, [(1, "x"), (2, "shared-add")])
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_merge3(base, ours, theirs).collect()
    }
    assert got == {2: "both_same"}


def test_merge3_driver_fixture_plants_every_class(spark):
    import file_dedup_rust_spark.entry.testdata_queries as Q

    rows = Q.QUERIES["snapshot_merge3"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    classes = {r["status"] for r in rows}
    assert classes == {"take_ours", "take_theirs", "both_same", "conflict"}
