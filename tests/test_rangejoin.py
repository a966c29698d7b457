"""Bucketized point-in-interval range join: half-open boundary
semantics, no duplicate output when an interval straddles bins, key
isolation, the no-BNLJ plan shape, and a brute-force cross-check."""

from __future__ import annotations

import datetime as dt

from file_dedup_rust_spark.operators.rangejoin import (
    range_join_point_in_interval,
)

BIN = 60 * 1_000_000  # 1-minute bins


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(a), _ts(b), iid) for (k, a, b, iid) in rows],
        "k long, w_start timestamp, w_end timestamp, iid long",
    )


def _points(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), pid) for (k, t, pid) in rows],
        "k long, ts timestamp, pid long",
    )


def _run(spark, intervals, points):
    out = range_join_point_in_interval(
        _intervals(spark, intervals),
        _points(spark, points),
        "k",
        "w_start",
        "w_end",
        "ts",
        BIN,
    )
    return sorted((r["iid"], r["pid"]) for r in out.collect())


def test_range_half_open_boundaries(spark):
    """start is included, end is excluded, 1 us inside end matches."""
    iv = [(1, 60.0, 120.0, 10)]
    pts = [(1, 59.999999, 1), (1, 60.0, 2), (1, 119.999999, 3), (1, 120.0, 4)]
    assert _run(spark, iv, pts) == [(10, 2), (10, 3)]


def test_range_no_duplicates_across_bins(spark):
    """An interval spanning 3 bins emits each matching point ONCE —
    points map to a single bin, so bucketization needs no dedup."""
    iv = [(1, 30.0, 170.0, 10)]  # covers bins 0,1,2
    pts = [(1, 45.0, 1), (1, 90.0, 2), (1, 150.0, 3), (1, 171.0, 4)]
    assert _run(spark, iv, pts) == [(10, 1), (10, 2), (10, 3)]


def test_range_overlapping_intervals_each_match(spark):
    iv = [(1, 0.0, 100.0, 10), (1, 50.0, 150.0, 11)]
    pts = [(1, 75.0, 1)]
    assert _run(spark, iv, pts) == [(10, 1), (11, 1)]


def test_range_keys_isolated(spark):
    iv = [(1, 0.0, 100.0, 10)]
    pts = [(2, 50.0, 1)]
    assert _run(spark, iv, pts) == []


def test_range_payload_collision_raises(spark):
    import pytest

    iv = _intervals(spark, [(1, 0.0, 1.0, 10)]).withColumnRenamed(
        "iid", "pid"
    )
    with pytest.raises(ValueError, match="pid"):
        range_join_point_in_interval(
            iv, _points(spark, [(1, 0.5, 1)]), "k", "w_start", "w_end",
            "ts", BIN,
        )


def test_range_plan_is_equi_join(spark):
    """The whole point: the time predicate must become a shuffled
    equi-join on (key, bin) — never BroadcastNestedLoop/Cartesian."""
    import contextlib
    import io

    out = range_join_point_in_interval(
        _intervals(spark, [(1, 0.0, 100.0, 10)]),
        _points(spark, [(1, 50.0, 1)]),
        "k",
        "w_start",
        "w_end",
        "ts",
        BIN,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "__bin" in plan


def test_range_brute_force_crosscheck(spark):
    """Seeded random fixture vs a python brute force, including
    fractional-second edges around bin boundaries."""
    import random

    rng = random.Random(11)
    iv = [
        (rng.randrange(4), a := rng.randrange(4000) / 4.0,
         a + rng.randrange(1, 600) / 2.0, 100 + i)
        for i in range(60)
    ]
    pts = [
        (rng.randrange(4), rng.randrange(16000) / 4.0, i) for i in range(400)
    ]
    want = sorted(
        (iid, pid)
        for (ik, a, b, iid) in iv
        for (pk, t, pid) in pts
        if ik == pk and a <= t < b
    )
    assert _run(spark, iv, pts) == want
