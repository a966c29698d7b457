"""Backward as-of join: strictness at equal timestamps, tie-break
determinism among equal-ts references, left semantics for probes with
no earlier reference, per-key isolation, and the zero-join plan shape.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from file_dedup_rust_spark.operators.asof import asof_join_backward


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _df(spark, rows, extra=None):
    """rows: (key, ts_seconds, order, *extra_values)."""
    extra = extra or []
    schema = "k long, ts timestamp, oid long" + "".join(
        f", {name} {typ}" for name, typ in extra
    )
    return spark.createDataFrame(
        [(k, _ts(t), o, *rest) for (k, t, o, *rest) in rows], schema
    )


def _attach(spark, probes, refs, strict=True):
    out = asof_join_backward(
        _df(spark, probes),
        _df(spark, refs, extra=[("tag", "string")]),
        "k",
        "ts",
        "oid",
        strict=strict,
    )
    return {r["oid"]: r["tag"] for r in out.collect()}


def test_asof_picks_latest_earlier(spark):
    refs = [(1, 10.0, 100, "a"), (1, 20.0, 101, "b"), (1, 30.0, 102, "c")]
    probes = [(1, 25.0, 1), (1, 35.0, 2), (1, 5.0, 3)]
    got = _attach(spark, probes, refs)
    assert got == {1: "b", 2: "c", 3: None}


def test_asof_strict_excludes_equal_ts(spark):
    refs = [(1, 10.0, 100, "early"), (1, 20.0, 101, "tied")]
    probes = [(1, 20.0, 1)]
    assert _attach(spark, probes, refs, strict=True) == {1: "early"}
    assert _attach(spark, probes, refs, strict=False) == {1: "tied"}


def test_asof_equal_ts_refs_tiebreak_by_order(spark):
    """Two references at the identical timestamp: the larger tiebreak
    id wins, deterministically."""
    refs = [(1, 10.0, 101, "lo"), (1, 10.0, 102, "hi")]
    probes = [(1, 11.0, 1)]
    assert _attach(spark, probes, refs) == {1: "hi"}


def test_asof_keys_are_isolated(spark):
    """A reference on another key never matches, even when nearer."""
    refs = [(1, 10.0, 100, "k1"), (2, 19.0, 101, "k2")]
    probes = [(1, 20.0, 1), (2, 20.0, 2), (3, 20.0, 3)]
    assert _attach(spark, probes, refs) == {1: "k1", 2: "k2", 3: None}


def test_asof_payload_collision_raises(spark):
    p = _df(spark, [(1, 1.0, 1, "p")], extra=[("tag", "string")])
    r = _df(spark, [(1, 0.5, 2, "r")], extra=[("tag", "string")])
    try:
        asof_join_backward(p, r, "k", "ts", "oid")
        raise AssertionError("collision not detected")
    except ValueError as e:
        assert "tag" in str(e)


def test_asof_plan_has_no_join(spark):
    """The zero-join formulation: ONE hashpartitioning exchange on the
    key, a Window, and no join operator anywhere in the plan."""
    p = _df(spark, [(1, 2.0, 1)])
    r = _df(spark, [(1, 1.0, 2, "x")], extra=[("tag", "string")])
    out = asof_join_backward(p, r, "k", "ts", "oid")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    assert "Join" not in plan
    assert "Window" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(k" in plan


def test_asof_probe_columns_pass_through(spark):
    p = _df(spark, [(1, 2.0, 1, 7.5)], extra=[("val", "double")])
    r = _df(spark, [(1, 1.0, 2, "x")], extra=[("tag", "string")])
    row = asof_join_backward(p, r, "k", "ts", "oid").collect()[0]
    assert row["val"] == 7.5 and row["tag"] == "x"
    assert row["ts"] == _ts(2.0)


def test_asof_matches_pandas_merge_asof_semantics(spark):
    """Cross-check against a brute-force python argmax over a random
    deterministic fixture (300 probes / 300 refs / 7 keys, seeded)."""
    import random

    rng = random.Random(7)
    refs = [
        (rng.randrange(7), rng.randrange(1000) / 4.0, 1000 + i, f"r{i}")
        for i in range(300)
    ]
    probes = [
        (rng.randrange(7), rng.randrange(1000) / 4.0, i) for i in range(300)
    ]
    got = _attach(spark, probes, refs)
    for k, t, oid in probes:
        cand = [r for r in refs if r[0] == k and r[1] < t]
        want = max(cand, key=lambda r: (r[1], r[2]))[3] if cand else None
        assert got[oid] == want, (k, t, oid)
