"""Session-funnel ordering semantics on hand-planted timelines:
out-of-order steps never convert, equal timestamps are strict misses,
and the 30-minute gap splits a would-be conversion."""

from __future__ import annotations

import datetime as dt

import file_dedup_rust_spark.entry.testdata_queries as Q


def _events_df(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, u, base + dt.timedelta(seconds=t), ty, 1.0, "{}")
            for i, (u, t, ty) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )


def _funnel(spark, rows, tmp_path):
    path = str(tmp_path / "events.parquet")
    _events_df(spark, rows).write.mode("overwrite").parquet(path)
    # the query reads <dir>/events.parquet
    r = Q.q_session_funnel(spark, str(tmp_path)).collect()[0]
    return (
        r["n_sessions"],
        r["n_view"],
        r["n_view_click"],
        r["n_full_funnel"],
    )


def test_funnel_converts_in_order(spark, tmp_path):
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")]
    assert _funnel(spark, rows, tmp_path) == (1, 1, 1, 1)


def test_funnel_out_of_order_does_not_convert(spark, tmp_path):
    """click BEFORE the first view: step 2 never fires even though
    both types are present in the session."""
    rows = [(1, 0, "click"), (1, 10, "view"), (1, 20, "purchase")]
    assert _funnel(spark, rows, tmp_path) == (1, 1, 0, 0)


def test_funnel_purchase_before_click_stops_at_step2(spark, tmp_path):
    rows = [(1, 0, "view"), (1, 10, "purchase"), (1, 20, "click")]
    assert _funnel(spark, rows, tmp_path) == (1, 1, 1, 0)


def test_funnel_equal_ts_is_strict(spark, tmp_path):
    """A click at EXACTLY the first view's timestamp does not count
    (strictly-after semantics)."""
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 20, "purchase")]
    assert _funnel(spark, rows, tmp_path) == (1, 1, 0, 0)


def test_funnel_gap_splits_session(spark, tmp_path):
    """view ... 30-minute gap ... click+purchase: two sessions, the
    first has only the view, the second has no view — nothing
    converts past step 1."""
    rows = [(1, 0, "view"), (1, 1800, "click"), (1, 1810, "purchase")]
    assert _funnel(spark, rows, tmp_path) == (2, 1, 0, 0)


def test_funnel_users_independent(spark, tmp_path):
    rows = [
        (1, 0, "view"),
        (1, 10, "click"),
        (2, 5, "purchase"),
        (2, 15, "view"),
    ]
    assert _funnel(spark, rows, tmp_path) == (2, 2, 1, 0)


def test_funnel_later_view_can_rescue_nothing(spark, tmp_path):
    """Funnel anchors on the FIRST view: a later view does not restart
    the sequence (click before the first view stays unmatched, click
    after it converts)."""
    rows = [
        (1, 0, "click"),
        (1, 10, "view"),
        (1, 20, "view"),
        (1, 30, "click"),
        (1, 40, "purchase"),
    ]
    assert _funnel(spark, rows, tmp_path) == (1, 1, 1, 1)
