"""Range join (point-in-interval) — the second temporal operator Spark
lacks natively.  A naive `p.ts BETWEEN i.start AND i.end` join has no
equi-key, so Spark plans BroadcastNestedLoopJoin / CartesianProduct —
the O(n·m) scale-killer.  The standard fix (what Databricks' range-join
optimization and KDB's window joins do internally) is BUCKETIZATION:
quantize time into fixed-width bins, replicate each interval onto the
bins it overlaps (≤ ceil(len/bin)+1 rows), map each point to its single
bin, equi-join on (key, bin), and re-check the exact predicate.  The
join becomes a plain shuffled equi-join the optimizer already knows how
to schedule, and — because a point lives in exactly ONE bin and an
interval covers each of its bins ONCE — the output needs no dedup.

Why the dedup engine carries it: quarantine/takedown windows (which
re-uploads arrived inside the blast window after an incident), burst
attribution around error events, and joining scan events to the
config-revision interval that was live — the interval-shaped sibling
of `operators/asof.py` (as-of = latest-earlier point; range = all
points inside a span).

Scale shape: one narrow explode on the (small) interval side, one
shuffle on the 16-byte (key, bin) pair, exact predicate refined inside
the join's codegen.  Skew = events per key per bin — bounded by real
event rate, and a hot key salts exactly like any equi-join.  Bin width
is the caller's window length, so interval replication is ≤ 2×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# TIMESTAMP_NTZ-safe monotone micros (unix_micros rejects NTZ — same
# gotcha as user_sessions): micros since a fixed anchor, sign-safe.
_ANCHOR = "timestamp'1970-01-01 00:00:00'"


def _mu(col: str) -> F.Column:
    return F.expr(f"timestampdiff(MICROSECOND, {_ANCHOR}, {col})")


def range_join_point_in_interval(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start: str,
    end: str,
    ts: str,
    bin_micros: int,
) -> DataFrame:
    """Inner join of every `points` row to every same-`key` interval
    with start <= ts < end (half-open).  Output carries all interval
    columns plus the points' payload; payload names must not collide.
    `bin_micros` should be ~the typical interval length (replication
    factor = len/bin + 1)."""
    i_extra = [c for c in intervals.columns if c not in (key, start, end)]
    p_extra = [c for c in points.columns if c != key]
    clash = (set(i_extra) | {start, end}) & set(p_extra)
    if clash:
        raise ValueError(f"payload column collision: {sorted(clash)}")
    b = F.lit(int(bin_micros)).cast("long")
    # floor-div that is correct for negative micros too
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_mu(start) / b),
                # half-open: the bin of the last INCLUDED microsecond
                F.floor((_mu(end) - F.lit(1)) / b),
            )
        ),
    )
    pb = points.withColumn("__bin", F.floor(_mu(ts) / b))
    joined = ib.join(pb, [key, "__bin"]).filter(
        (_mu(ts) >= _mu(start)) & (_mu(ts) < _mu(end))
    )
    return joined.drop("__bin")
