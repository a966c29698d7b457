"""Backward as-of join — the temporal "state in effect at event time"
operator Spark's DataFrame API lacks natively (kdb's `aj`, Flink's
temporal table join, Pandas `merge_asof`; Spark users usually fake it
with a range join + argmax, which shuffles the cross-range blowup).

Why the dedup engine carries it: every ingest event is interpreted
against the most recent earlier state — which corpus snapshot /
config revision / threshold setting was live when this scan fired,
which prior user touch a purchase attributes to, which upload a
takedown targets.  The ledger tables (`sources/table_io.py`) and the
events stream are exactly the two sides of this join.

Scale shape — the zero-join formulation: instead of joining at all,
UNION the probe and reference rows with a side tag and run ONE window
over the key, ordered by (ts, side, tiebreak), taking
last(ref_attr, ignorenulls) up to the current row.  The physical plan
is a single hashpartitioning exchange on the key + one sort — no join
operator exists in the plan, so there is no range-explosion, no skew
amplification beyond the key's own row count, and no build side to
size.  This is the classic sessionization-family trick (the same
single-exchange shape as `user_sessions`): at 10^12 events it is the
plan you would hand-write — sort each user's timeline once, sweep it
once.  Strictness is encoded purely in the side tag's sort position
at equal timestamps, so ties cost nothing.

Reference analog: the job/status ledger lookups
(`/root/reference/backend/src/worker/mod.rs` status transitions read
"current state as of now"); generalized here to as-of any timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probes: DataFrame,
    refs: DataFrame,
    key: str,
    ts: str,
    order: str,
    strict: bool = True,
) -> DataFrame:
    """For each probe row, attach the reference row with the greatest
    (ts, order) among same-`key` reference rows earlier than the probe
    — strictly earlier when `strict` (ties at equal ts do NOT match:
    "state in effect before the event"), earlier-or-equal otherwise.
    Probes with no earlier reference keep NULL reference columns (left
    as-of join).

    Both inputs must carry `key`, `ts` and a `order` tiebreak column;
    every OTHER column of `refs` is the attached payload (alias a copy
    of `ts` into the payload to receive the matched timestamp), every
    other column of `probes` passes through.  Payload names must not
    collide.

    Deterministic for any input: among equal-(ts) references the
    larger `order` wins; `order` also dedups the window sort.
    """
    p_extra = [c for c in probes.columns if c not in (key, ts, order)]
    r_extra = [c for c in refs.columns if c not in (key, ts, order)]
    clash = set(p_extra) & set(r_extra)
    if clash:
        raise ValueError(f"payload column collision: {sorted(clash)}")
    p_types = {f.name: f.dataType for f in probes.schema.fields}
    r_types = {f.name: f.dataType for f in refs.schema.fields}
    # at equal ts the window must order the reference row AFTER the
    # probe to exclude it (strict) or BEFORE it to include it (<=)
    probe_side, ref_side = (0, 1) if strict else (1, 0)
    p = probes.select(
        key,
        ts,
        order,
        F.lit(probe_side).alias("__side"),
        *p_extra,
        *[F.lit(None).cast(r_types[c]).alias(c) for c in r_extra],
    )
    r = refs.select(
        key,
        ts,
        order,
        F.lit(ref_side).alias("__side"),
        *[F.lit(None).cast(p_types[c]).alias(c) for c in p_extra],
        *r_extra,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side", order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in r_extra
    ]
    return (
        p.unionByName(r)
        .select(key, ts, order, "__side", *p_extra, *matched)
        .filter(F.col("__side") == probe_side)
        .drop("__side")
    )
