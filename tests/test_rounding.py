"""round_dd: cross-engine double rounding pinned against DuckDB.

The round-5 driver run turned `dup_span_stats` hash-red because
Spark's round(double, 4) (BigDecimal HALF_UP on the exact decimal
expansion) disagrees with DuckDB's (std::round on the scaled double)
for half-way ratios like 142/1600.  round_dd mirrors DuckDB's
semantics; this test pins the mirror through Spark execution, on the
exact adversarial ratios plus random and ulp-neighbour cases.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd


# uses the session-scoped `spark` fixture from conftest.py — a local
# module fixture would getOrCreate the SAME underlying SparkContext
# and its teardown stop() would kill the shared session for every
# test file after this one


def _duck_round(xs: list[float], digits: int) -> list[float]:
    con = duckdb.connect()
    return [
        r[0]
        for r in con.execute(
            f"SELECT round(x, {digits}) FROM "
            "(SELECT unnest($1::DOUBLE[]) AS x)",
            [xs],
        ).fetchall()
    ]


def test_round_dd_matches_duckdb_on_ratios(spark):
    # the round-5 failure class: ratios whose SHORTEST decimal repr
    # (what Spark's BigDecimal.valueOf rounds) disagrees with
    # std::round on the scaled double (what DuckDB rounds) — e.g.
    # 29/20000 = 0.00145: Spark emits 0.0015, DuckDB 0.0014
    cases = [(29, 20000), (71, 20000), (113, 20000), (169, 20000)]
    rng = random.Random(99)
    cases += [
        (rng.randint(0, n), n)
        for n in (rng.randint(1, 5000) for _ in range(500))
    ]
    xs = [c / n for c, n in cases]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r[0]
        for r in df.select(round_dd(F.col("x"), 4).alias("y")).collect()
    ]
    want = _duck_round(xs, 4)
    assert got == want
    # and Spark's built-in round provably differs on the seed cases
    builtin = [
        r[0] for r in df.select(F.round("x", 4).alias("y")).collect()
    ]
    assert builtin[:4] != want[:4]


@pytest.mark.parametrize("digits", [0, 2, 4, 6])
def test_round_dd_matches_duckdb_general(spark, digits):
    rng = random.Random(7 + digits)
    xs = [rng.uniform(-2.0, 2.0) for _ in range(300)]
    xs += [rng.uniform(-1e4, 1e4) for _ in range(300)]
    # ulp-adversarial exact halves and neighbours
    for k in range(-20, 20):
        base = (2 * k + 1) / (2 * 10**digits)
        xs += [base, math.nextafter(base, 0), math.nextafter(base, math.inf)]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r[0]
        for r in df.select(round_dd(F.col("x"), digits).alias("y")).collect()
    ]
    want = _duck_round(xs, digits)
    assert got == want
