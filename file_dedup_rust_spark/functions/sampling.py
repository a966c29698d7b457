"""Deterministic stratified sampling — the corpus-mixing primitive a
training-data pipeline runs after dedup/decontamination: keep stratum
s (language, source, quality bucket) at rate r_s, reproducibly.

Spark's df.sample() is seed-dependent per partition split — rerunning
after a repartition keeps a DIFFERENT subset, which is unacceptable
for training-data lineage.  This sampler derives keep/drop from the
row KEY alone (Knuth multiplicative hash, Knuth TAOCP vol. 3 §6.4),
so the decision is a pure JVM expression: no shuffle, no state, no
seed file, and the same rows survive on any cluster size, partition
count, or engine (the DuckDB oracle reproduces it in plain SQL).

At 100 TB this is a filter fused into the scan stage — zero extra
passes; the per-stratum rate lookup is a CASE expression, not a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2_654_435_761  # 2^32 / phi, TAOCP vol. 3 §6.4
_MOD = 4_294_967_296  # 2^32


def sample_bucket(key: Column) -> Column:
    """key (non-negative integral) -> deterministic bucket in [0, 1000).

    (key * KNUTH) mod 2^32 mod 1000 — stays inside int64 for keys
    below ~3.4e9; for wider key spaces pre-fold the key with pmod
    first (Spark 4 ANSI mode makes a silent overflow an error, not a
    wrong answer)."""
    return F.pmod(F.pmod(key * F.lit(KNUTH_MULT), F.lit(_MOD)), F.lit(1000))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_per_mille: dict[str, int],
    default_per_mille: int,
) -> DataFrame:
    """Keep each row iff its key's bucket falls under its stratum's
    rate (‰).  Pure narrow filter — preserves partitioning."""
    rate: Column = F.lit(default_per_mille)
    for stratum, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(sample_bucket(F.col(key_col)) < rate)
