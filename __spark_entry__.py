"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: near-duplicate clustering of the sf0.001
documents table (MinHash-LSH candidates -> exact-Jaccard verify ->
exact-hash star edges -> connected components -> cluster summary).

`queries()` / `oracle_sql()` — one entry per SQL-expressible operator
from SURVEY.md §2 plus the training-data-pipeline operators; oracle SQL
runs on DuckDB over the same parquet tables.  Every entry has an
oracle: the approximate ANN operators run on a planted clustered
corpus where the probe budget provably covers every true top-k pair,
so exact brute-force SQL checks them hash-exactly (their isotropic
worst-case recall stays pytest-gated in tests/test_ann_quality.py).

The non-SQL-expressible parts of the engine (audio decode SNR
invariants, SimHash over spectral features, winnowing/suffix-array
containment, checkpoint/resume) are verified by `python -m pytest -x
-q` against the in-repo numpy oracle (recall >= 0.99 gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dup-cluster summary over sf0.001 documents."""
    from file_dedup_rust_spark.entry.testdata_queries import q_cluster_summary

    return q_cluster_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from file_dedup_rust_spark.entry.testdata_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from file_dedup_rust_spark.entry.testdata_queries import ORACLES

    return dict(ORACLES)
