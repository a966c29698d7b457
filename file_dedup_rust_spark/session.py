"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "file_dedup_rust_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores, not the 200 default (over-parallelized
        # tiny shuffles burn more scheduling than compute)
        n = master[6:-1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 4)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at the default TRUE: LSH posting
        # tables are small in BYTES but their self-joins fan out m^2
        # per bucket, so size-based coalescing (parallelismFirst=false)
        # serialized the join explosion onto 1-2 tasks — measured 47s
        # for a 48k-pair candidate join that runs in ~3s parallel
        # skew-join OFF by default: every join key in the engine is
        # bounded by construction (band_cap posting lists, rep
        # contraction before LSH), so AQE's per-join skew statistics
        # are pure overhead — measured ~9s constant per edge stage.
        # Callers processing un-capped external joins can re-enable
        # via extra_conf.
        .config("spark.sql.adaptive.skewJoin.enabled", "false")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
