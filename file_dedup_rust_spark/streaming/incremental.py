"""Structured Streaming surface: incremental dedup of newly-arriving
clips.

The reference processes files one-at-a-time off a Redis queue
(/root/reference/backend/src/worker/job_queue.rs:59-78, worker loop
worker_process.rs:50-89) and probes each new file against the
already-indexed corpus (deduplication_service.rs:209-222, 300-372).
The streaming analog: `readStream` over the landing directory, the
same one-pass signature UDF, then per-micro-batch probes against the
accumulated signature store.  `trigger(availableNow=True)` gives the
drain-the-queue batch semantics; a continuous trigger gives the
always-on worker semantics — same code.

Two stateful surfaces are provided:

* `incremental_exact_dedup` — foreachBatch: join each micro-batch's
  sha256 against the accumulated corpus store (exact-dup probe J1),
  emit match rows, append the batch to the store.  The store is plain
  parquet here; on a cluster it would be the Iceberg signatures table
  (MERGE INTO), same flow.
* `streaming_cluster_assign` — applyInPandasWithState: running
  cluster assignment keyed by sha256; state = first clip_id seen for
  the hash (the reference's create-or-join cluster step,
  deduplication_service.rs:374-433, made deterministic).

Watermarked event-time aggregation (late data) is in
`windowed_ingest_stats`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.datagen import CLIP_SCHEMA
from file_dedup_rust_spark.functions.udfs import compute_signatures


def read_clip_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming scan of the landing directory (schema per
    BASELINE.json input_hint; maxFilesPerTrigger bounds micro-batch
    size so one giant drop can't OOM an executor)."""
    return (
        spark.readStream.schema(CLIP_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(landing_dir)
    )


def incremental_exact_dedup(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """Start the incremental exact-dedup stream.

    Each micro-batch: signatures (one mapInPandas pass, bytes dropped)
    -> probe sha256 against the store -> append matches to out_dir ->
    append batch signatures to the store.  Returns the StreamingQuery.
    """
    cfg = cfg or DedupConfig()
    clips = read_clip_stream(spark, landing_dir)
    sigs = compute_signatures(clips, cfg).select(
        "clip_id", "sha256", "simhash", "t_norm"
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        try:
            spark_l = b.sparkSession
            if os.path.exists(store_dir):
                corpus = spark_l.read.parquet(store_dir).select(
                    F.col("clip_id").alias("matched_clip_id"), "sha256"
                )
            else:
                corpus = None
            # within-batch dups: star to the batch-min clip_id per hash
            from pyspark.sql import Window

            w = Window.partitionBy("sha256")
            intra = (
                b.withColumn("rep", F.min("clip_id").over(w))
                .filter(F.col("clip_id") != F.col("rep"))
                .select(
                    "clip_id", "sha256",
                    F.col("rep").alias("matched_clip_id"),
                    F.lit("batch").alias("match_scope"),
                )
            )
            if corpus is not None:
                cross = (
                    b.join(corpus, "sha256")
                    .select(
                        "clip_id", "sha256", "matched_clip_id",
                        F.lit("corpus").alias("match_scope"),
                    )
                )
                matches = intra.unionByName(cross)
            else:
                matches = intra
            matches.write.mode("append").parquet(out_dir)
            b.select("clip_id", "sha256", "simhash", "t_norm").write.mode(
                "append"
            ).parquet(store_dir)
        finally:
            b.unpersist()

    writer = (
        sigs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_near_dedup(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """Incremental exact + NEAR dedup — the streaming analog of the
    reference's full per-file flow: hash probe (J1), store the
    signature in the index (S5), then similarity-search the index (J2)
    — batched per micro-batch instead of per file.

    Two accumulating stores:
      * ``{store_dir}/sigs``    — one row per clip (sha256, simhash)
      * ``{store_dir}/posting`` — the LSH index: exploded
        (key, clip_id, simhash) band-posting rows (the OpenSearch-index
        analog, deduplication_service.rs:256-298)

    Each micro-batch probes its sha256 against the sig store and its
    band keys against the posting store (plus within-batch probes),
    verifies candidates with the Hamming threshold inline, appends
    match rows to ``out_dir``, then appends the batch to both stores.
    Emits (clip_id, matched_clip_id, match_kind in {exact, audio},
    sim, match_scope in {batch, corpus}).
    """
    cfg = cfg or DedupConfig()
    clips = read_clip_stream(spark, landing_dir)
    sigs = compute_signatures(clips, cfg).select(
        "clip_id", "sha256", "simhash", "sim_keys", "decode_ok"
    )
    d_max = cfg.hamming_max
    bits = float(cfg.simhash_bits)

    def hamming_matches(probe, index):
        d = F.bit_count(F.col("p.simhash").bitwiseXOR(F.col("i.simhash")))
        return (
            probe.alias("p")
            .join(index.alias("i"), "key")
            .filter(F.col("p.clip_id") != F.col("i.clip_id"))
            .filter(d <= d_max)
            .select(
                F.col("p.clip_id").alias("clip_id"),
                F.col("i.clip_id").alias("matched_clip_id"),
                F.lit("audio").alias("match_kind"),
                (F.lit(1.0) - d / F.lit(bits)).alias("sim"),
            )
            .distinct()
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        try:
            spark_l = b.sparkSession
            posting_b = b.filter("decode_ok").select(
                F.explode("sim_keys").alias("key"), "clip_id", "simhash"
            )
            # ---- exact (J1): within batch + against the store ----
            from pyspark.sql import Window

            w = Window.partitionBy("sha256")
            exact_intra = (
                b.withColumn("rep", F.min("clip_id").over(w))
                .filter(F.col("clip_id") != F.col("rep"))
                .select(
                    "clip_id",
                    F.col("rep").alias("matched_clip_id"),
                    F.lit("exact").alias("match_kind"),
                    F.lit(1.0).alias("sim"),
                    F.lit("batch").alias("match_scope"),
                )
            )
            # ---- near (J2): batch self-probe, one direction ----
            near_intra = (
                hamming_matches(
                    posting_b, posting_b.select("key", "clip_id", "simhash")
                )
                .filter(F.col("clip_id") > F.col("matched_clip_id"))
                .withColumn("match_scope", F.lit("batch"))
            )
            matches = exact_intra.unionByName(near_intra)
            if os.path.exists(os.path.join(store_dir, "sigs")):
                corpus = spark_l.read.parquet(f"{store_dir}/sigs")
                exact_cross = (
                    b.join(
                        corpus.select(
                            F.col("clip_id").alias("matched_clip_id"), "sha256"
                        ),
                        "sha256",
                    )
                    .select(
                        "clip_id", "matched_clip_id",
                        F.lit("exact").alias("match_kind"),
                        F.lit(1.0).alias("sim"),
                        F.lit("corpus").alias("match_scope"),
                    )
                )
                index = spark_l.read.parquet(f"{store_dir}/posting")
                near_cross = hamming_matches(posting_b, index).withColumn(
                    "match_scope", F.lit("corpus")
                )
                matches = matches.unionByName(exact_cross).unionByName(near_cross)
            matches.write.mode("append").parquet(out_dir)
            b.select("clip_id", "sha256", "simhash").write.mode("append").parquet(
                f"{store_dir}/sigs"
            )
            posting_b.write.mode("append").parquet(f"{store_dir}/posting")
        finally:
            b.unpersist()

    writer = (
        sigs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_ASSIGN_STATE_SCHEMA = "rep string"
_ASSIGN_OUT_SCHEMA = "clip_id string, sha256 string, cluster_rep string"


def _assign_fn(key, pdf_iter, state: GroupState):
    """Stateful per-sha256 assignment: first clip_id seen becomes the
    group representative; all later arrivals join it (deterministic
    version of the reference's first-match-wins cluster join)."""
    import pandas as pd

    (sha256,) = key
    if state.exists:
        (rep,) = state.get
    else:
        rep = None
    rows = []
    for pdf in pdf_iter:
        for cid in sorted(pdf["clip_id"].tolist()):
            if rep is None:
                rep = cid
            rows.append((cid, sha256, rep))
    state.update((rep,))
    yield pd.DataFrame(rows, columns=["clip_id", "sha256", "cluster_rep"])


def streaming_cluster_assign(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """applyInPandasWithState running cluster assignment keyed by
    sha256 — the custom stateful streaming operator surface."""
    cfg = cfg or DedupConfig()
    clips = read_clip_stream(spark, landing_dir)
    sigs = compute_signatures(clips, cfg).select("clip_id", "sha256")
    assigned = sigs.groupBy("sha256").applyInPandasWithState(
        _assign_fn,
        outputStructType=_ASSIGN_OUT_SCHEMA,
        stateStructType=_ASSIGN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_ingest_stats(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    available_now: bool = True,
):
    """Watermarked tumbling-window ingest metrics by codec (the A8
    counters as an event-time stream; late rows beyond the watermark
    are dropped by Spark's state cleanup)."""
    clips = read_clip_stream(spark, landing_dir).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    agg = (
        clips.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), "codec")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("dur_ms").alias("total_dur_ms"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "codec", "n_clips", "total_dur_ms",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
