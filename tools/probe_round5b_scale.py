#!/usr/bin/env python
"""Worst-case / at-scale probes for the round-5b operators, following
the BENCH.md methodology of the boilerplate_prune / conflict_repair
hot-block measurements:

  * soft-dedup weights at 1 M rows where HALF the corpus shares ONE
    content key (the boilerplate worst case) — window-count vs
    groupBy+join-back implementations compared, because a window
    cannot split a hot partition while an equi-join can (AQE skew
    split + partial agg);
  * bag-of-words canonical key (split -> array_sort -> md5 -> groupBy)
    at 1 M synthetic ~50-word docs with 10% reversed copies;
  * embedding decontamination at 1 M x 64-d corpus vs a 1,000-vector
    eval matrix (one mapInPandas BLAS pass, zero shuffle).

    python tools/probe_round5b_scale.py [--docs 1000000] [--vecs 1000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def timed(label, df):
    t0 = time.monotonic()
    df.write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from file_dedup_rust_spark.session import build_session

    spark = build_session(
        "probe-5b", master=f"local[{args.cpus}]", shuffle_partitions=32
    )

    n = args.docs
    # ---- soft-dedup weights, hot-key worst case: half the corpus is
    # ONE content (key 0), the rest unique ----
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
    )
    w = Window.partitionBy("k")
    window_weights = base.withColumn("group_size", F.count("*").over(w))
    t_window = timed(f"soft_weights window count ({n:,} rows, hot key 50%)",
                     window_weights)

    counts = base.groupBy("k").agg(F.count("*").alias("group_size"))
    join_weights = base.join(counts, "k")
    t_join = timed(f"soft_weights groupBy+join ({n:,} rows, hot key 50%)",
                   join_weights)

    # ---- bag-of-words canonical key at 1 M ~50-word docs ----
    words = F.expr(
        "transform(sequence(1, 50), i -> concat('w',"
        " pmod(xxhash64(id * 53 + i), 800)))"
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("t")
    )
    rev = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split("t", " ")), " ").alias("t"),
    )
    corpus = docs.unionByName(rev)
    from file_dedup_rust_spark.operators.exact import reorder_invariant_key

    bow = (
        corpus.select("doc_id", reorder_invariant_key(F.col("t")).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") > 1)
    )
    timed(f"bow_dup_groups ({n:,} docs + 10% reversed)", bow)
    got = bow.count()
    print(f"  groups found: {got:,} (expect {n // 10:,})")

    # ---- embedding decontam at 1 M x 64-d vs 1,000 eval vectors ----
    from file_dedup_rust_spark import datagen
    from file_dedup_rust_spark.operators.decontaminate import (
        embedding_contamination_hits,
    )

    e = datagen.clustered_embeddings(spark, args.vecs, d=64).cache()
    e.count()
    ev = e.filter(F.col("vec_id") % 1000 == 7).limit(1000)
    hits = embedding_contamination_hits(e, ev, 0.999)
    t0 = time.monotonic()
    n_hits = hits.count()
    dt = time.monotonic() - t0
    print(
        f"embedding_decontam ({args.vecs:,} x 64d vs 1,000 eval): "
        f"{dt:.2f}s, {n_hits:,} hits"
    )
    print(f"window_vs_join_ratio: {t_window / max(t_join, 1e-9):.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
