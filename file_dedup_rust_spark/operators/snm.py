"""Sorted-neighborhood near-dup candidates (Hernandez & Stolfo 1995,
the merge/purge rule) — the FOURTH candidate-generation family beside
every-gram (exact, expensive), MinHash-LSH (cheap, probabilistic), and
AllPairs prefix filtering (exact, pruned): sort the corpus by a cheap
canonical key, compare only rows whose global sort ranks are within a
fixed window, verify those candidates exactly.

Why it earns a slot in the ladder: candidate count is EXACTLY n*w —
fully predictable, no posting-list skew, no hot buckets, no caps, no
per-pair probability — which makes it the tier of choice when the
duplicate mode is "same record, trivially perturbed tail" (re-exports,
trailing-metadata edits) and the operating budget must be fixed up
front.  Its documented blind spot is the sort key itself: a duplicate
whose KEY region changed sorts far away and is missed, hence the
classic multi-pass remedy — run several cheap keys (here: a text
prefix and a reversed-text prefix, so head edits and tail edits each
survive one pass) and union the candidates.

Scale shape (the part worth copying): the global rank is NOT a
single-partition window.  `global_rank` is repartitionByRange on the
key (Spark's sampled range partitioner keeps buckets balanced under
any key distribution), a per-partition row_number, and a bounded
(<= n_buckets rows) count collect whose running offsets broadcast
back — the packing module's two-pass distributed prefix-sum idea
applied to ranking.  Bucket boundaries influence only load balance,
never output: rank depends on the total (key, id) order alone, so the
result is deterministic and oracle-checkable against a plain SQL
row_number().  The windowed pairing is a w-fold literal explode +
integer equi-join on rank — no self-cartesian anywhere — and the rank
stage ships (id, 24-byte key) rows, never full texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SNM_KEY_LEN = 24   # canonical sort-key width (bounded shuffle rows)
SNM_WINDOW = 8     # compare ranks within this distance (n*w candidates)


def global_rank(
    df: DataFrame, key_col: str, id_col: str, n_buckets: int = 64
) -> DataFrame:
    """Add `_rank` = 0-based position in the global (key, id) sort,
    computed WITHOUT a single-partition window: range-repartition on
    (key, id), rank within each partition, then shift by broadcast
    running offsets from a bounded per-partition count collect."""
    parts = df.repartitionByRange(n_buckets, F.col(key_col), F.col(id_col))
    withpid = parts.withColumn("_pid", F.spark_partition_id())
    counts = sorted(
        (int(r["_pid"]), int(r["cnt"]))
        for r in withpid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, running = [], 0
    for pid, cnt in counts:
        offsets.append((pid, running))
        running += cnt
    if not offsets:  # empty input
        return df.withColumn("_rank", F.lit(0).cast("long"))
    off = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(key_col, id_col)
    return (
        withpid.join(F.broadcast(off), "_pid")
        .withColumn(
            "_rank", (F.row_number().over(w) - 1).cast("long") + F.col("_off")
        )
        .drop("_pid", "_off")
    )


def snm_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "t",
    window: int = SNM_WINDOW,
) -> DataFrame:
    """Two-pass sorted-neighborhood candidate pairs (ia < ib), deduped
    across passes.  Pass keys: the first SNM_KEY_LEN chars of the text
    (tail edits sort together) and the first SNM_KEY_LEN chars of the
    REVERSED text (head edits sort together)."""
    keys = [
        F.substring(F.col(text_col), 1, SNM_KEY_LEN),
        F.substring(F.reverse(F.col(text_col)), 1, SNM_KEY_LEN),
    ]
    out = None
    for i, key in enumerate(keys):
        ranked = global_rank(
            docs.select(F.col(id_col).alias("id"), key.alias("k")), "k", "id"
        ).select("id", "_rank")
        ds = F.explode(
            F.array(*[F.lit(d) for d in range(1, window + 1)])
        ).alias("d")
        left = ranked.select("id", "_rank", ds).select(
            F.col("id").alias("ia_raw"), (F.col("_rank") + F.col("d")).alias("_rank")
        )
        pairs = left.join(
            ranked.select(F.col("id").alias("ib_raw"), "_rank"), "_rank"
        ).select(
            F.least("ia_raw", "ib_raw").alias("ia"),
            F.greatest("ia_raw", "ib_raw").alias("ib"),
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()
