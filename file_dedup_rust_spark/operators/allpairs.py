"""AllPairs / prefix-filter EXACT set-similarity join (Bayardo,
Ma & Srikant, WWW 2007; prefix filtering per Chaudhuri et al. 2006).

Third derivation of the engine's Jaccard-pair surface, completing the
ladder of join strategies over the same semantics:

  * ngram_jaccard_pairs — every-gram posting join (exact, the most
    posting volume);
  * minhash_lsh_pairs   — LSH candidates (cheap, probabilistic:
    miss probability < 1e-9 per pair at the engine config);
  * allpairs_jaccard    — THIS: exact output with a DETERMINISTIC
    sub-linear pruning — no miss probability at all.

Prefix filter.  Order every document's gram set by a single global
order (document frequency ascending, xxhash64 tie-break — rarest
first).  For Jaccard threshold t, index only each set's first

    p = n - ceil(t * n) + 1

grams ("the prefix").  Completeness: if J(x, y) >= t then
|x ∩ y| >= t * max(nx, ny); if x's prefix held NO intersection gram,
the intersection would fit inside x's last nx - p = ceil(t * nx) - 1
< t * nx grams — contradiction, so every qualifying pair shares a
gram in both prefixes and the posting join over prefix grams alone is
guaranteed to surface it (Bayardo et al. §3).  Candidates are then
verified with the exact Jaccard — identical to the LSH tier's verify.

Numeric care: ceil(t * n) in IEEE doubles overshoots (0.8 * 55 =
44.000000000000007 -> ceil 45), which would SHORTEN the prefix and
silently break completeness.  The threshold is therefore passed as a
rational (t_num, t_den) and the prefix length computed in exact
integer arithmetic: ceil(t*n) = (t_num*n + t_den - 1) div t_den.

Scale shape.  Census shuffle on 8-byte gram hashes (map-side partial
agg), one per-doc window (bounded by the doc's own gram count) to rank
grams, then the posting self-join touches only ~(1-t)*n + 1 grams per
doc — at t = 0.8 a 5x posting-volume cut vs the every-gram join — and
those grams are by construction each document's RAREST, so posting
lists are short without any cap: the df-ascending order is the
algorithm's own skew defence (a boilerplate gram shared by thousands
of docs sorts LAST and never enters a prefix unless the doc is tiny).
No cap, no cartesian, no miss: exactness is the point of this tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd


def allpairs_jaccard_pairs(
    sh: DataFrame, t_num: int = 4, t_den: int = 5
) -> DataFrame:
    """sh: distinct (doc_id, g) gram rows -> (ia, ib, jac) for ALL
    pairs with Jaccard >= t_num/t_den, exactly.  jac rounded to 4
    (the engine-wide cross-engine float convention; both engines
    filter on the ROUNDED value, so the two sides agree by
    construction — and no pair with true J < t can round up across
    the threshold until union sizes reach ~4000 grams, far above the
    corpus's bounded doc length).

    Gram identities cross every shuffle as 8-byte xxhash64 values,
    never strings (census, rank window, posting join — the
    dup_spans.py convention).  Correctness under collision: the
    global order only has to be a CONSISTENT total order — rarest-
    first is a pruning heuristic, not a correctness requirement — and
    a collision in the posting join can only ADD a candidate, which
    the exact-Jaccard verify then rejects; the one theoretical risk
    is two distinct grams colliding in (df, gh) making the per-doc
    order inconsistent between docs (p ~ n²/2⁶⁴, the documented
    engine-wide convention, and the oracle would surface it as a
    hash mismatch)."""
    # hashed feeds five subtrees (sizes, df census, rank, both verify
    # sides) with different join keys — materialize the 16-byte rows
    # once instead of re-deriving the gram projection per reference
    hashed = sh.select("doc_id", F.xxhash64("g").alias("gh")).localCheckpoint(
        eager=True
    )
    sizes = hashed.groupBy("doc_id").agg(F.count("*").alias("n"))
    df = hashed.groupBy("gh").agg(F.count("*").alias("df"))

    ranked = (
        hashed.join(df, "gh")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "gh")
            ),
        )
        .join(sizes, "doc_id")
    )
    # exact integer ceil(t*n): no IEEE overshoot, completeness holds
    prefix = ranked.filter(
        F.col("r")
        <= F.col("n")
        - F.floor((F.lit(t_num) * F.col("n") + (t_den - 1)) / t_den)
        + 1
    ).select("doc_id", "gh")

    a = prefix.select(F.col("doc_id").alias("ia"), "gh")
    b = prefix.select(F.col("doc_id").alias("ib"), "gh")
    cand = (
        a.join(b, "gh")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
        .distinct()
    )

    # exact-Jaccard verify on candidates only (same as the LSH tier)
    a_sh = hashed.select(F.col("doc_id").alias("ia"), "gh")
    b_sh = hashed.select(F.col("doc_id").alias("ib"), "gh")
    inter = (
        cand.join(a_sh, "ia")
        .join(b_sh, ["ib", "gh"])
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("ia"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("ib"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "ia")
        .join(sb, "ib")
        .select(
            "ia",
            "ib",
            round_dd(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 4
            ).alias("jac"),
        )
        .filter(F.col("jac") >= F.lit(t_num) / F.lit(t_den))
    )
