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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd

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


def group_safe_split(
    df: DataFrame,
    key_col: str,
    group_col: str,
    held_out_per_mille: int,
) -> DataFrame:
    """Leakage-safe train / held-out split: the split decision is made
    per GROUP (duplicate cluster, exact-hash group, source domain),
    never per row, so no two members of a group straddle the boundary.

    Splitting a deduplicated-but-clustered corpus row-wise leaks: a
    near-duplicate of a held-out document lands in train and the
    held-out loss measures memorization (the reason The Pile / Lee et
    al. 2021 dedup ACROSS the train/test boundary).  This derives each
    group's fate from the Knuth bucket of its minimum key — the same
    deterministic, partition-invariant, engine-reproducible decision
    rule as stratified_sample, so the split survives reruns,
    repartitions, and incremental corpus growth (a group's min key is
    stable once its earliest member exists).

    Output: the input rows + group_rep (the group's min key) + split
    ('held_out' iff the group's bucket < held_out_per_mille).

    At 100 TB: one groupBy on the group key (map-side-partial min)
    and one hash join back on the same key — the exact shuffle shape
    of exact dedup; the split itself is a pure expression.
    """
    from pyspark.sql.types import StringType

    groups = df.groupBy(group_col).agg(F.min(key_col).alias("group_rep"))
    rep = F.col("group_rep")
    if isinstance(groups.schema["group_rep"].dataType, StringType):
        # string keys (e.g. the pipeline's min-clip_id cluster reps):
        # fold to a non-negative 31-bit value first (the sample_bucket
        # pre-fold rule: key * KNUTH must stay inside int64 under ANSI
        # mode); same determinism, the bucket just isn't
        # plain-SQL-reproducible (the oracle query uses integer keys)
        rep = F.pmod(F.xxhash64(rep), F.lit(2_147_483_648))
    split = F.when(
        sample_bucket(rep) < F.lit(held_out_per_mille),
        F.lit("held_out"),
    ).otherwise(F.lit("train"))
    return df.join(groups, group_col).withColumn("split", split)


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    target_per_mille: dict[str, int],
) -> DataFrame:
    """Per-stratum sampling rates that realize a target corpus mixture
    without upsampling (the data-mixing step after dedup/filtering:
    "train on 30% code, 60% web, 10% books" given whatever the crawl
    yielded — the fixed-weight cousin of DoReMi's learned weights,
    Xie et al. 2023).

    For each stratum s with weight mass m_s (tokens) and target share
    t_s (per-mille), the largest leakage-free corpus keeps the BINDING
    stratum (max t_s/m_s) whole and downsamples the rest:

        rate_s = (t_s / m_s) / max_u (t_u / m_u)   in (0, 1]

    Output one row per stratum: stratum, n_rows, weight (sum of
    weight_col), natural_pm (floor(1000*weight/total) — integer),
    target_pm, and sample_rate (double; exactly 1.0 for the binding
    stratum).  Feed floor(1000*rate) into stratified_sample to apply.

    At 100 TB: one partial-agg groupBy over the strata; everything
    after runs on a relation bounded by the stratum cardinality (the
    single-partition window is over ~dozens of rows, not data).
    Strata absent from target_per_mille get target 0 -> rate 0.0
    (dropped from the mix).
    """
    tgt: Column = F.lit(0)
    for stratum, t in sorted(target_per_mille.items()):
        tgt = F.when(F.col(stratum_col) == stratum, F.lit(t)).otherwise(tgt)
    agg = df.groupBy(stratum_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(weight_col).cast("long").alias("weight"),
    )
    w = Window.partitionBy()  # bounded: one row per stratum
    ratio = F.col("target_pm") / F.col("weight")
    return (
        agg.withColumn("target_pm", tgt.cast("long"))
        .withColumn("total_w", F.sum("weight").over(w))
        .withColumn("max_ratio", F.max(ratio).over(w))
        .select(
            F.col(stratum_col),
            "n_rows",
            "weight",
            F.floor(F.lit(1000) * F.col("weight") / F.col("total_w"))
            .cast("long").alias("natural_pm"),
            "target_pm",
            (ratio / F.col("max_ratio")).alias("sample_rate"),
        )
    )


def stratified_take_k(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    k: int,
    n_salt: int = 32,
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer iff the stratum is smaller),
    drawn uniformly-without-replacement and deterministically: rows
    rank by their Knuth-permuted key ((key * KNUTH) mod 2^32, ties to
    the raw key), so the draw is independent of ingestion order,
    partitioning, and engine — the eval-set carving counterpart of
    `stratified_sample` (rates give you ~k in expectation; a held-out
    benchmark needs exactly k).

    Scale shape: a naive `row_number() OVER (PARTITION BY stratum)`
    is ONE task per stratum — a scale-killer when one stratum holds
    10^11 rows.  This runs the standard two-stage distributed top-k
    instead: stage 1 ranks within (stratum, key mod n_salt) — n_salt
    parallel tasks per stratum — and keeps k candidates each; stage 2
    re-ranks the surviving <= k * n_salt rows per stratum.  Any row in
    the true top-k is in its salt-lane's top-k, so the result is
    exact; the stage-2 window sees a BOUNDED candidate set.

    Output: the input row + `draw_rank` (1..k within its stratum).
    """
    perm = F.pmod(F.col(key_col) * F.lit(KNUTH_MULT), F.lit(_MOD))
    salt = F.pmod(F.col(key_col), F.lit(n_salt))
    w1 = Window.partitionBy(stratum_col, salt.alias("salt")).orderBy(
        perm, F.col(key_col)
    )
    w2 = Window.partitionBy(stratum_col).orderBy(perm, F.col(key_col))
    return (
        df.withColumn("_lrank", F.row_number().over(w1))
        .filter(F.col("_lrank") <= k)
        .withColumn("draw_rank", F.row_number().over(w2))
        .filter(F.col("draw_rank") <= k)
        .drop("_lrank")
    )


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    alpha: float,
) -> DataFrame:
    """Temperature-scaled mixture rates (the multilingual alpha-
    sampling rule, XLM-R / mT5: sample stratum s proportional to
    p_s^alpha, alpha in (0, 1], flattening the natural distribution
    toward the rare strata): the per-stratum keep rate of the largest
    no-upsampling corpus realizing q_s = p_s^alpha / sum_u p_u^alpha.

    rate_s = (q_s/p_s) / max_u(q_u/p_u) = (w_s / w_min)^(alpha-1) —
    the rarest stratum is binding (rate exactly 1.0) and heavier
    strata are downsampled by their weight ratio to the alpha-1
    power.  alpha=1 keeps everything; alpha->0 approaches uniform.
    The computed-target cousin of `mixture_rates` (which takes the
    target mix as input); feeds `stratified_sample` the same way.

    Output: stratum, n_rows, weight, p (natural share), q (target
    share), sample_rate — non-integer columns rounded to 4 decimals
    (pow() is not guaranteed bit-identical across engines, unlike the
    pure division chains in mixture_rates).

    At 100 TB: one partial-agg groupBy over the strata; the window
    runs on a relation bounded by stratum cardinality.
    """
    agg = df.groupBy(stratum_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(weight_col).cast("long").alias("weight"),
    )
    w = Window.partitionBy()  # bounded: one row per stratum
    p = F.col("weight") / F.sum("weight").over(w)
    qn = F.pow(p, F.lit(alpha)) / F.sum(F.pow(p, F.lit(alpha))).over(w)
    rate = F.pow(
        F.col("weight") / F.min("weight").over(w), F.lit(alpha - 1.0)
    )
    return agg.select(
        stratum_col,
        "n_rows",
        "weight",
        round_dd(p, 4).alias("p"),
        round_dd(qn, 4).alias("q"),
        round_dd(rate, 4).alias("sample_rate"),
    )


def unimax_allocation(
    census: DataFrame,
    key_col: str,
    tok_col: str,
    epochs: float,
    budget_frac: float,
) -> DataFrame:
    """UniMax language-budget water-fill (Chung et al. 2023, ICLR):
    spread budget = floor(budget_frac * total tokens) uniformly over
    the strata, cap each stratum at `epochs` passes of its available
    tokens, redistribute leftover among the uncapped strata.

    Closed form: sorted ascending by cap, the capped set is a PREFIX
    (if cap_i >= remaining/slots, every later larger cap is too), so
    one row_number + exclusive-cumsum window over the CENSUS (bounded
    strata rows — never the corpus; the single-partition WindowExec
    warning is expected and harmless here) decides capped/uncapped and
    one 1-row aggregate redistributes.  Returns
    (key, n_tokens, alloc_tokens, epochs) with floats rounded to 4.
    All comparisons are exact integer-in-double arithmetic; the only
    float division is the final share."""
    tots = census.agg(
        F.sum(tok_col).alias("tt"), F.count("*").alias("nl")
    )
    w = Window.orderBy("cap", key_col)
    t = (
        census.crossJoin(F.broadcast(tots))
        .select(
            key_col,
            F.col(tok_col).alias("tok"),
            "nl",
            (F.col(tok_col) * epochs).cast("double").alias("cap"),
            F.floor(F.col("tt") * budget_frac).cast("double").alias("b"),
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "pref",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "capped",
            F.col("cap") * (F.col("nl") - F.col("i") + 1)
            < (F.col("b") - F.col("pref")),
        )
    )
    caggs = t.agg(
        F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0.0)).alias(
            "csum"
        ),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("ncap"),
    )
    alloc = round_dd(
        F.when(F.col("capped"), F.col("cap")).otherwise(
            (F.col("b") - F.col("csum")) / (F.col("nl") - F.col("ncap"))
        ),
        4,
    )
    return t.crossJoin(F.broadcast(caggs)).select(
        key_col,
        F.col("tok").cast("bigint").alias("n_tokens"),
        alloc.alias("alloc_tokens"),
        round_dd(alloc / F.col("tok"), 4).alias("epochs"),
    )


MAX_ES_WEIGHT = 8


def weighted_take_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "es",
    n_salt: int = 32,
) -> DataFrame:
    """Exactly k rows drawn WITHOUT replacement with probability
    proportional to an integer weight (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir") — the quality- or
    length-weighted subsample a data-mixing pipeline draws after
    dedup, where `stratified_take_k` can only draw uniformly.

    ES assigns each row the key u_i^(1/w_i) (u_i uniform) and takes
    the global top-k.  Floating ln/pow differs between engines at ulp
    scale, which an exact-hash oracle cannot tolerate — so for integer
    weights this uses the identity  u^(1/w) ~ max of w iid uniforms:
    lane j of a row is md5("seed:j:key") (independent uniforms across
    rows AND lanes), the ES key is the MAX of the row's first w lanes,
    and fixed-length hex strings order exactly like the integers they
    encode, so `greatest()` on hex needs no conversion and both
    engines agree bit-for-bit (the `corpus_sketch` trick).  The draw
    is deterministic, partition-invariant, and replayable from (seed,
    key, weight) alone.

    Weights must be integers in [1, MAX_ES_WEIGHT]; wider ranges
    should be log-bucketed into that range by the caller (the lane
    count is the cost: MAX_ES_WEIGHT md5 calls per row, one
    projection, no shuffle until the top-k).

    Scale shape: the ES key is a pure narrow expression; the global
    top-k runs the same salted two-stage pattern as
    `stratified_take_k` — stage 1 takes k per salt lane (n_salt
    parallel tasks), stage 2 ranks the <= k*n_salt survivors; any row
    in the true top-k survives its lane, so the result is exact and
    no single task ever sees more than max(n/n_salt, k*n_salt) rows.

    Output: the input row + es_key + draw_rank (1..k).
    """
    lanes = [
        F.when(
            F.col(weight_col) > j,
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.lit(str(j)),
                    F.col(key_col).cast("string"),
                )
            ),
        ).otherwise(F.lit(""))
        for j in range(MAX_ES_WEIGHT)
    ]
    keyed = df.withColumn("es_key", F.greatest(*lanes))
    salt = F.pmod(F.col(key_col), F.lit(n_salt))
    w1 = Window.partitionBy(salt.alias("salt")).orderBy(
        F.desc("es_key"), F.col(key_col)
    )
    w2 = Window.partitionBy().orderBy(F.desc("es_key"), F.col(key_col))
    return (
        keyed.withColumn("_lrank", F.row_number().over(w1))
        .filter(F.col("_lrank") <= k)
        .withColumn("draw_rank", F.row_number().over(w2))
        .filter(F.col("draw_rank") <= k)
        .drop("_lrank")
    )
