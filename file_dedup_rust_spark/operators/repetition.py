"""Gopher-style within-document repetition quality signals.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter
training documents whose content is dominated by repeated fragments:
the fraction of the document accounted for by its most frequent word,
by its most frequent word-2-gram, and by 2-grams that occur more than
once.  The reference repo has no text-quality stage at all (its dedup
is per-file hash + embedding k-NN, deduplication_service.rs:300-372);
these signals are the standard corpus-curation companion to the dedup
tiers this engine already ships.

Scale design — ZERO shuffle.  Every metric here is a function of one
document, so the 100-TB plan must never explode tokens into a shuffle
(the naive `explode → groupBy(doc_id, word)` plan shuffles the entire
corpus token stream twice).  Instead the per-document mode/duplicate
counts are computed inside a single projection with JVM higher-order
functions: sort the token (or 2-gram) array, then one `aggregate(...)`
pass over run lengths.  O(n log n) per row, no Python, no exchange —
the stage pipelines straight into whatever scan produced the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_dedup_rust_spark.functions.rounding import round_dd

# Flag thresholds.  Gopher's published cuts are corpus-specific; these
# sit in wide margins of the synthetic-testdata distributions (measured
# at sf0.01: natural max top_word_frac 0.30, top_bigram_frac 0.167,
# dup_bigram_frac 0.267) so a planted repetition doc always flags and a
# natural doc never does, regardless of float rounding.
TOP_WORD_T = 0.5
TOP_BIGRAM_T = 0.30
DUP_BIGRAM_T = 0.5


def run_stats(sorted_arr: str) -> Column:
    """struct(best, dup) over a SORTED array column (by SQL name).

    best = length of the longest run of equal elements (= the count of
    the modal element); dup = total elements belonging to runs of
    length > 1.  One JVM `aggregate` pass, no shuffle, no Python.
    """
    s = sorted_arr
    return F.expr(
        f"""
        CASE WHEN size({s}) < 2 THEN
          named_struct('cur', CAST(1 AS BIGINT),
                       'best', CAST(least(size({s}), 1) AS BIGINT),
                       'dup', CAST(0 AS BIGINT))
        ELSE aggregate(
          sequence(2, size({s})),
          named_struct('cur', CAST(1 AS BIGINT),
                       'best', CAST(1 AS BIGINT),
                       'dup', CAST(0 AS BIGINT)),
          (acc, i) -> IF(element_at({s}, i) = element_at({s}, i - 1),
            named_struct('cur', acc.cur + 1L,
                         'best', greatest(acc.best, acc.cur + 1L),
                         'dup', acc.dup + IF(acc.cur = 1L, 2L, 1L)),
            named_struct('cur', CAST(1 AS BIGINT),
                         'best', acc.best, 'dup', acc.dup)))
        END
        """
    )


def repetition_stats(docs_with_t: DataFrame) -> DataFrame:
    """(doc_id, t) -> per-doc repetition metrics + flag.

    Columns: doc_id, n_tokens, top_word_frac, top_bigram_frac,
    dup_bigram_frac (each rounded to 4 dp), rep_flag (computed on the
    RAW ratios so rounding can never flip the decision).
    """
    d = docs_with_t.select("doc_id", F.split("t", " ").alias("w"))
    bigrams = F.expr(
        "CASE WHEN size(w) < 2 THEN CAST(array() AS array<string>) "
        "ELSE transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) END"
    )
    d = d.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.array_sort("w").alias("sw"),
        F.array_sort(bigrams).alias("sb"),
    )
    d = d.select(
        "doc_id",
        "n_tokens",
        run_stats("sw").alias("ws"),
        F.expr("size(sb)").alias("nb"),
        run_stats("sb").alias("bs"),
    )
    top_word = F.col("ws.best") / F.greatest("n_tokens", F.lit(1))
    top_bigram = F.col("bs.best") / F.greatest("nb", F.lit(1))
    dup_bigram = F.col("bs.dup") / F.greatest("nb", F.lit(1))
    flag = (
        (top_word >= TOP_WORD_T)
        | (top_bigram >= TOP_BIGRAM_T)
        | (dup_bigram >= DUP_BIGRAM_T)
    )
    return d.select(
        "doc_id",
        "n_tokens",
        round_dd(top_word, 4).alias("top_word_frac"),
        round_dd(top_bigram, 4).alias("top_bigram_frac"),
        round_dd(dup_bigram, 4).alias("dup_bigram_frac"),
        flag.cast("int").alias("rep_flag"),
    )
