"""Planted-truth tests for the cross-modal audit pair.

paraphrase_pairs / stale_embedding_pairs are driver-contract queries
(hash-checked vs DuckDB by tools/check_entry.py); these tests pin the
SEMANTICS on a corpus where the expected classification of every pair
is known by construction:

  * same embedding + different words  -> paraphrase (keep as positive)
  * same words + orthogonal embedding -> stale embedding (re-embed)
  * same words + same embedding       -> true dup, flagged by NEITHER
  * empty texts + same embedding      -> degenerate, excluded from
    paraphrase (no shingles on either side reads as lexically
    identical, not lexically disjoint)
"""

from __future__ import annotations

import pytest

from file_dedup_rust_spark.entry.testdata_queries import (
    q_paraphrase_pairs,
    q_stale_embedding_pairs,
)


@pytest.fixture(scope="module")
def audit_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crossmodal")
    base = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    ortho = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    third = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    docs = [
        # (doc_id, text)                          embedding
        (1, "the quick brown fox jumps high"),   # base   } paraphrase
        (2, "a slow red turtle crawls low"),     # base   }
        (3, "identical transcript words here"),  # base   } stale pair
        (4, "identical transcript words here"),  # ortho  }
        (5, "true duplicate rows match fully"),  # third  } true dup
        (6, "true duplicate rows match fully"),  # third  }
        (7, ""),                                 # base   } degenerate
        (8, ""),                                 # base   }
    ]
    vecs = {1: base, 2: base, 3: base, 4: ortho, 5: third, 6: third,
            7: base, 8: base}
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i, _ in docs],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


def _pair_set(df):
    return {(r["ia"], r["ib"]) for r in df.collect()}


def test_paraphrase_flags_semantic_near_lexical_far_only(spark, audit_dir):
    got = {(r["ia"], r["ib"]): r for r in q_paraphrase_pairs(spark, audit_dir).collect()}
    assert (1, 2) in got                      # same meaning, different words
    assert got[(1, 2)]["jac"] == 0.0
    assert got[(1, 2)]["sim"] == 1.0
    assert (5, 6) not in got                  # true dup: jac 1.0 >= 0.5
    assert (7, 8) not in got                  # degenerate empty pair excluded
    assert (3, 4) not in got                  # vectors disagree: not semantic-near


def test_stale_embedding_flags_lexical_near_vector_far_only(spark, audit_dir):
    got = {(r["ia"], r["ib"]): r for r in q_stale_embedding_pairs(spark, audit_dir).collect()}
    assert (3, 4) in got                      # same words, orthogonal vectors
    assert got[(3, 4)]["jac"] == 1.0
    assert got[(3, 4)]["sim"] == 0.0
    assert (5, 6) not in got                  # healthy dup: vectors agree
    assert (1, 2) not in got                  # different words: not lexical-near


def test_audit_sets_are_disjoint(spark, audit_dir):
    para = _pair_set(q_paraphrase_pairs(spark, audit_dir))
    stale = _pair_set(q_stale_embedding_pairs(spark, audit_dir))
    assert not (para & stale)
