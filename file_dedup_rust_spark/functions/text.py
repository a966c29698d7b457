"""Transcript featurization: char k-gram shingles -> MinHash -> bands,
plus winnowing fingerprints for substring containment.

These are the numpy kernels; file_dedup_rust_spark.functions.udfs wraps
them in Arrow-vectorized pandas UDFs, and file_dedup_rust_spark.oracle
calls them directly — both paths share bit-identical results.
"""

from __future__ import annotations

import numpy as np

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.functions import hashing


def normalize_transcript(text: str | None) -> bytes:
    """Canonical byte form used for shingling: lowercase, collapsed
    whitespace, utf-8.  Kept deliberately minimal — the reference does
    no text normalization at all, but raw-byte shingles would treat
    trailing spaces as content."""
    if text is None:
        return b""
    return " ".join(text.lower().split()).encode("utf-8")


def transcript_shingles(text: str | None, cfg: DedupConfig) -> np.ndarray:
    """uint64 hashes of the char k-gram shingle set (with duplicates;
    minhash uniquifies)."""
    return hashing.kgram_hashes(normalize_transcript(text), cfg.shingle_k)


def transcript_minhash(text: str | None, cfg: DedupConfig) -> np.ndarray:
    """int64 (num_perm,) MinHash signature of the transcript."""
    a, b = hashing.minhash_params(cfg.minhash_seed, cfg.num_perm)
    return hashing.minhash_signature(transcript_shingles(text, cfg), a, b)


def minhash_bands(sig: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """int64 (lsh_bands,) band hashes of a signature."""
    return hashing.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows)


def jaccard(text_a: str | None, text_b: str | None, cfg: DedupConfig) -> float:
    """Exact shingle-set Jaccard (verification oracle for candidates)."""
    sa = set(np.unique(transcript_shingles(text_a, cfg)).tolist())
    sb = set(np.unique(transcript_shingles(text_b, cfg)).tolist())
    if not sa and not sb:
        return 0.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash-estimated Jaccard = fraction of agreeing lanes.

    This is the quantity thresholded at 0.8 (reference P3,
    deduplication_service.rs:347-348): both the pipeline verifier and
    the numpy oracle use THIS estimator, so they agree bit-exactly."""
    if sig_a.size == 0 or sig_b.size == 0:
        return 0.0
    return float(np.mean(sig_a == sig_b))


def transcript_fingerprints(text: str | None, cfg: DedupConfig) -> np.ndarray:
    """Winnowing fingerprints (uint64) for containment candidates."""
    return hashing.winnow_fingerprints(
        normalize_transcript(text), cfg.winnow_k, cfg.winnow_w
    )
