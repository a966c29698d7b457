"""file_dedup_rust_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine.

Re-expresses the dedup semantics of the reference system
(kaicong12/file-dedup-rust: SHA-256 exact-dup probe, k-NN near-dup
search with similarity threshold 0.8 / top-k 10, incremental cluster
assignment — see /root/reference/backend/src/worker/
deduplication_service.rs) as a batch DataFrame pipeline:

    scan(clips) -> decode/featurize (Arrow UDFs) -> signatures
    -> LSH candidates (explode + salted equi-join)
    -> exact verification (Jaccard / Hamming, threshold 0.8)
    -> connected components (iterative hash-join label propagation)
    -> assignments + clusters

Everything is DataFrame/Catalyst-first; Python only runs inside
vectorized pandas UDFs (Arrow batches, no per-row Python).
"""

from file_dedup_rust_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
