"""Deduplication operators for the training-data pipeline.

- exact:   hash-groupBy on a normalized-content fingerprint.
- ngram:   n-gram (word-shingle) Jaccard similarity pairs.
- minhash: MinHash signatures + LSH banding → candidate-pair join.
- simhash: bit-parity SimHash signatures (near-dup by Hamming distance).

All four are pure DataFrame algebra over deterministic md5-based hashing, so
every stage is SQL-expressible (gate-checked against the DuckDB oracle) and
stays inside whole-stage codegen.  The LSH band join is the 100 TB scale
path: candidate generation shuffles on (band_id, band_hash) — output is
proportional to true near-duplicates, never to |docs|².
"""

from ton_indexer_spark.dedup.exact import exact_dedup
from ton_indexer_spark.dedup.shingles import shingles
from ton_indexer_spark.dedup.ngram import ngram_jaccard_pairs
from ton_indexer_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
    source_overlap_matrix,
)
from ton_indexer_spark.dedup.simhash import simhash_signature

__all__ = [
    "exact_dedup",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "source_overlap_matrix",
    "simhash_signature",
]
