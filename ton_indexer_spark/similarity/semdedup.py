"""SemDeDup-style semantic deduplication: cluster, then near-dup within
clusters.

The published recipe (Abbas et al. 2023, "SemDeDup") clusters the corpus
embeddings with k-means and removes near-duplicates only WITHIN each
cluster — turning the O(N²) pairwise problem into Σ|cluster|², with
cluster count scaled ∝ N so per-cluster size stays bounded.  This module
composes the repo's existing pieces:

- assignment: ``ivf_assign`` against deterministic seed centroids (or the
  trained centroids from ``kmeans`` — same plan shape; the gate pins
  seeds so the DuckDB oracle can replay the assignment exactly);
- within-cluster pairs: one ``applyInPandas`` per cluster — BLAS
  similarity matrix over Arrow batches, emitting for every vector the
  smallest-id earlier vector it duplicates (``dup_of``), the same
  keep-the-smallest-id policy as the exact/MinHash dedup stages.

The duplicate verdict is "∃ u < v in the same cluster with
round(cos(u, v), 6) ≥ threshold" — deterministic, engine-portable, and a
pure per-cluster computation (no cross-cluster shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.similarity.ivf import ivf_assign, ivf_seed_matrix
from ton_indexer_spark.similarity.rounding import round_half_away


def auto_n_clusters(n: int, target_cluster_size: int = 1024) -> int:
    """Default cluster count: ``N / target_cluster_size`` (n_clusters ∝ N
    keeps the expected cluster size — and with it the per-cluster
    Σ|c|² pair scan — BOUNDED as the corpus grows), floored at 8 and
    capped at 2¹⁸ so the collected centroid matrix stays driver-safe."""
    return max(8, min(1 << 18, -(-max(n, 0) // target_cluster_size)))


def semdedup(
    emb: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    centroids: "tuple | None" = None,
) -> DataFrame:
    """(id_col, cluster_id, dup_of, is_duplicate) — one row per vector.

    ``dup_of`` is the smallest same-cluster id ``u < v`` with
    ``round(cos(u, v), round_digits) >= threshold`` (null for kept
    vectors); ``is_duplicate`` is its non-nullness.  Cluster identity is
    the seed vector's id (``ivf_seed_matrix`` convention).

    ``n_clusters`` defaults to ``auto_n_clusters(|emb|)`` (∝ N with
    bounded expected cluster size, one scalar-output count job) so an
    unpinned call scales correctly at any corpus size; the oracle gate
    pins an explicit value for deterministic replay.

    ``centroids`` — optional trained (ids, unit matrix) from
    ``kmeans_fit`` (the published SemDeDup recipe clusters with k-means);
    defaults to deterministic smallest-id seeds, the oracle-replayable
    configuration the gate pins.
    """
    if centroids is not None:
        seed_ids, seeds = centroids
    else:
        if n_clusters is None:
            n_clusters = auto_n_clusters(emb.count())
        seed_ids, seeds = ivf_seed_matrix(emb, n_clusters, id_col, vec_col)
    assigned = ivf_assign(
        emb, seed_ids, seeds, nprobe=1, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster_id", T.LongType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("is_duplicate", T.BooleanType()),
        ]
    )

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array(list(pdf["embedding"].iloc[order]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = round_half_away(unit @ unit.T, round_digits)
        # strict upper triangle transposed: hit[i, j] with i < j means
        # ids[j] duplicates ids[i]; dup_of[j] = ids[first hit row]
        hits = (sims >= threshold) & np.tri(len(ids), k=-1, dtype=bool).T
        any_dup = hits.any(axis=0)
        first = hits.argmax(axis=0)
        dup_of = np.where(any_dup, ids[first], 0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": pdf["list_id"].iloc[0],
                "dup_of": pd.array(
                    [d if a else None for d, a in zip(dup_of, any_dup)],
                    dtype="Int64",
                ),
                "is_duplicate": any_dup,
            }
        )

    return (
        assigned.groupBy("list_id")
        .applyInPandas(dedup_cluster, schema=out_schema)
        .withColumnRenamed("vec_id", id_col)
    )
