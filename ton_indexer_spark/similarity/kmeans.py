"""Distributed k-means over an embedding column (Lloyd's algorithm).

The clustering stage behind corpus curation ops (SemDeDup-style semantic
dedup, cluster-balanced sampling, IVF centroid training).  Classic
distributed Lloyd's shape:

- assignment is one ``mapInPandas`` pass — Arrow batches × a broadcast
  (k × d) centroid matrix in BLAS, no shuffle (reuses ``ivf_assign``);
- the update is one ``groupBy(cluster, position).sum`` over posexploded
  coordinates — a single shuffle of k·d partial sums per partition, and
  the collect is the (k × d) centroid table, never the corpus.

Determinism (what makes this gate-able where textbook float k-means is
not): coordinates are quantized to integers (``round(x · 1e6)``) before
summing, so the centroid numerator is an exact int64 sum — identical
under any partitioning, task order, or engine.  The centroid is then the
IEEE-exact double ``sum / (count · 1e6)``; assignment ranks cosine
similarities rounded to ``round_digits`` with a smaller-centroid-id
tiebreak (the same cross-engine contract as ``ivf_assign``).  A DuckDB
oracle can therefore replay the identical iterations bit-for-bit.

Initialization is deterministic: the k corpus vectors with the smallest
ids (the ``ivf_seed_matrix`` convention — a production run passes trained
or sampled seeds; the plan shape is identical).  Empty clusters are
dropped (their seed stops attracting members), matching the SQL replay.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.similarity.ivf import ivf_assign, ivf_seed_matrix

QUANT = 1_000_000  # coordinate quantization: round(x * QUANT) as int64


def _quantized(vec_col: str):
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QUANT).cast("long"),
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id_col, cluster_id) — cosine k-means after ``n_iter`` assignment
    passes (n_iter - 1 centroid updates).

    ``cluster_id`` is the seed vector's id (stable across iterations), so
    downstream joins and the oracle replay agree on cluster identity.
    """
    assigned, _ids, _cent = kmeans_fit(
        emb, k, n_iter, id_col, vec_col, round_digits
    )
    return assigned


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """(assignment, centroid_ids, unit centroid matrix).

    The trained centroids drop into ``ivf_topk(..., centroids=...)`` as
    the coarse quantizer — the offline-training seam IVF documents — and
    into ``ivf_assign`` for SemDeDup over trained clusters.
    """
    if n_iter < 1:
        raise ValueError("kmeans: n_iter must be >= 1")
    cent_ids, cent = ivf_seed_matrix(emb, k, id_col, vec_col)
    for it in range(n_iter):
        assigned = ivf_assign(
            emb, cent_ids, cent, nprobe=1, id_col=id_col, vec_col=vec_col,
            round_digits=round_digits,
        )
        if it == n_iter - 1:
            break
        sums = (
            assigned.select(
                "list_id", F.posexplode(_quantized("embedding")).alias("pos", "q")
            )
            .groupBy("list_id", "pos")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()  # (k × d) centroid table — never the corpus
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["list_id"], {})[r["pos"]] = (r["s"], r["c"])
        cent_ids = np.array(sorted(by_cluster), dtype=np.int64)
        dim = max(len(p) for p in by_cluster.values())
        mat = np.empty((len(cent_ids), dim), dtype=np.float64)
        for i, cid in enumerate(cent_ids):
            for pos, (s, c) in by_cluster[cid].items():
                mat[i, pos] = np.float64(s) / (c * QUANT)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = mat / norms
    return (
        assigned.select(
            F.col("vec_id").alias(id_col),
            F.col("list_id").alias("cluster_id"),
        ),
        cent_ids,
        cent,
    )
