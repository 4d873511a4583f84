"""Persisted ANN index artifacts (train once, serve many).

The IVF and PQ operators both split into a heavy BUILD half (centroid
assignment / code encoding — one full corpus pass) and a cheap SERVE
half (probe-list scoring / LUT-gather scan).  A 100 TB deployment runs
the build once and persists its output next to the data; every query
session after that loads the artifact and pays only the serve half.
This module is that seam, all-parquet so the artifacts live wherever
the tables live (HDFS/S3/local) with no side-channel formats:

- IVF:   ``<dir>/centroids``  (list_id, vector)   — coarse quantizer
         ``<dir>/assigned``   (vec_id, embedding, list_id) — inverted
         lists, written partitioned BY list_id so a probe prunes to its
         lists' files at scan time
- PQ:    ``<dir>/codebooks``  (m, code, vector)   — per-subspace books
         ``<dir>/codes``      (vec_id, codes)     — n_sub ints/vector,
         the ~64× compressed scan table

Loaders return exactly the shapes ``ivf_topk(centroids=, assigned=)``
and ``pq_topk(codebooks=, codes=)`` accept, and round-trip equality is
pinned by tests/test_index_store.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---- IVF -----------------------------------------------------------------

def save_ivf_index(
    path: str,
    centroids: tuple[np.ndarray, np.ndarray],
    assigned: DataFrame,
) -> None:
    """Persist a coarse quantizer + its inverted-list assignment.

    ``assigned`` is the nprobe=1 output of ``ivf_assign`` over the
    corpus: (vec_id, embedding, list_id).  Partitioning by list_id makes
    the later probe join prune to the probed lists' files."""
    spark = assigned.sparkSession
    ids, mat = centroids
    rows = [
        (int(i), [float(x) for x in v]) for i, v in zip(ids, mat)
    ]
    spark.createDataFrame(
        rows, "list_id long, vector array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/assigned"
    )


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[tuple[np.ndarray, np.ndarray], DataFrame]:
    """(centroids, assigned) ready for ``ivf_topk(centroids=, assigned=)``."""
    crows = (
        spark.read.parquet(f"{path}/centroids")
        .orderBy("list_id")
        .collect()
    )
    ids = np.array([r["list_id"] for r in crows], dtype=np.int64)
    mat = np.array([r["vector"] for r in crows], dtype=np.float64)
    assigned = spark.read.parquet(f"{path}/assigned").select(
        "vec_id", "embedding", "list_id"
    )
    return (ids, mat), assigned


# ---- PQ ------------------------------------------------------------------

def save_pq_index(
    path: str, codebooks: np.ndarray, codes: DataFrame
) -> None:
    """Persist PQ codebooks (n_sub, n_code, dsub) + the corpus code
    table from ``pq_encode``."""
    spark = codes.sparkSession
    n_sub, n_code, _ = codebooks.shape
    rows = [
        (m, c, [float(x) for x in codebooks[m, c]])
        for m in range(n_sub)
        for c in range(n_code)
    ]
    spark.createDataFrame(
        rows, "m int, code int, vector array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[np.ndarray, DataFrame]:
    """(codebooks, codes) ready for ``pq_topk(codebooks=, codes=)``."""
    crows = spark.read.parquet(f"{path}/codebooks").collect()
    n_sub = 1 + max(r["m"] for r in crows)
    n_code = 1 + max(r["code"] for r in crows)
    dsub = len(crows[0]["vector"])
    cb = np.zeros((n_sub, n_code, dsub), dtype=np.float64)
    for r in crows:
        cb[r["m"], r["code"]] = r["vector"]
    codes = spark.read.parquet(f"{path}/codes").select("vec_id", "codes")
    return cb, codes


__all__ = [
    "save_ivf_index",
    "load_ivf_index",
    "save_pq_index",
    "load_pq_index",
]
