"""All-pairs cosine near-duplicate detection via blocked matrix multiply.

Column-algebra cosine (`zip_with`+`aggregate`) is fine for top-k against a
small query set, but all-pairs scoring is a dense matmul problem: per-pair
lambda evaluation costs ~100× more than BLAS.  Shape here:

    corpus → L2-normalize → broadcast (numpy matrix, ids)
    corpus partitions → mapInPandas: block  @ corpusᵀ  → pairs ≥ threshold

Each task multiplies its Arrow batch (b×d) against the broadcast matrix
(n×d) — O(b·n·d) flops in BLAS, emitting only qualifying pairs (i < j).

Scale honesty: the broadcast bounds n (fits comfortably to ~10M×64 fp32 ≈
2.5 GB); beyond that the LSH/IVF candidate path (similarity/lsh.py,
dedup/minhash.py) is the tool and this operator becomes its rerank stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("vec_a", T.LongType()),
        T.StructField("vec_b", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(vec_a, vec_b, sim) with vec_a < vec_b and round(sim, 6) >= threshold."""
    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    bc = spark.sparkContext.broadcast((ids, mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = bc.value
        for pdf in batches:
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            b_norms = np.linalg.norm(b_mat, axis=1, keepdims=True)
            b_norms[b_norms == 0] = 1.0
            b_mat = b_mat / b_norms
            sims = np.round(b_mat @ c_mat.T, round_digits)
            ai, cj = np.nonzero(
                (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": b_ids[ai],
                    "vec_b": c_ids[cj],
                    "sim": sims[ai, cj],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(score, schema=PAIRS_SCHEMA)
