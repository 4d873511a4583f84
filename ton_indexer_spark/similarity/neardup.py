"""Embedding-cosine near-duplicate pairs.

Two paths:

- ``cosine_neardup_pairs`` (DEFAULT, the scale path): LSH sign-bucket
  candidate generation → per-bucket self-join → JVM-side cosine column
  expression.  Fully distributed — no driver collect, no broadcast of the
  corpus; the only shuffle is on the bucket key, and per-bucket cost is
  O(|bucket|²·d).  This is the plan that survives a 100× corpus.

- ``cosine_neardup_pairs_dense`` (opt-in rerank): blocked BLAS matmul of
  every partition against a broadcast normalized corpus — exact all-pairs,
  ~100× faster per pair than expression evaluation, but the broadcast
  bounds the corpus.  Guarded by ``max_rows`` (default 2M ≈ 1 GB fp64 at
  d=64): exceeding it raises instead of silently OOMing the driver.  Use
  it to rerank LSH/minhash candidates or score small corpora exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.similarity.lsh import banded_sign_buckets
from ton_indexer_spark.similarity.rounding import round_half_away

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
    n_bands: int = 16,
    band_planes: int = 4,
) -> DataFrame:
    """(vec_a, vec_b, sim) with vec_a < vec_b, colliding in ≥1 LSH sign
    band, and round(sim, round_digits) >= threshold.

    Banded (OR-of-ANDs) candidate semantics: a pair is scored iff its
    sign patterns agree on any band's coordinate slice — ~97% recall at
    cosine 0.4 with the 16×4 default, the standard trade for distributed
    near-dup at corpus scale.

    Execution: vectors ride the band+bucket shuffle once; each (band,
    bucket) group is scored by a LOCAL BLAS matmul inside applyInPandas —
    O(|bucket|²·d) flops per group at dense-kernel speed, ~100× cheaper
    per pair than expression evaluation, with no driver collect and no
    corpus broadcast.  Cross-band duplicates collapse in one distinct
    (sim is deterministic per pair).  Hot buckets are the skew lever:
    raise band_planes to split them."""
    b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            banded_sign_buckets(F.col(vec_col), n_bands, band_planes)
        ).alias("bb"),
    ).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "id",
        "vec",
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        # BLOCKED matmul: a full |bucket|² fp64 sims matrix is O(n²)
        # MEMORY, not just flops — a 12.5k-row bucket is 1.25 GB, and 32
        # concurrent workers took the host down at the sf10 scaling
        # decade (OS oom-kill, round 9).  Row-blocks bound the live sims
        # slab at ~64 MB per worker for any bucket size; the pair set
        # and sims are bit-identical to the one-shot product.
        n = len(ids)
        blk = max(1, (64 << 20) // (8 * max(1, n)))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for s in range(0, n, blk):
            sims = round_half_away(mat[s:s + blk] @ mat.T, round_digits)
            ai, bj = np.nonzero(
                (sims >= threshold) & (ids[s:s + blk, None] < ids[None, :])
            )
            out_a.append(ids[s:s + blk][ai])
            out_b.append(ids[bj])
            out_s.append(sims[ai, bj])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else out_a,
                "vec_b": np.concatenate(out_b) if out_b else out_b,
                "sim": np.concatenate(out_s) if out_s else out_s,
            }
        )

    return (
        b.groupBy("band", "bucket")
        .applyInPandas(score_bucket, schema=PAIRS_SCHEMA)
        .distinct()
    )


def cosine_neardup_pairs_dense(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_rows: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs via blocked BLAS matmul against a broadcast corpus.

    Each task multiplies its Arrow batch (b×d) against the broadcast
    normalized matrix (n×d) — O(b·n·d) flops in BLAS, emitting only
    qualifying (i < j) pairs.  The broadcast bounds n: ``max_rows``
    guards the driver collect and raises past it (use the LSH path or
    shrink the candidate set instead)."""
    spark = emb.sparkSession
    n = emb.count()
    if n > max_rows:
        raise ValueError(
            f"dense all-pairs corpus has {n} rows > max_rows={max_rows}; "
            "use cosine_neardup_pairs (LSH path) or raise the guard "
            "explicitly"
        )
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
            sims = round_half_away(b_mat @ c_mat.T, round_digits)
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
