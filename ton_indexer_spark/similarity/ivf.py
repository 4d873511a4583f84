"""IVF-style ANN: coarse quantizer → inverted lists → probe-list search.

The classic IVF decomposition (Jégou et al., "Product Quantization for
Nearest Neighbor Search", IVFADC coarse stage):

1. a small set of centroid vectors partitions the corpus into inverted
   lists (each vector assigned to its nearest centroid);
2. a query scores only the vectors in its ``nprobe`` closest lists.

Centroids here are **deterministic seeds** — the ``n_lists`` corpus
vectors with the smallest ids — rather than trained k-means means, so the
operator is exactly reproducible in the DuckDB oracle (floating k-means is
engine-order-dependent and would break the hash gate).  A production
deployment trains centroids offline and passes them in; the plan shape is
identical — this seam is the same one ``similarity/lsh.py`` documents for
its hyperplanes.

Scale shape (what survives 100×):

- assignment is one ``mapInPandas`` over the corpus — Arrow batches × a
  broadcast (n_lists × d) matrix in BLAS; no shuffle;
- the probe join shuffles on ``list_id`` only: cost is
  Σ_{probed lists} |list| · d per query, never |corpus| · |queries|;
- final scoring is the JVM-side ``cosine`` column expression, whole-stage
  codegen, rounded to 6 dp for cross-engine rank stability.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from ton_indexer_spark.similarity.rounding import round_half_away, unit_rows


def ivf_seed_matrix(
    emb: DataFrame, n_lists: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(list_ids, seed_matrix) — the n_lists smallest-id vectors, unit-
    normalized.  n_lists is small (≤ a few thousand): this collect is a
    centroid table, not a corpus collect."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_lists)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_seed_matrix: corpus is empty — no centroids")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, unit_rows(mat)


def ivf_assign(
    df: DataFrame,
    seed_ids: np.ndarray,
    seed_matrix: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Attach the ``nprobe`` nearest list ids to every row.

    Returns (id_col, vec_col, list_id) with one row per (vector, probed
    list).  nprobe=1 is corpus assignment; queries pass nprobe>1.
    Similarities are rounded before the argsort (ties → smaller list id)
    so the assignment is identical across engines that accumulate floats
    in different orders.
    """
    # a corpus smaller than n_lists yields fewer seeds; probing more lists
    # than exist is the full set
    nprobe = min(nprobe, len(seed_ids))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((seed_ids, seed_matrix))
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("list_id", T.LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, seeds = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            sims = round_half_away(unit_rows(mat) @ seeds.T, round_digits)
            # argsort by (-sim, list_id): lexsort keys, last key primary
            order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims))
            probes = order[:, :nprobe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf[id_col].to_numpy(dtype=np.int64), nprobe
                    ),
                    "embedding": [
                        v for v in pdf[vec_col] for _ in range(nprobe)
                    ],
                    "list_id": ids[probes].reshape(n * nprobe),
                }
            )

    return df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).mapInPandas(assign, schema=out_schema)


def auto_n_lists(n: int) -> int:
    """Default coarse-quantizer width: ``√N`` (the classic IVF balance —
    probed candidates per query grow √N instead of N), floored at 16 and
    capped at 65 536 so the broadcast seed matrix stays driver-safe
    (65 536 × d float32 ≈ 32 MB at d=128)."""
    return max(16, min(65_536, math.isqrt(max(n, 0))))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_lists: int | None = None,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "tuple[np.ndarray, np.ndarray] | None" = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) — IVF probe-list ANN top-k.

    Corpus rows land in exactly one inverted list; each query probes its
    ``nprobe`` nearest lists.  The candidate join shuffles on ``list_id``
    only and the corpus never crosses lists — the IVF property that makes
    per-query cost proportional to the probed fraction, not the corpus.

    ``n_lists`` defaults to ``auto_n_lists(|corpus|)`` (∝ √N, one
    scalar-output count job) so a caller who doesn't pin the knob gets
    the scale-correct setting at any corpus size; the oracle gate pins
    an explicit value for deterministic replay.

    ``centroids`` — optional trained coarse quantizer as (list_ids, unit
    matrix), e.g. from ``kmeans_fit``; defaults to the deterministic
    smallest-id seeds (the oracle-replayable configuration).
    """
    if centroids is not None:
        seed_ids, seeds = centroids
    else:
        if n_lists is None:
            n_lists = auto_n_lists(corpus.count())
        seed_ids, seeds = ivf_seed_matrix(corpus, n_lists, id_col, vec_col)
    if assigned is None:
        # `assigned` — optional persisted inverted-list table
        # (similarity/index_store.py): at deployment scale the corpus is
        # assigned ONCE and served many times
        assigned = ivf_assign(
            corpus, seed_ids, seeds, nprobe=1, id_col=id_col,
            vec_col=vec_col,
        )
    assigned = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
        "list_id",
    )
    probes = ivf_assign(
        queries, seed_ids, seeds, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        "list_id",
    )
    # score per inverted list with a LOCAL BLAS matmul (cogrouped
    # applyInPandas): Spark's higher-order-function cosine is evaluated
    # interpreted (outside codegen), so at |queries|·nprobe/n_lists·|list|
    # candidate pairs the dense kernel wins by ~10×.  Values are identical:
    # float64 dot of unit-normalized vectors, rounded to 6 dp.
    scored_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score_list(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty or qdf.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64",
                      "sim": "float64"})

        def unit(col: pd.Series) -> np.ndarray:
            return unit_rows(np.array(list(col), dtype=np.float64))

        c_ids = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        q_ids = qdf["query_id"].to_numpy(dtype=np.int64)
        sims = round_half_away(unit(qdf["qvec"]) @ unit(cdf["cvec"]).T, 6)
        qi, cj = np.nonzero(q_ids[:, None] != c_ids[None, :])
        return pd.DataFrame(
            {
                "query_id": q_ids[qi],
                "neighbor_id": c_ids[cj],
                "sim": sims[qi, cj],
            }
        )

    scored = (
        assigned.groupBy("list_id")
        .cogroup(probes.groupBy("list_id"))
        .applyInPandas(
            lambda c, q: score_list(c, q), schema=scored_schema
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
