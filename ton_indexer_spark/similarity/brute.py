"""Brute-force cosine top-k (exact baseline).

The ``cosine``/``dot``/``norm`` column helpers are JVM-side higher-order
functions, useful for scoring bounded candidate sets inside a relational
plan.  ``cosine_topk`` itself scores the full corpus with an Arrow-batch
BLAS matmul against a broadcast query matrix (HOFs evaluate interpreted,
outside codegen — at |Q|·|C| pairs the dense kernel wins by ~10×).
Ranking rounds the similarity to 6 dp before ordering (with the id as
tiebreaker) so the induced order is stable across engines that accumulate
floats in different orders — that makes the operator oracle-checkable
without weakening the semantics.

Scale note: brute force is O(|Q|·|C|·d) — correct tool for small query sets
or reranking after the LSH/IVF candidate stage (similarity/lsh.py,
similarity/ivf.py).  The query set is collected and broadcast (it must be
small — that is the operator's contract); the corpus never shuffles, and
each batch forwards at most |Q|·k candidate rows to the final window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) — top-k corpus rows per query by
    cosine; excludes self-matches; sim rounded to 6 dp, rank 1-based.

    Execution: the (small) query set is collected to a broadcast matrix
    and each corpus Arrow batch scores against it with one float64 BLAS
    matmul, emitting only its per-batch top-k candidates per query; a
    final window takes the global top-k.  The corpus never shuffles —
    only |queries|·k candidate rows per batch do — and the dense kernel
    replaces Spark's higher-order-function cosine, which is evaluated
    interpreted (outside codegen) and loses by ~10× at |Q|·|C| pairs.
    Values are identical (round 6 dp before ranking)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, sim double"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_norms[q_norms == 0] = 1.0
    bc = spark.sparkContext.broadcast((q_ids, q_mat / q_norms))

    scored_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score(batches):
        ids, qm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round(qm @ (c_mat / norms).T, 6)  # |Q| × batch
            mask = ids[:, None] != c_ids[None, :]
            # per-batch pruning: only the batch-local top-k can survive
            # the global window, so emit at most k rows per query
            keep_q, keep_c = [], []
            for qi in range(sims.shape[0]):
                cols = np.nonzero(mask[qi])[0]
                if len(cols) > k:
                    # sort by (-sim, neighbor_id) and keep k
                    order = np.lexsort((c_ids[cols], -sims[qi, cols]))
                    cols = cols[order[:k]]
                keep_q.extend([qi] * len(cols))
                keep_c.extend(cols.tolist())
            keep_q = np.array(keep_q, dtype=np.int64)
            keep_c = np.array(keep_c, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "query_id": ids[keep_q],
                    "neighbor_id": c_ids[keep_c],
                    "sim": sims[keep_q, keep_c],
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=scored_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
