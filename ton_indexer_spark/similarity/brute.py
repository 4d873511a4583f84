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
from ton_indexer_spark.similarity.rounding import round_half_away, unit_rows


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
    max_queries: int = 65_536,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) — top-k corpus rows per query by
    cosine; excludes self-matches (query_id == neighbor_id); sim rounded
    to 6 dp, rank 1-based.  Id columns keep their input types (int,
    string, …) — ids ride along positionally, never through numpy.

    Contract: the QUERY side must be small — it is collected to the
    driver and broadcast as a dense matrix (``max_queries`` guards this
    with a clear error; for large query sets use the LSH/IVF operators).
    The corpus side is unbounded: each Arrow batch scores against the
    broadcast matrix with one float64 BLAS matmul, emitting only its
    per-batch top-k candidates per query; a final window takes the
    global top-k.  The corpus never shuffles — only |queries|·k
    candidate rows per batch do — and the dense kernel replaces Spark's
    higher-order-function cosine, which is evaluated interpreted
    (outside codegen) and loses by ~10× at |Q|·|C| pairs.

    ``exclude_label_col`` — hard-negative mining mode: both sides must
    carry that column, and a corpus row whose label EQUALS the query's is
    masked out, so top-k returns the nearest vectors from OTHER classes
    (the contrastive-training negatives a same-class top-k would hide).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    q_cols = [id_col, vec_col] + (
        [exclude_label_col] if exclude_label_col else []
    )
    q_rows = queries.select(*q_cols).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk query side exceeds max_queries={max_queries}; "
            "brute force broadcasts the query matrix — use lsh_topk / "
            "ivf_topk for large query sets, or raise max_queries "
            "explicitly"
        )
    id_type = queries.schema[id_col].dataType
    neighbor_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("neighbor_id", neighbor_type),
            T.StructField("sim", T.DoubleType()),
        ]
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    # ids stay python objects (any orderable type); only vectors go dense
    q_ids = [r[0] for r in q_rows]
    q_labels = [r[2] for r in q_rows] if exclude_label_col else None
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((q_ids, unit_rows(q_mat), q_labels))

    scored_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", neighbor_type),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score(batches):
        ids, qm, labels = bc.value
        id_arr = np.array(ids, dtype=object)
        lab_arr = np.array(labels, dtype=object) if labels is not None else None
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            sims = round_half_away(qm @ unit_rows(c_mat).T, 6)  # |Q| × batch
            mask = id_arr[:, None] != c_ids[None, :]
            if lab_arr is not None:
                # SQL `c.label != q.label` semantics: a NULL label on
                # EITHER side excludes the pair (unknown class is never
                # mined as a negative), matching the gate oracle
                c_labs = pdf[exclude_label_col].to_numpy()
                q_ok = np.array(
                    [l is not None and l == l for l in lab_arr]
                )
                c_ok = np.array(
                    [l is not None and l == l for l in c_labs]
                )
                mask &= (
                    q_ok[:, None]
                    & c_ok[None, :]
                    & (lab_arr[:, None] != c_labs[None, :])
                )
            # pre-order the batch once by neighbor id: a STABLE sort on
            # -sim then preserves the id tiebreak without per-element
            # Python comparisons (the interpreted sorted() this replaces
            # dominated the BLAS matmul at corpus-batch scale)
            id_order = np.argsort(c_ids, kind="stable")
            sims_o = sims[:, id_order]
            mask_o = mask[:, id_order]
            # per-batch pruning: only the batch-local top-k can survive
            # the global window, so emit at most k rows per query
            keep_q, keep_c = [], []
            for qi in range(sims_o.shape[0]):
                cols = np.nonzero(mask_o[qi])[0]
                if len(cols) > k:
                    order = cols[
                        np.argsort(-sims_o[qi, cols], kind="stable")
                    ][:k]
                    cols = order
                keep_q.extend([qi] * len(cols))
                keep_c.extend(id_order[cols].tolist())
            yield pd.DataFrame(
                {
                    "query_id": [ids[i] for i in keep_q],
                    "neighbor_id": [c_ids[j] for j in keep_c],
                    "sim": [sims[i, j] for i, j in zip(keep_q, keep_c)],
                }
            )

    c_cols = [id_col, vec_col] + (
        [exclude_label_col] if exclude_label_col else []
    )
    scored = corpus.select(*c_cols).mapInPandas(
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
