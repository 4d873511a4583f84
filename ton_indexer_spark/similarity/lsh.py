"""Sign-pattern LSH approximate nearest neighbors (the scale path).

Bucket key = sign bits of the first `n_planes` coordinates — a degenerate
but fully deterministic random-hyperplane LSH (axis-aligned hyperplanes),
chosen so the oracle can compute identical buckets.  Real deployments pass
`planes` = seeded random hyperplanes instead; the plan shape is identical:

    corpus → bucket key (codegen) → shuffle on bucket → per-bucket top-k.

Complexity per query is O(bucket size · d), and the join never leaves the
bucket key's hash partitioning — this is the property that survives 100×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ton_indexer_spark.similarity.brute import cosine


def sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """'0'/'1' sign-pattern string of the first n_planes coordinates."""
    return F.concat(
        *[
            F.when(F.element_at(vec, j + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(n_planes)
        ]
    )


def sign_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) — top-k within the query's bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        sign_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
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
