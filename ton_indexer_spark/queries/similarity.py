"""Similarity-search gate queries over `embeddings` (array<float>, dim 64)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.queries import register
from ton_indexer_spark.similarity import cosine_topk, sign_lsh_topk


@register(
    "embed_cosine_topk",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qvec, CAST(c.embedding AS DOUBLE[])), 6)
                   AS sim
        FROM embeddings c, q
        WHERE c.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS "rank"
        FROM scored
    )
    SELECT query_id, "rank", neighbor_id, sim
    FROM ranked WHERE "rank" <= 10
    ORDER BY query_id, "rank"
    """,
    survey_ops=("beyond:ann-brute",),
    description="brute-force cosine top-10 per query vector (exact ANN "
    "baseline; queries = vec_id % 100 == 0)",
)
def embed_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk(queries, emb, k=10).orderBy("query_id", "rank")


@register(
    "embed_lsh_topk",
    """
    WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {bucket} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qvec, bucket FROM b WHERE vec_id % 50 = 0),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qvec, c.v), 6) AS sim
        FROM b c JOIN q ON c.bucket = q.bucket
        WHERE c.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS "rank"
        FROM scored
    )
    SELECT query_id, "rank", neighbor_id, sim
    FROM ranked WHERE "rank" <= 5
    ORDER BY query_id, "rank"
    """.format(
        bucket=" || ".join(
            f"(CASE WHEN embedding[{j + 1}] >= 0 THEN '1' ELSE '0' END)"
            for j in range(8)
        )
    ),
    survey_ops=("beyond:ann-lsh",),
    description="sign-pattern LSH-bucketed ANN top-5 (scale path: join stays "
    "inside bucket partitions)",
)
def embed_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sign_lsh_topk(queries, emb, k=5, n_planes=8).orderBy("query_id", "rank")
