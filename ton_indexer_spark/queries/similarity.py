"""Similarity-search gate queries over `embeddings` (array<float>, dim 64)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.queries import register
from ton_indexer_spark.similarity import cosine_topk, sign_lsh_topk
from ton_indexer_spark.similarity.ivf import ivf_topk


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


@register(
    "embed_ivf_topk",
    """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
        SELECT vec_id AS list_id, v AS sv FROM v ORDER BY vec_id LIMIT 16
    ),
    sim_all AS (
        SELECT v.vec_id, v.v, s.list_id,
               ROUND(list_cosine_similarity(v.v, s.sv), 6) AS ssim
        FROM v CROSS JOIN seeds s
    ),
    ranked_assign AS (
        SELECT vec_id, v, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ssim DESC, list_id ASC) AS pr
        FROM sim_all
    ),
    corpus AS (
        SELECT vec_id AS neighbor_id, v AS cvec, list_id
        FROM ranked_assign WHERE pr = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qvec, list_id
        FROM ranked_assign WHERE pr <= 4 AND vec_id % 50 = 25
    ),
    scored AS (
        SELECT p.query_id, c.neighbor_id,
               ROUND(list_cosine_similarity(p.qvec, c.cvec), 6) AS sim
        FROM corpus c JOIN probes p USING (list_id)
        WHERE c.neighbor_id != p.query_id
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
    """,
    survey_ops=("beyond:ann-ivf",),
    description="IVF probe-list ANN top-5 (coarse quantizer = 16 "
    "deterministic seed centroids, nprobe=4): corpus assignment via "
    "Arrow-batch BLAS, candidate join shuffles on list_id only — the "
    "IVF scale path complementing the LSH variant",
)
def embed_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 25)
    return ivf_topk(queries, emb, n_lists=16, nprobe=4, k=5).orderBy(
        "query_id", "rank"
    )
