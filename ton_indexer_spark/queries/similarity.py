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


@register(
    "hard_negatives",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec,
               label AS qlabel
        FROM embeddings WHERE vec_id % 100 = 7
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
               ROUND(list_cosine_similarity(q.qvec,
                                            CAST(c.embedding AS DOUBLE[])), 6)
                   AS sim
        FROM embeddings c, q
        WHERE c.vec_id != q.query_id AND c.label != q.qlabel
    ),
    ranked AS (
        SELECT query_id, neighbor_id, neighbor_label, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS "rank"
        FROM scored
    )
    SELECT query_id, "rank", neighbor_id, sim
    FROM ranked WHERE "rank" <= 8
    ORDER BY query_id, "rank"
    """,
    survey_ops=("beyond:hard-negatives",),
    description="contrastive hard-negative mining: per query, the top-8 "
    "most-similar vectors from OTHER label classes (the brute kernel's "
    "label-exclusion mode — same broadcast-query BLAS scan, mask swaps "
    "self-exclusion for class-exclusion); the anchor/negative pair "
    "generator for embedding-model training data",
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 100 == 7)
    return cosine_topk(
        queries, emb, k=8, exclude_label_col="label"
    ).orderBy("query_id", "rank")


@register(
    "embed_pq_topk",
    """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code_idx
        FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)
    ),
    subv AS (
        SELECT vec_id, u.m,
               list_slice(v, u.m * 16 + 1, u.m * 16 + 16) AS sv
        FROM v, unnest(range(0, 4)) AS u(m)
    ),
    subc AS (
        SELECT code_idx, u.m,
               list_slice(v, u.m * 16 + 1, u.m * 16 + 16) AS cv
        FROM seeds, unnest(range(0, 4)) AS u(m)
    ),
    dists AS (
        SELECT s.vec_id, s.m, c.code_idx,
               CAST(ROUND(list_distance(s.sv, c.cv) * 1000000, 0) AS BIGINT)
                   AS dus
        FROM subv s JOIN subc c USING (m)
    ),
    codes AS (
        SELECT vec_id, m, code_idx FROM (
            SELECT vec_id, m, code_idx,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY dus ASC, code_idx ASC) AS pr
            FROM dists) WHERE pr = 1
    ),
    adc AS (
        SELECT d.vec_id AS query_id, c.vec_id AS neighbor_id,
               SUM(d.dus) AS adc_dist_us
        FROM codes c
        JOIN dists d ON d.m = c.m AND d.code_idx = c.code_idx
        WHERE d.vec_id % 50 = 10 AND c.vec_id != d.vec_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc_dist_us,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist_us ASC,
                                           neighbor_id ASC) AS "rank"
        FROM adc
    )
    SELECT query_id, "rank", neighbor_id,
           CAST(adc_dist_us AS BIGINT) AS adc_dist_us
    FROM ranked WHERE "rank" <= 5
    ORDER BY query_id, "rank"
    """,
    survey_ops=("beyond:ann-pq",),
    description="product-quantization ANN top-5 (4 subspaces × 16 seed "
    "codewords, asymmetric-distance scan): corpus compresses to 4 codes "
    "per vector via Arrow-batch encoding, queries broadcast int64 "
    "micro-unit lookup tables and the scan is table-gather sums — the "
    "persisted-index scale path complementing the LSH and IVF variants",
)
def embed_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.similarity.pq import pq_topk

    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 10)
    return pq_topk(queries, emb, n_code=16, n_sub=4, k=5).orderBy(
        "query_id", "rank"
    )


@register(
    "mmr_select",
    """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id % 100 = 30),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, c.v AS cv,
               ROUND(list_cosine_similarity(q.qv, c.v), 6) AS sim
        FROM v c, q WHERE c.vec_id != q.query_id
    ),
    cand AS (
        SELECT query_id, neighbor_id, cv,
               CAST(ROUND(sim * 1000000, 0) AS BIGINT) AS rel_us
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 20
    ),
    pair AS (
        SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
               CAST(ROUND(list_cosine_similarity(a.cv, b.cv) * 1000000, 0)
                    AS BIGINT) AS sim_us
        FROM cand a JOIN cand b
          ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
    ),
    mmr AS (
        SELECT query_id, 1 AS step, [neighbor_id] AS picked,
               neighbor_id, rel_us AS score_us
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rel_us DESC, neighbor_id ASC) AS pr FROM cand)
        WHERE pr = 1
        UNION ALL
        SELECT query_id, step + 1, list_append(picked, neighbor_id),
               neighbor_id, score_us
        FROM (
            SELECT m.query_id, m.step, m.picked, c.neighbor_id,
                   c.rel_us - MAX(p.sim_us) AS score_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY m.query_id, m.step
                       ORDER BY c.rel_us - MAX(p.sim_us) DESC,
                                c.neighbor_id ASC) AS pr
            FROM mmr m
            JOIN cand c ON c.query_id = m.query_id
                       AND NOT list_contains(m.picked, c.neighbor_id)
            JOIN pair p ON p.query_id = m.query_id
                       AND p.a_id = c.neighbor_id
                       AND list_contains(m.picked, p.b_id)
            WHERE m.step < 5
            GROUP BY m.query_id, m.step, m.picked, c.neighbor_id, c.rel_us
        ) WHERE pr = 1
    )
    SELECT query_id, step, neighbor_id, score_us
    FROM mmr ORDER BY query_id, step
    """,
    survey_ops=("beyond:mmr",),
    description="maximal-marginal-relevance diversified top-5 over an "
    "exact top-20 candidate pool (λ=0.5; integer micro-unit scores): "
    "candidate generation is the distributed ANN stage, the inherently "
    "sequential greedy runs per-query-local and parallel across queries "
    "— no driver collect; oracle replays the greedy as a recursive CTE",
)
def mmr_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.similarity.mmr import mmr_select

    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 100 == 30)
    return mmr_select(queries, emb, k=5, n_candidates=20).orderBy(
        "query_id", "step"
    )


# ---- semantic dedup + k-means gates -------------------------------------

_SEED_ASSIGN_CTE = """
    v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
        SELECT vec_id AS cid, v AS cv FROM v ORDER BY vec_id LIMIT {k}
    ),
    assign1 AS (
        SELECT v.vec_id, v.v, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ROUND(list_cosine_similarity(v.v, s.cv), 6) DESC,
                            s.cid ASC) AS pr
        FROM v CROSS JOIN seeds s
    ),
    members AS (SELECT vec_id, v, cid FROM assign1 WHERE pr = 1)
"""


@register(
    "semdedup",
    f"""
    WITH {_SEED_ASSIGN_CTE.format(k=8)},
    pairs AS (
        SELECT b.vec_id AS v, MIN(a.vec_id) AS dup_of
        FROM members a JOIN members b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        GROUP BY b.vec_id
    )
    SELECT m.vec_id,
           m.cid AS cluster_id,
           p.dup_of,
           p.dup_of IS NOT NULL AS is_duplicate
    FROM members m LEFT JOIN pairs p ON p.v = m.vec_id
    ORDER BY m.vec_id
    """,
    survey_ops=("beyond:semdedup",),
    description="SemDeDup-style semantic dedup: centroid assignment "
    "(broadcast seeds, Arrow-batch BLAS) then near-dup only WITHIN each "
    "cluster — Σ|cluster|² not O(N²), cluster count scales ∝ N; "
    "keep-smallest-id policy matching the exact/MinHash stages",
)
def semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.similarity.semdedup import semdedup

    emb = Catalog(spark, sf_dir).embeddings
    return semdedup(emb, n_clusters=8, threshold=0.4).orderBy("vec_id")


def _kmeans_oracle(k: int = 8) -> str:
    # replay iteration 1 assignment, the exact-integer centroid update,
    # and iteration 2 assignment — bit-for-bit the Spark computation
    # (quantized int64 coordinate sums make the mean order-independent)
    return f"""
    WITH {_SEED_ASSIGN_CTE.format(k=k)},
    q AS (
        SELECT vec_id, v,
               list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT))
                   AS qv
        FROM v
    ),
    m1 AS (
        SELECT q.vec_id, q.v, q.qv, m.cid
        FROM q JOIN members m USING (vec_id)
    ),
    cpos AS (
        SELECT cid, i AS pos, SUM(qv[i]) AS s, COUNT(*) AS c
        FROM m1, unnest(range(1, len(qv) + 1)) AS u(i)
        GROUP BY cid, i
    ),
    c1 AS (
        SELECT cid, list(s * 1.0 / (c * 1000000) ORDER BY pos) AS cv
        FROM cpos GROUP BY cid
    ),
    assign2 AS (
        SELECT q.vec_id, c1.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c1.cv), 6) DESC,
                            c1.cid ASC) AS pr
        FROM q CROSS JOIN c1
    )
    SELECT vec_id, cid AS cluster_id
    FROM assign2 WHERE pr = 1
    ORDER BY vec_id
    """


@register(
    "embed_kmeans",
    _kmeans_oracle(),
    survey_ops=("beyond:kmeans",),
    description="distributed cosine k-means (2 Lloyd passes, k=8, "
    "deterministic smallest-id seeds): assignment = broadcast-centroid "
    "Arrow BLAS (no shuffle), update = one groupBy(cluster, pos) over "
    "QUANTIZED int64 coordinates — the exact-integer sum makes the "
    "centroid partitioning/engine-independent, so the oracle replays "
    "both iterations bit-for-bit (textbook float k-means is not "
    "gate-able)",
)
def embed_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.similarity.kmeans import kmeans

    emb = Catalog(spark, sf_dir).embeddings
    return kmeans(emb, k=8, n_iter=2).orderBy("vec_id")
