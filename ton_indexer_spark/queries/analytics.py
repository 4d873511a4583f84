"""Beyond-reference analytics gate queries: time windows, approximate
distinct, embedding near-duplicate pairs (SURVEY.md §2.4/§2.8 'absent'
rows — available natively in this engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.functions.timecols import epoch_us
from ton_indexer_spark.queries import register
from ton_indexer_spark.similarity.brute import cosine

HOUR_US = 3600 * 1_000_000


@register(
    "tumbling_window",
    f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket_us, event_type
    """,
    survey_ops=("beyond:time-window",),
    description="tumbling 1-hour window aggregation; gate path uses "
    "timezone-free integer bucketing (robust to the driver session tz), "
    "F.window equivalence is pinned in tests/test_analytics.py",
)
def tumbling_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    ts_us = epoch_us(ev, "ts")
    bucket = (ts_us - F.pmod(ts_us, F.lit(HOUR_US))).alias("bucket_us")
    return (
        ev.groupBy(bucket, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
        .orderBy("bucket_us", "event_type")
    )


@register(
    "approx_distinct",
    # HLL sketch values are engine-specific, so the gate compares a
    # DETERMINISTIC derivation: exact distinct counts plus a boolean
    # asserting each engine's own HLL estimate is within the 5% error
    # bound.  Hashes match iff both engines' sketches are in-bound and
    # exact counts agree — a meaningful cross-engine check without
    # requiring sketch-for-sketch equality.
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
               / COUNT(DISTINCT user_id) <= 0.05 AS within_bounds
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ops=("beyond:approx-distinct",),
    description="approx_count_distinct (HLL) per event_type vs exact — "
    "sketch aggregation for 100 TB cardinality estimation; gate asserts "
    "the estimate's 5% error bound on both engines",
)
def approx_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_bounds"),
        )
        .orderBy("event_type")
    )


def _banded_lsh_oracle(n_bands: int = 16, band_planes: int = 4,
                       threshold: float = 0.4) -> str:
    """DuckDB SQL mirroring the banded-sign-LSH near-dup semantics exactly:
    same deterministic coordinate-slice sign buckets, pairs colliding in
    ≥1 band, distinct — so the gate checks the distributed plan's real
    output, not an all-pairs computation the scale path avoids."""
    bands = []
    for bi in range(n_bands):
        cases = " || ".join(
            f"CASE WHEN emb[{bi * band_planes + j + 1}] >= 0 "
            "THEN '1' ELSE '0' END"
            for j in range(band_planes)
        )
        bands.append(
            f"SELECT vec_id, emb, {bi} AS band, {cases} AS bucket FROM v"
        )
    union = "\n        UNION ALL ".join(bands)
    return f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    b AS (
        {union}
    )
    SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.emb, b2.emb), 6) AS sim
    FROM b a JOIN b b2
      ON a.band = b2.band AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE ROUND(list_cosine_similarity(a.emb, b2.emb), 6) >= {threshold}
    ORDER BY vec_a, vec_b
    """


@register(
    "dedup_embedding_cosine",
    _banded_lsh_oracle(),
    survey_ops=("beyond:dedup-embedding",),
    description="embedding-cosine near-duplicate pairs (sim >= 0.4) via "
    "LSH sign-bucket candidates + JVM-side cosine — fully distributed, "
    "no driver collect; the dense matmul remains as an opt-in guarded "
    "rerank (cosine_neardup_pairs_dense)",
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.similarity.neardup import cosine_neardup_pairs

    emb = Catalog(spark, sf_dir).embeddings
    return cosine_neardup_pairs(emb, threshold=0.4).orderBy("vec_a", "vec_b")


@register(
    "percentile_summary",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    survey_ops=("beyond:percentiles",),
    description="exact linear-interpolation percentiles per group (quality "
    "gate thresholds: p50/p95/p99 of a measure) — Spark percentile() and "
    "DuckDB quantile_cont share interpolation semantics bit-for-bit",
)
def percentile_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("p50"),
            F.percentile("l_extendedprice", 0.95).alias("p95"),
            F.percentile("l_extendedprice", 0.99).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100
          < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
    ORDER BY doc_id
    """,
    survey_ops=("beyond:stratified-sample",),
    description="deterministic hash-based stratified sampling (class "
    "rebalancing: keep 20% of 'en' docs, 50% of the rest) — membership is "
    "a pure function of the id hash, so reruns, engine swaps, and "
    "incremental appends agree; pure codegen filter",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.sampling import stratified_sample

    d = Catalog(spark, sf_dir).documents
    return (
        stratified_sample(
            d, id_col="doc_id", strata_col="lang",
            rates={"en": 0.2}, default_rate=0.5,
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "sequence_pack",
    """
    SELECT doc_id, n_chars,
           CAST((SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 - n_chars) // 8192 AS BIGINT) AS bin_id
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:sequence-pack",),
    description="sequence packing: contiguous token-budget bin assignment "
    "(bin = exclusive running sum div budget) via the two-phase "
    "distributed prefix sum — range partitions cumsum in parallel, only "
    "per-partition totals hit a global window (the single-partition "
    "Window.orderBy trap avoided)",
)
def sequence_pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.prefix import sequence_pack

    d = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    return (
        sequence_pack(d, order_col="doc_id", tokens_col="n_chars",
                      budget=8192)
        .select("doc_id", "n_chars", "bin_id")
        .orderBy("doc_id")
    )


# fixed mixing weights for the source_mixture gate (docs have sources
# src0..src19; weights cycle 1..5 so rates differ per source)
MIXTURE_WEIGHTS = {f"src{i}": (i % 5) + 1 for i in range(20)}


def _mixture_oracle() -> str:
    w_total = sum(MIXTURE_WEIGHTS.values())
    values = ", ".join(
        f"('{s}', {w})" for s, w in sorted(MIXTURE_WEIGHTS.items())
    )
    return f"""
    WITH w(source, w_s) AS (VALUES {values}),
    n AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
    j AS (SELECT n.source, n_s, w_s FROM n JOIN w USING (source)),
    t AS (SELECT MIN(n_s * {w_total} // w_s) AS t_total FROM j),
    thr AS (
        SELECT source, (t_total * w_s // {w_total}) * 1000000 // n_s AS thr
        FROM j CROSS JOIN t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000 < thr
    ORDER BY doc_id
    """


@register(
    "source_mixture",
    _mixture_oracle(),
    survey_ops=("beyond:source-mixture",),
    description="deterministic source-mixture downsampling (training-data "
    "mixing): largest subset proportional to per-source weights without "
    "upsampling; tiny count agg broadcast back + map-side hash filter — "
    "the corpus never shuffles; exact integer arithmetic end to end",
)
def source_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.sampling import source_mixture

    d = Catalog(spark, sf_dir).documents
    return (
        source_mixture(
            d, id_col="doc_id", source_col="source",
            weights=MIXTURE_WEIGHTS,
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "dataset_split",
    """
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 8)) AS BIGINT) % 1000000
                     < 980000 THEN 'train'
                WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 8)) AS BIGINT) % 1000000
                     < 990000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:dataset-split",),
    description="leakage-safe train/val/test assignment (98/1/1) by hash "
    "range: a document never migrates between splits as the corpus grows "
    "— map-side CASE, no shuffle",
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.sampling import dataset_split

    d = Catalog(spark, sf_dir).documents
    return (
        dataset_split(d, id_col="doc_id")
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@register(
    "group_sample",
    """
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substring(
                       md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1000000000,
                       doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rk <= 10
    ORDER BY doc_id
    """,
    survey_ops=("beyond:group-sample",),
    description="deterministic fixed-size uniform sample per group (10 "
    "docs per language — the fixed eval-slice pattern): hash-order "
    "window rank inside each group, exact size unlike rate sampling",
)
def group_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.sampling import fixed_per_group

    d = Catalog(spark, sf_dir).documents
    return (
        fixed_per_group(d, group_col="lang", id_col="doc_id", n=10)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "shard_assign",
    """
    WITH keyed AS (
        SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS key
        FROM documents
    ),
    sh AS (
        SELECT doc_id, key,
               CAST(CAST(('0x' || substring(key, 1, 8)) AS BIGINT) % 16
                    AS INTEGER) AS shard
        FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM sh
    ORDER BY doc_id
    """,
    survey_ops=("beyond:shard-assign",),
    description="deterministic global shuffle into training shards: "
    "seeded hash bucket + per-shard hash-order rank; one shuffle keyed "
    "on shard, per-shard window sorts run in parallel (no global total "
    "order — that would serialize on one task)",
)
def shard_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.sampling import shard_assign

    d = Catalog(spark, sf_dir).documents
    return (
        shard_assign(d, id_col="doc_id", n_shards=16, seed="42")
        .select(
            "doc_id",
            "shard",
            F.col("pos_in_shard").cast("bigint").alias("pos_in_shard"),
        )
        .orderBy("doc_id")
    )


def _dsir_oracle(n_buckets: int = 512, scale: int = 1_000_000) -> str:
    bigrams = r"""
        SELECT doc_id,
               CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT)
                   % {nb} AS bucket
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i+1])) AS g
            FROM (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS t
                FROM {rel} WHERE length(trim(text)) > 0
            )
            WHERE len(t) >= 2
        )
    """
    return f"""
    WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    tgtd AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
    rg AS ({bigrams.format(rel="rawd", nb=n_buckets)}),
    tg AS ({bigrams.format(rel="tgtd", nb=n_buckets)}),
    tc AS (SELECT bucket, COUNT(*) AS c FROM tg GROUP BY bucket),
    rcnt AS (SELECT bucket, COUNT(*) AS c FROM rg GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM tg) AS tt,
                   (SELECT COUNT(*) FROM rg) AS rt),
    lr AS (
        SELECT rcnt.bucket,
               CAST(FLOOR((ln((COALESCE(tc.c, 0) + 1) * 1.0
                               / (tot.tt + {n_buckets}))
                           - ln((rcnt.c + 1) * 1.0
                               / (tot.rt + {n_buckets})))
                          * {scale} + 0.5) AS BIGINT) AS lr
        FROM rcnt LEFT JOIN tc USING (bucket) CROSS JOIN tot
    ),
    k AS (SELECT doc_id, bucket, COUNT(*) AS k FROM rg GROUP BY 1, 2)
    SELECT k.doc_id,
           CAST(SUM(k.k) AS BIGINT) AS n_grams,
           CAST(SUM(k.k * lr.lr) AS BIGINT) AS logw_scaled
    FROM k JOIN lr USING (bucket)
    GROUP BY k.doc_id
    ORDER BY doc_id
    """


@register(
    "dsir_weight",
    _dsir_oracle(),
    survey_ops=("beyond:dsir",),
    description="DSIR importance weighting (Xie 2023 data-selection): "
    "hashed word-bigram bucket probabilities on target (source=src0) vs "
    "the raw pool, per-doc log importance weight as an EXACT int64 sum "
    "of driver-quantized per-bucket log-ratios (the charlm integer-log "
    "pattern); bucket tables are broadcast-sized by construction, the "
    "corpus shuffles only for its own per-doc aggregation",
)
def dsir_weight_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.selection import dsir_weights

    d = Catalog(spark, sf_dir).documents
    raw = d.filter(F.col("source") != "src0")
    target = d.filter(F.col("source") == "src0")
    return dsir_weights(raw, target, n_buckets=512).orderBy("doc_id")


@register(
    "corpus_profile",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           quantile_cont(length(text), 0.5) AS p50_chars,
           quantile_cont(length(text), 0.95) AS p95_chars,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
                AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    survey_ops=("beyond:corpus-profile",),
    description="per-source corpus profiling (the pre-mixture QA report: "
    "volume, language spread, exact length percentiles, empty rate, token "
    "mass) — one map-side-combined aggregation over the scan; at 100 TB "
    "this is the cheapest query in the pipeline and the first one run",
)
def corpus_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    chars = F.length("text")
    toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(chars).alias("total_chars"),
            F.percentile(chars, 0.5).alias("p50_chars"),
            F.percentile(chars, 0.95).alias("p95_chars"),
            F.sum(F.when(F.trim("text") == "", 1).otherwise(0))
            .cast("long").alias("n_empty"),
            F.sum(toks).cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )


@register(
    "curriculum_order",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                   '[^a-z0-9]+'),
                             x -> x != '')) AS n_tokens
      FROM documents
    ),
    q AS (
      SELECT quantile_cont(n_tokens, 0.25) AS q1,
             quantile_cont(n_tokens, 0.5)  AS q2,
             quantile_cont(n_tokens, 0.75) AS q3
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(1 + (n_tokens > q1)::int + (n_tokens > q2)::int
                  + (n_tokens > q3)::int AS INTEGER) AS tier,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS shuffle_key
    FROM t, q
    ORDER BY tier, shuffle_key, doc_id
    """,
    survey_ops=("beyond:curriculum-order",),
    description="curriculum data ordering (Bengio 2009) as a SORT SPEC, "
    "not a global rank: one scalar percentile aggregate yields the "
    "n_tiers-1 exact difficulty cut points (bit-compatible with DuckDB "
    "quantile_cont), then a map-only projection assigns tier + "
    "deterministic md5 shuffle_key — the shard writer orders by "
    "(tier, shuffle_key); no single-partition window at any scale",
)
def curriculum_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_model import tokens_lower
    from ton_indexer_spark.operators.curriculum import curriculum_order

    d = Catalog(spark, sf_dir).documents
    base = d.select(
        "doc_id",
        F.size(tokens_lower(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return curriculum_order(
        base, F.col("n_tokens"), n_tiers=4, id_col="doc_id"
    ).orderBy("tier", "shuffle_key", "doc_id")


@register(
    "vocab_spectrum",
    """
    WITH wf AS (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
                x -> x != '')) AS word
            FROM documents) GROUP BY 1
    )
    SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM wf GROUP BY freq ORDER BY freq
    """,
    survey_ops=("beyond:vocab-spectrum",),
    description="frequency-of-frequencies vocabulary spectrum (the Zipf "
    "diagnostic corpus linguists and tokenizer trainers read first): two "
    "count-keyed aggregations whose reduce sides are |vocabulary| and "
    "|distinct frequencies| — both Zipf-small at any corpus size",
)
def vocab_spectrum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.functions.quality_model import tokens_lower

    d = Catalog(spark, sf_dir).documents
    wf = (
        d.select(F.explode(tokens_lower(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        wf.groupBy("freq")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("freq").alias("n_occurrences"),
        )
        .orderBy("freq")
    )
