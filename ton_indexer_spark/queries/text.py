"""Text-analysis gate queries over `documents` (training-data pipeline ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    lang_predict,
    lang_scores,
    quality_features,
    token_count,
    wordpiece_count,
)
from ton_indexer_spark.queries import register


def _marker_sql(markers: tuple[str, ...]) -> str:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


@register(
    "token_count",
    r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
               AS n_wordpieces
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:tokenize",),
    description="whitespace + BPE-ish wordpiece token counting",
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        wordpiece_count(F.col("text")).cast("bigint").alias("n_wordpieces"),
    ).orderBy("doc_id")


_EN = _marker_sql(LANG_MARKERS["en"])

@register(
    "text_quality",
    rf"""
    SELECT doc_id,
           length(text) AS n_chars,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST({_EN} AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
             AS stopword_ratio,
           CAST(length(text) AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
             AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:quality",),
    description="document quality features: length, punct ratio, stopword "
    "ratio, mean token length",
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    score = {lang: _marker_sql(m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(score)  # alphabetical priority on ties (matches Spark impl)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s.{lang} >= s.{other}" for other in langs[i + 1 :]]
        cond = " AND ".join(conds) if conds else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = " ".join(cases)
    greatest = ", ".join(f"s.{lang}" for lang in langs)
    scores_sql = ", ".join(f"{sql} AS {lang}" for lang, sql in score.items())
    return f"""
    WITH s AS (SELECT doc_id, lang AS lang_label, {scores_sql} FROM documents)
    SELECT doc_id, lang_label,
           CASE WHEN greatest({greatest}) <= 0 THEN 'und' {case_sql} END AS lang_pred
    FROM s
    ORDER BY doc_id
    """


@register(
    "lang_id",
    _langid_oracle(),
    survey_ops=("beyond:langid",),
    description="stopword-marker language-ID heuristic (argmax with "
    "alphabetical tiebreak)",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        lang_predict(F.col("text")).alias("lang_pred"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops=("beyond:fingerprint", "F1"),
    description="content fingerprint over normalized text (md5 — portable "
    "across engines)",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint")).orderBy(
        "doc_id"
    )
