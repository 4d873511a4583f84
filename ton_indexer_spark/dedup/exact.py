"""Exact deduplication: hash-groupBy on the normalized-content fingerprint.

One shuffle on the digest; keeps the min-id representative and the duplicate
count.  At 100 TB the fingerprint column is computed at ingest and the
groupBy benefits from partial (map-side) aggregation — the dominant cost is
the scan, as it should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.functions.text import fingerprint


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return (fingerprint, keep_id, n_dups) — one row per distinct content."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
