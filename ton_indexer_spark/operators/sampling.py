"""Deterministic hash-based sampling — training-data pipeline operator.

``TABLESAMPLE``/``df.sample`` are seed-dependent and engine-specific; a
data pipeline needs samples that are (a) reproducible across runs and
engines, (b) stable under re-partitioning, and (c) stratified — class
rebalancing downsamples over-represented strata (e.g. languages) at
per-stratum rates.  Keying the decision on a content hash of the row id
gives all three: membership is a pure function of the id, so reruns,
engine swaps, and incremental appends all agree.

Hash: first 8 hex chars of md5(id) as an integer, mod ``buckets`` — both
Spark and DuckDB compute the identical bucket, which is what makes the
gate oracle-checkable.  Everything is a column expression inside
whole-stage codegen; sampling is a pure filter, so it composes with scan
pushdown (the filter itself can't push below the scan — it reads only
the id column — but column pruning still applies).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, buckets)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    buckets: int = 100,
) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate(stratum)·buckets.

    ``rates`` maps stratum value → keep fraction (0..1); unlisted strata
    use ``default_rate``.  Rates are quantized to 1/buckets.
    """
    threshold = F.lit(int(round(default_rate * buckets)))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * buckets)))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(id_col), buckets) < threshold)
