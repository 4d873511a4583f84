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


def source_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: Mapping[str, int],
    buckets: int = 1_000_000,
) -> DataFrame:
    """Downsample to the largest corpus matching a target source mixture.

    Training-data mixing: given integer ``weights`` per source (e.g.
    web:6, books:2, code:1 — the mixture ratios every pretraining recipe
    publishes), keep the largest subset whose per-source composition is
    proportional to the weights, without upsampling any source.  With
    ``W = Σ weights`` and per-source counts ``n_s``, the feasible total is
    ``T = min_s floor(n_s · W / w_s)`` and the per-source target is
    ``t_s = floor(T · w_s / W) ≤ n_s``.

    Membership is the same engine-portable hash filter as
    ``stratified_sample`` — ``hash_bucket(id) < floor(t_s · buckets /
    n_s)`` — so the sample is reproducible across runs, engines, and
    repartitioning, and the whole operator is exact integer arithmetic
    (oracle hash-matches).  Sources absent from ``weights`` are dropped
    (weight 0).

    Scale shape: one tiny per-source count aggregation (|sources| rows —
    broadcast back), then a map-side filter on the big table; no shuffle
    of the corpus, no skew sensitivity (the filter is per-row, not a
    per-source window rank).
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("source_mixture: weights must be positive integers")
    w_total = sum(weights.values())
    wcol = F.lit(None).cast("long")
    for value, w in sorted(weights.items()):
        wcol = F.when(F.col(source_col) == value, F.lit(int(w))).otherwise(
            wcol
        )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n_s"))
        .withColumn("_w_s", wcol)
        .filter(F.col("_w_s").isNotNull())
    )
    feasible = counts.agg(
        F.min(F.expr(f"_n_s * {w_total} DIV _w_s")).alias("_t_total")
    )
    thresholds = (
        counts.crossJoin(F.broadcast(feasible))  # 1 row
        .withColumn("_t_s", F.expr(f"_t_total * _w_s DIV {w_total}"))
        .withColumn("_thr", F.expr(f"_t_s * {buckets} DIV _n_s"))
        .select(source_col, "_thr")
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(hash_bucket(F.col(id_col), buckets) < F.col("_thr"))
        .drop("_thr")
    )
