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


def dataset_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (
        ("train", 98), ("val", 1), ("test", 1),
    ),
    buckets: int = 1_000_000,
) -> DataFrame:
    """Assign every row to a named split by hash range (98/1/1 default).

    The standard leakage-safe train/val/test assignment: membership is a
    pure function of the id hash, so (a) a document NEVER migrates
    between splits as the corpus grows — appends land in the same split
    forever, (b) reruns and engines agree, (c) no shuffle — a map-side
    CASE over the hash bucket.  ``splits`` is ordered (name, weight);
    cumulative weight ranges partition [0, buckets).
    """
    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError("dataset_split: weights must be non-negative, sum > 0")
    b = hash_bucket(F.col(id_col), buckets)
    expr = F.lit(splits[-1][0])
    acc = 0
    conds = []
    for name, w in splits[:-1]:
        acc += w
        conds.append((name, acc * buckets // total))
    for name, thr in reversed(conds):
        expr = F.when(b < thr, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def fixed_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
    buckets: int = 1_000_000_000,
) -> DataFrame:
    """Deterministic fixed-size uniform sample of ``n`` rows per group.

    Rank rows inside each group by (hash_bucket(id), id) and keep the
    first ``n`` — a reproducible "random" subset (e.g. a fixed eval slice
    per language).  Unlike rate-based sampling this hits the size
    exactly; the cost is a per-group shuffle + window rank, so it's for
    BOUNDED group counts with modest per-group cardinality — for
    per-group rates over huge skewed groups use ``stratified_sample``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), buckets), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: str = "42",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    The last step of a curation pipeline: scatter documents uniformly
    and REPRODUCIBLY across ``n_shards`` output shards and fix the read
    order inside each (training-data loaders consume shard files
    sequentially, so the in-shard order IS the sample order — it must be
    a pure function of (seed, id), not of partition layout).

    ``shard`` is a seeded hash bucket; ``pos_in_shard`` ranks by the full
    hash digest with the id as tiebreak.  The plan is one hash-partition
    shuffle on ``shard`` plus a per-shard window sort — shards are
    independent, so the sort parallelizes across them (one window
    partition ≙ one output file, the natural `partitionBy("shard")`
    write).  At 100 TB you pick n_shards in the thousands, keeping each
    sort executor-sized; there is deliberately NO global row numbering —
    a total order over the corpus would serialize on one task.
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    from pyspark.sql.window import Window

    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        df.withColumn("_key", key)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w))
        .drop("_key")
    )
