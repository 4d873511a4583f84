"""Curriculum data ordering — quantile-tiered training order.

Curriculum learning (Bengio et al. 2009) feeds training data
easiest-first; large-scale pipelines implement it as a SORT SPEC, not a
materialized global rank: every document gets (tier, shuffle_key) and
the shard writer orders by them.  Materializing a global row number
would force a single-partition window — pointless at 100 TB when the
downstream writer sorts anyway.

Plan shape:
  1. one scalar aggregate computes the n_tiers-1 exact difficulty
     thresholds (``F.percentile`` — linear-interpolation quantiles,
     bit-compatible with DuckDB ``quantile_cont``, proven by the
     percentile_summary gate), collected to the driver: a bounded,
     (n_tiers-1)-sized collect;
  2. a map-only projection assigns tier = 1 + #(thresholds < difficulty)
     and shuffle_key = md5(id) (the engine's portable-hash idiom) —
     deterministic within-tier shuffling with zero data movement.

Quantile tiers (equal-population up to interpolation) rather than NTILE
so step 2 needs no global sort: the thresholds broadcast as literals.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def difficulty_thresholds(
    df: DataFrame, difficulty: Column, n_tiers: int
) -> list[float]:
    """Exact interpolated quantile cut points (n_tiers - 1 doubles)."""
    if n_tiers < 2:
        return []
    fracs = [i / n_tiers for i in range(1, n_tiers)]
    row = df.agg(
        F.percentile(difficulty, F.array([F.lit(f) for f in fracs])).alias("t")
    ).first()
    if row["t"] is None:  # empty input: everything lands in tier 1
        return []
    return [float(x) for x in row["t"]]


def curriculum_order(
    df: DataFrame,
    difficulty: Column,
    n_tiers: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append curriculum columns: ``tier`` (1 = easiest quantile bucket)
    and ``shuffle_key`` (deterministic within-tier order).  Training
    order is ``ORDER BY tier, shuffle_key, id`` — a sort spec the shard
    writer applies; no global rank is materialized."""
    ts = difficulty_thresholds(df, difficulty, n_tiers)
    tier = reduce(
        lambda acc, t: acc
        + F.when(difficulty > F.lit(t), 1).otherwise(0),
        ts,
        F.lit(1),
    )
    return df.withColumn("tier", tier.cast("int")).withColumn(
        "shuffle_key", F.substring(F.md5(F.col(id_col).cast("string")), 1, 16)
    )
