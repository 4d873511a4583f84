"""Curriculum ordering unit tests (gate parity in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ton_indexer_spark.operators.curriculum import (
    curriculum_order,
    difficulty_thresholds,
)


def _mk(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 40).alias("diff")
    )


def test_thresholds_are_exact_quantiles(spark):
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("d")
    )
    # quantile_cont over 0..4 at 1/4, 2/4, 3/4 -> 1.0, 2.0, 3.0
    assert difficulty_thresholds(df, F.col("d"), 4) == [1.0, 2.0, 3.0]
    assert difficulty_thresholds(df, F.col("d"), 1) == []


def test_tiers_are_balanced_and_monotone(spark):
    df = curriculum_order(_mk(spark), F.col("diff"), n_tiers=4)
    rows = df.collect()
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r["diff"])
    assert sorted(by_tier) == [1, 2, 3, 4]
    # monotone: every difficulty in tier k <= every difficulty in tier k+1
    for k in (1, 2, 3):
        assert max(by_tier[k]) <= min(by_tier[k + 1])
    # quantile tiers on a uniform distribution are near-balanced
    sizes = [len(v) for v in by_tier.values()]
    assert max(sizes) - min(sizes) <= 10


def test_assignment_is_map_only_given_thresholds(spark):
    # after the scalar percentile agg, tier+shuffle_key assignment must
    # add no Exchange: the plan of the output minus the agg is a projection
    df = curriculum_order(_mk(spark), F.col("diff"), n_tiers=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_key_is_deterministic(spark):
    a = curriculum_order(_mk(spark), F.col("diff"), 4).collect()
    b = curriculum_order(_mk(spark), F.col("diff"), 4).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
