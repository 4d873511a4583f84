"""spread_small / adaptive_partitions — the scale-adaptive partitioning
guards (operators/spread.py).

The round-12 optimization replaced the physical-plan probe
(df.rdd.getNumPartitions(), a full plan compile per builder call) with
an optimizer-statistics estimate that replays Spark's file-split sizing.
These tests pin the DECISIONS, which must be unchanged: spread on tiny
file-backed inputs, identity once the estimated scan task count reaches
the session parallelism, graceful fallback for sources without
statistics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _has_roundrobin(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "RoundRobinPartitioning" in plan or "roundrobinpartitioning" in plan


def test_spread_fires_on_tiny_file_scan(spark):
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.operators.spread import (
        _est_scan_partitions,
        spread_small,
    )

    d = Catalog(spark, SF_SMALL).documents
    est = _est_scan_partitions(d)
    assert est == 1  # sub-openCost parquet is one scan split
    out = spread_small(d)
    assert _has_roundrobin(out)
    # the spread is a repartition, not a semantic change
    assert out.count() == d.count()


def test_spread_identity_when_est_meets_target(spark):
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.operators.spread import spread_small

    d = Catalog(spark, SF_SMALL).documents
    # min_parts=1: the 1-split scan already meets the target
    out = spread_small(d, min_parts=1)
    assert out is d


def test_est_split_formula_tracks_spark_split_sizing(spark):
    """The byte->task estimate must replay FilePartition.maxSplitBytes:
    tiny inputs -> 1, inputs past ~minParts*openCost -> >= parallelism
    (identity at scale, no spurious mid-scale shuffle)."""
    par = spark.sparkContext.defaultParallelism
    open_cost = 4 * 1024 * 1024
    max_pb = int(
        spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )

    def est(size: int) -> int:
        ms = min(max_pb, max(open_cost, size // max(par, 1)))
        return max(1, -(-size // ms))

    assert est(600_000) == 1
    # once bytes/parallelism clears the open-cost floor, the estimate
    # saturates at >= parallelism — spread must NOT fire mid-scale
    assert est(par * open_cost + 1) >= par
    assert est(100 * (1 << 40)) >= par  # 100 TB: identity


def test_spread_falls_back_for_sources_without_stats(spark):
    from ton_indexer_spark.operators.spread import (
        _est_scan_partitions,
        spread_small,
    )

    rdd_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(i,) for i in range(10)], 2),
        "x long",
    )
    assert _est_scan_partitions(rdd_df) is None  # LogicalRDD: no stats
    out = spread_small(rdd_df)  # falls back to the physical probe
    assert out.count() == 10


def test_adaptive_partitions_bounds(spark):
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.operators.spread import adaptive_partitions

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = Catalog(spark, SF_SMALL).documents
    assert adaptive_partitions(d) == 1  # tiny input -> 1 partition
    assert 1 <= adaptive_partitions(d, per_partition_bytes=1024) <= cap
    # unknown stats (RDD source) -> session default, never fewer
    rdd_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(1,)], 1), "x long"
    )
    assert adaptive_partitions(rdd_df) == cap
