"""Approx-distinct accuracy and salted-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from ton_indexer_spark.queries import all_specs


def test_approx_distinct_error_bound(spark):
    rows = all_specs()["approx_distinct"].builder(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["within_bounds"] is True, r
        assert r["exact_users"] > 0, r


def test_window_operator_matches_integer_bucketing(spark):
    """F.window (the Structured Streaming window operator) produces the same
    hourly buckets as the tz-free integer form used in the gate query —
    valid under the engine's UTC session contract."""
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.functions.timecols import epoch_us

    ev = Catalog(spark, SF_SMALL).events
    ev = ev.withColumn("ts_us", epoch_us(ev, "ts"))
    via_window = (
        ev.withColumn("tsx", F.timestamp_micros("ts_us"))
        .groupBy(F.window("tsx", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("bucket_us"), "n")
    )
    via_int = (
        ev.groupBy(
            (F.col("ts_us") - F.pmod(F.col("ts_us"), F.lit(3600 * 1_000_000))).alias(
                "bucket_us"
            )
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, via_window.collect())) == sorted(
        map(tuple, via_int.collect())
    )


def test_salted_join_matches_plain_join(spark):
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.operators.skew import salted_join

    t = Catalog(spark, SF_SMALL)
    plain = (
        t.lineitem.join(t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li = t.lineitem.withColumnRenamed("l_orderkey", "k")
    od = t.orders.withColumnRenamed("o_orderkey", "k")
    salted = (
        salted_join(li, od, on="k", salt=8)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
