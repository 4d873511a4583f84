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


def test_asof_join_tolerance_and_exact_match(spark):
    """Backward as-of semantics: exact-ts right rows match; tolerance
    nulls stale matches; no-prior-row yields nulls."""
    from ton_indexer_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 90), (4, 20, 500)],
        "event_id long, user_id long, ts_us long",
    )
    right = spark.createDataFrame(
        [(101, 10, 100, 1.0), (102, 10, 200, 2.0), (103, 30, 50, 9.0)],
        "event_id long, user_id long, ts_us long, v double",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join_backward(
            left, right, by=["user_id"], ts_col="ts_us",
            value_cols=["v"], seq_col="event_id",
        ).collect()
    }
    assert got[1] == (100, 1.0)   # exact-ts match allowed
    assert got[2] == (200, 2.0)   # latest at-or-before
    assert got[3] == (None, None) # earliest right row (ts 100) is after 90
    assert got[4] == (None, None) # user 20 has no right rows

    # tolerance: match older than ts - 50 is nulled
    got_tol = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join_backward(
            left, right, by=["user_id"], ts_col="ts_us",
            value_cols=["v"], seq_col="event_id", tolerance=4,
        ).collect()
    }
    assert got_tol[1] == (100, 1.0)   # staleness 0 <= 4
    assert got_tol[2] == (None, None) # staleness 5 > 4


def test_global_running_sum_partition_invariant(spark):
    """The two-phase prefix sum must give identical results for any
    partition count (range-boundary placement is an implementation
    detail, not a semantic input)."""
    from ton_indexer_spark.operators.prefix import global_running_sum

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 37 + 1).alias("v")
    )
    a = {r["id"]: r["s"] for r in global_running_sum(
        df, "id", "v", "s", n_partitions=3).collect()}
    b = {r["id"]: r["s"] for r in global_running_sum(
        df, "id", "v", "s", n_partitions=17).collect()}
    assert a == b
    # spot-check against the closed form at the tail
    assert a[999] == sum(i % 37 + 1 for i in range(1000))


def test_global_running_sum_exact_at_sampling_scale(spark):
    """Regression for the sf1 sweep bug: the old spark_partition_id()
    formulation silently corrupted offsets once the input outgrew the
    range sampler's exact window (~50k keys at 16 partitions), because
    the totals branch and the join branch could re-sample DIFFERENT
    boundaries.  Bucket ids are now a deterministic function of the key;
    this pins exactness at a size where the old code measurably broke."""
    from ton_indexer_spark.operators.prefix import global_running_sum

    n = 60_000
    # non-contiguous, non-uniform keys (squares mod a prime, unique-ified
    # by construction over a doubled range) and signed values
    df = spark.range(0, n).select(
        (F.col("id") * 7919 + (F.col("id") * F.col("id")) % 104729)
        .alias("k"),
        (F.when(F.col("id") % 3 == 0, -1).otherwise(2)
         * (F.col("id") % 211 + 1)).alias("v"),
    ).groupBy("k").agg(F.sum("v").alias("v"))
    out = global_running_sum(df, "k", "v", "s", n_partitions=16).toPandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["s"] == out["v"].cumsum()).all()


def test_connected_components_local_matches_distributed(spark):
    """Size-gated single-task union-find ≡ distributed hash-min +
    pointer-jump loop, including chains (worst diameter), rings, stars,
    and isolated pairs."""
    import random

    from ton_indexer_spark.operators.graph import connected_components

    rng = random.Random(11)
    rows = []
    nid = 0
    for comp in range(30):
        kind = comp % 3
        size = rng.randint(2, 60)
        ids = [f"v{nid + i:05d}" for i in range(size)]
        nid += size
        if kind == 0:  # chain
            rows += list(zip(ids, ids[1:]))
        elif kind == 1:  # ring
            rows += list(zip(ids, ids[1:] + ids[:1]))
        else:  # star
            rows += [(ids[0], x) for x in ids[1:]]
    rng.shuffle(rows)
    edges = spark.createDataFrame(rows, "src string, dst string")

    local = connected_components(edges)
    dist = connected_components(edges, local_threshold=0)
    a = sorted(map(tuple, local.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b
    # min-label contract: every component labeled by its smallest node id
    comp_of = dict(a)
    by_comp: dict[str, list[str]] = {}
    for n, c in a:
        by_comp.setdefault(c, []).append(n)
    assert all(min(members) == c for c, members in by_comp.items())
