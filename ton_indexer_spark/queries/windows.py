"""Window-operator queries (SURVEY.md §2.5 W1-W4, §2.8 sessionization analog)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.functions.timecols import epoch_us
from ton_indexer_spark.operators import (
    first_per_group,
    latest_by,
    ordered_collect,
    sessionize_by_gap,
    with_prev_pointer,
)
from ton_indexer_spark.queries import register


@register(
    "first_per_group",
    """
    SELECT c_nationkey AS nationkey, c_custkey AS custkey, c_acctbal AS acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    ) WHERE rn = 1
    ORDER BY nationkey
    """,
    survey_ops=("W1", "A3"),
    description="DISTINCT ON / first-row-per-group (shortest-domain rule, "
    "crud.go:297-300)",
)
def first_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return (
        first_per_group(c, ["c_nationkey"], [("c_acctbal", "desc"), ("c_custkey", "asc")])
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("nationkey")
    )


@register(
    "latest_state",
    """
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    survey_ops=("W2",),
    description="last-writer-wins latest-state view (latest_account_states "
    "semantics, InsertManagerPostgres.cpp:1019-1460 / ReplacingMergeTree)",
)
def latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        latest_by(ev, ["user_id"], "ts", tiebreakers=["event_id"])
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "prev_pointer",
    """
    SELECT event_id, user_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event_id
    FROM events
    ORDER BY user_id, event_id
    """,
    survey_ops=("W3",),
    description="precomputed lag() prev-pointers (prev_trans_hash/lt, "
    "migrate.cpp:170-171)",
)
def prev_pointer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        with_prev_pointer(ev, ["user_id"], [("ts", "asc"), ("event_id", "asc")], ["event_id"])
        .select("event_id", "user_id", "prev_event_id")
        .orderBy("user_id", "event_id")
    )


@register(
    "ordered_collect",
    """
    SELECT l_orderkey,
           string_agg(l_linenumber || ':' || l_partkey, ','
                      ORDER BY l_linenumber, l_partkey) AS line_sig
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    survey_ops=("W4", "O3"),
    description="ordered within-group assembly (trace tx-tree assembly, "
    "crud_traces.go:389-420; out-msg sort crud_transactions.go:251-261)",
)
def ordered_collect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    collected = ordered_collect(
        li, ["l_orderkey"], ["l_linenumber"], ["l_partkey"], out_col="items"
    )
    return (
        collected.select(
            "l_orderkey",
            F.array_join(
                F.transform(
                    F.col("items"),
                    lambda x: F.concat_ws(":", x["l_linenumber"].cast("string"),
                                          x["l_partkey"].cast("string")),
                ),
                ",",
            ).alias("line_sig"),
        )
        .orderBy("l_orderkey")
    )


GAP_US = 1800 * 1_000_000  # 30 min in epoch-micros (catalog ts convention)


@register(
    "sessionize",
    f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_seq,
               ts
        FROM flagged
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    survey_ops=("T2-analog", "W3"),
    description="gap-based sessionization (30 min) — the window-algebra "
    "sibling of causal trace sessionization (TraceAssembler.cpp:285-412)",
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    sess = sessionize_by_gap(ev, "user_id", "ts", GAP_US, tiebreakers=["event_id"])
    sess = sess.withColumn("_ts_us", epoch_us(sess, "ts"))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_ts_us").alias("start_us"),
            F.max("_ts_us").alias("end_us"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "asof_join",
    f"""
    WITH l AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               event_id AS view_event_id, value AS view_value
        FROM events WHERE event_type = 'view'
    ),
    u AS (
        SELECT event_id, user_id, ts_us, 1 AS side,
               CAST(NULL AS BIGINT) AS r_ts,
               CAST(NULL AS BIGINT) AS r_view_event_id,
               CAST(NULL AS DOUBLE) AS r_view_value
        FROM l
        UNION ALL
        SELECT event_id, user_id, ts_us, 0, ts_us,
               view_event_id, view_value
        FROM r
    ),
    filled AS (
        SELECT event_id, user_id, ts_us, side,
               LAST_VALUE(r_ts IGNORE NULLS) OVER w AS asof_ts,
               LAST_VALUE(r_view_event_id IGNORE NULLS) OVER w
                   AS asof_view_event_id,
               LAST_VALUE(r_view_value IGNORE NULLS) OVER w
                   AS asof_view_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, ts_us, asof_ts, asof_view_event_id,
           asof_view_value
    FROM filled WHERE side = 1
    ORDER BY user_id, ts_us, event_id
    """,
    survey_ops=("beyond:asof-join",),
    description="as-of (point-in-time) join: each purchase matched to the "
    "user's latest at-or-before view event — union+running-last window, "
    "ONE shuffle on the key, no range-join pair explosion (the operator "
    "the reference sidesteps via latest_account_states materialization)",
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.asof import asof_join_backward

    ev = Catalog(spark, sf_dir).events
    ev = ev.withColumn("ts_us", epoch_us(ev, "ts"))
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return (
        asof_join_backward(
            left, right, by=["user_id"], ts_col="ts_us",
            value_cols=["view_event_id", "view_value"], seq_col="event_id",
        )
        .select(
            "event_id", "user_id", "ts_us", "asof_ts",
            "asof_view_event_id", "asof_view_value",
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


_FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_steps",
    """
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e
           JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e
           JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
    SELECT 1 AS step_idx, 'view' AS step,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    ORDER BY step_idx
    """,
    survey_ops=("beyond:funnel",),
    description="ordered funnel analysis (view -> click -> purchase): "
    "each stage is a per-user MIN over events strictly after the prior "
    "stage's first hit — stage joins shuffle on user_id only, counts "
    "are scalar aggs; exact integer time comparisons via epoch micros",
)
def funnel_steps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "user_id", "event_type", epoch_us(ev, "ts").alias("ts_us")
    )
    prev = None
    out = None
    for idx, stage in enumerate(_FUNNEL_STAGES, start=1):
        cur = e.filter(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                F.col("ts_us") > F.col("_t")
            )
        cur = cur.groupBy("user_id").agg(F.min("ts_us").alias("_t"))
        row = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("step_idx"),
            F.lit(stage).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
        prev = cur
    return out.orderBy("step_idx")


_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "cohort_retention",
    f"""
    WITH e AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week
        FROM events
    ),
    first AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1)
    SELECT cohort_week, week - cohort_week AS week_offset,
           COUNT(*) AS n_users
    FROM e JOIN first USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
    survey_ops=("beyond:retention",),
    description="cohort retention matrix: cohort = first-seen week "
    "(integer epoch-week arithmetic, engine-exact), offsets from the "
    "distinct (user, week) activity set — two user-keyed shuffles plus "
    "a cohort-sized agg; the classic growth-analytics rollup",
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    e = (
        ev.select(
            "user_id",
            # integer `div`, matching DuckDB's `//` exactly (a double
            # divide + cast can disagree at exact week boundaries)
            epoch_us(ev, "ts").alias("_us"),
        )
        .select(
            "user_id", F.expr(f"_us div {_WEEK_US}").alias("week")
        )
        .distinct()
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "group_topk",
    """
    SELECT nationkey, rk, custkey, acctbal
    FROM (
        SELECT c_nationkey AS nationkey, c_custkey AS custkey,
               c_acctbal AS acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal DESC,
                                                c_custkey ASC) AS INTEGER)
                   AS rk
        FROM customer
    ) WHERE rk <= 3
    ORDER BY nationkey, rk
    """,
    survey_ops=("beyond:group-topk",),
    description="value-ranked top-3 per group (the N>1 DISTINCT ON "
    "generalization): one shuffle on the group key, per-group window "
    "rank — the per-group limit means no global TakeOrdered applies",
)
def group_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.windows import top_per_group

    c = Catalog(spark, sf_dir).customer
    return (
        top_per_group(
            c, ["c_nationkey"],
            [("c_acctbal", "desc"), ("c_custkey", "asc")],
            n=3, rank_col="rk",
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("rk"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("nationkey", "rk")
    )
