"""Core relational query shapes (SURVEY.md §2.2-2.4, §2.6-2.7).

Each query re-expresses a reference endpoint's plan shape over the driver's
TPC-H-ish tables; the cited crud_*.go lines are the shape being mirrored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import (
    filter_by_array,
    filter_range,
    inout_pivot,
    paginate,
    top_k,
)
from ton_indexer_spark.queries import register

# lineitem/orders timestamps are milli-precision parquet timestamps — exact
# in both engines — so plain timestamp literals are safe here (events.ts is
# the nano-precision column normalized to micros by the catalog).
TS_LO = "1995-01-01 00:00:00"
TS_HI = "1996-12-31 23:59:59"
TS_Q1 = "1998-09-02 00:00:00"  # TPC-H Q1 cutoff


def _ntz(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _dec_sum(col, alias: str, scale: int = 2):
    """Order-independent exact sum of a double measure → DOUBLE."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


@register(
    "filter_sort_page",
    f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag, l_quantity,
           epoch_us(l_shipdate) AS ship_us
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '{TS_LO}' AND l_shipdate <= TIMESTAMP '{TS_HI}'
    ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
    survey_ops=("P2", "P3", "O1", "O2"),
    description="transactions-by-account shape: IN + range filter, total-order "
    "sort with tiebreakers, page limit (crud_transactions.go:56-113)",
)
def filter_sort_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    df = filter_by_array(li, "l_returnflag", ["R", "A"])
    df = filter_range(df, "l_shipdate", _ntz(TS_LO), _ntz(TS_HI))
    df = df.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_returnflag",
        "l_quantity",
        # epoch-micros BIGINT, not a raw timestamp: engines materialize
        # timestamps at different arrow precisions (ns vs us), which a
        # byte-level value hash would see as different values.  Pure NTZ
        # difference — immune to the driver session's timezone.
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "l_shipdate)"
        ).alias("ship_us"),
    )
    return paginate(
        df,
        sort=[("ship_us", "desc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
        limit=100,
    )


@register(
    "group_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{TS_Q1}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    survey_ops=("A5", "A7", "P3"),
    description="TPC-H Q1 shape: partial-aggregable group-by with exact "
    "decimal measures (balance-change aggregation analog, balances.go:147-349)",
)
def group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= _ntz(TS_Q1))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "join_enrich",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation_name ASC
    """,
    survey_ops=("J1", "J3", "J4", "P2"),
    description="multi-way dim-enrichment join with broadcast dims "
    "(address-book enrichment analog, crud.go:228-346)",
)
def join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    df = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            t.lineitem["l_orderkey"] == t.orders["o_orderkey"],
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation_name").asc())
    )
    return df


@register(
    "semi_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c.c_custkey
    LIMIT 200
    """,
    survey_ops=("J7",),
    description="EXISTS semi-join, the reference's deliberate no-duplication "
    "rewrite (crud_traces.go:59-98)",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    hot = t.orders.filter(F.col("o_totalprice") > 100000)
    return (
        t.customer.join(hot, t.customer["c_custkey"] == hot["o_custkey"], "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(200)
    )


@register(
    "anti_join",
    """
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    ORDER BY p.p_partkey
    """,
    survey_ops=("J7", "P4"),
    description="NOT EXISTS anti-join (never-referenced dimension rows)",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.part.join(t.lineitem, t.part["p_partkey"] == t.lineitem["l_partkey"], "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "inout_pivot",
    """
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click' THEN value END) AS click_value,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_value,
           MAX(CASE WHEN event_type = 'click' THEN event_id END) AS click_event_id,
           MAX(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase_event_id
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    survey_ops=("A1",),
    description="in/out message-pair fold: conditional max per tag "
    "(crud_messages.go:25-29)",
)
def inout_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        inout_pivot(
            ev,
            group_by=["user_id"],
            tag_col="event_type",
            tag_values=["click", "purchase"],
            payload_cols=["value", "event_id"],
        )
        .orderBy("user_id")
    )


@register(
    "self_join_adjacent",
    """
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b,
           a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    ORDER BY a.l_orderkey, a.l_linenumber
    """,
    survey_ops=("J2",),
    description="adjacent-rows self-join: equi key + residual predicate "
    "(adjacent transactions via msg_hash, crud_transactions.go:270-274)",
)
def self_join_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("line_a"),
            F.col("b.l_linenumber").alias("line_b"),
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .orderBy("l_orderkey", "line_a")
    )


@register(
    "union_meta",
    """
    SELECT 'customer' AS entity_type, c.c_custkey AS entity_key, c.c_name AS name,
           n.n_name AS nation_name
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'supplier', s.s_suppkey, s.s_name, n.n_name
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'part', p.p_partkey, p.p_name, NULL
    FROM part p
    """,
    survey_ops=("U1", "J5"),
    description="3-branch UNION ALL with per-branch left joins "
    "(metadata union, crud.go:101-110)",
)
def union_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    n = F.broadcast(t.nation)
    cust = (
        t.customer.join(n, t.customer["c_nationkey"] == n["n_nationkey"], "left")
        .select(
            F.lit("customer").alias("entity_type"),
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation_name"),
        )
    )
    supp = (
        t.supplier.join(n, t.supplier["s_nationkey"] == n["n_nationkey"], "left")
        .select(
            F.lit("supplier").alias("entity_type"),
            F.col("s_suppkey").alias("entity_key"),
            F.col("s_name").alias("name"),
            F.col("n_name").alias("nation_name"),
        )
    )
    part = t.part.select(
        F.lit("part").alias("entity_type"),
        F.col("p_partkey").alias("entity_key"),
        F.col("p_name").alias("name"),
        F.lit(None).cast("string").alias("nation_name"),
    )
    return cust.unionByName(supp).unionByName(part)


@register(
    "array_membership_join",
    """
    WITH cust_orders AS (
        SELECT o_custkey, list_sort(list(o_orderkey)) AS orderkeys
        FROM orders GROUP BY o_custkey
    ),
    hot AS (
        SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    )
    SELECT c.o_custkey AS custkey, h.o_orderkey AS orderkey
    FROM cust_orders c, hot h
    WHERE list_contains(c.orderkeys, h.o_orderkey)
    ORDER BY custkey, orderkey
    """,
    survey_ops=("J8", "P6"),
    description="array-membership join: tx_hashes @> array[hash] analog "
    "(crud_actions_v2.go:352-363); scale path is write-time pre-explode "
    "(action_accounts pattern)",
)
def array_membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cust_orders = t.orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("orderkeys")
    )
    hot = top_k(t.orders, "o_totalprice", 20, tiebreakers=["o_orderkey"]).select(
        "o_orderkey"
    )
    return (
        cust_orders.join(
            F.broadcast(hot), F.array_contains(F.col("orderkeys"), F.col("o_orderkey"))
        )
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey"))
        .orderBy("custkey", "orderkey")
    )


@register(
    "top_k",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 100
    """,
    survey_ops=("A4",),
    description="top-K by measure → TakeOrderedAndProject "
    "(top accounts by balance, crud_accounts.go:223)",
)
def top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return top_k(c, "c_acctbal", 100, tiebreakers=["c_custkey"]).select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "coalesce_filter",
    """
    WITH spent AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_acctbal, COALESCE(s.total_spent, 0.0) AS total_spent
    FROM customer c LEFT JOIN spent s ON c.c_custkey = s.o_custkey
    WHERE c.c_acctbal + COALESCE(s.total_spent, 0.0) > 200000
    ORDER BY c.c_custkey
    """,
    survey_ops=("J12", "F4"),
    description="left join + coalesce-expression filter (mintless balance, "
    "crud_jettons.go:56-104)",
)
def coalesce_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    spent = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spent")
    )
    return (
        t.customer.join(spent, t.customer["c_custkey"] == spent["o_custkey"], "left")
        .withColumn("total_spent", F.coalesce(F.col("total_spent"), F.lit(0.0)))
        .filter(F.col("c_acctbal") + F.col("total_spent") > 200000)
        .select("c_custkey", "c_acctbal", "total_spent")
        .orderBy("c_custkey")
    )


@register(
    "distinct_pairs",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    survey_ops=("A2",),
    description="DISTINCT projection (crud_transactions.go:474-479)",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).events.select("user_id", "event_type").distinct()


@register(
    "scalar_agg",
    """
    SELECT COUNT(*) AS n_rows,
           MAX(l_orderkey) AS max_orderkey,
           MIN(l_orderkey) AS min_orderkey,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    """,
    survey_ops=("A5", "A6"),
    description="scalar max/count probe (pg-batch-query/main.go:22)",
)
def scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "offset_page",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderdate ASC, o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
    survey_ops=("O1", "O2"),
    description="limit/offset page 3 with pinned total order (crud.go:31-50)",
)
def offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return paginate(
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
        sort=[("o_orderdate", "asc"), ("o_orderkey", "asc")],
        limit=50,
        offset=100,
    ).drop("o_orderdate")


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    survey_ops=("beyond:rollup",),
    description="ROLLUP grouping sets (beyond-reference; SURVEY §2.4 absent row)",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_dec_sum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "set_ops",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    survey_ops=("beyond:set-ops",),
    description="INTERSECT + EXCEPT (SURVEY §2.7 'available natively'): "
    "positive-balance customers with at least one order and none in "
    "status F — Catalyst plans both as hash semi/anti joins",
)
def set_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pos = cat.customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    ordered = cat.orders.select(F.col("o_custkey").alias("custkey"))
    final = cat.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return pos.intersect(ordered).exceptAll(final.distinct()).orderBy("custkey")
