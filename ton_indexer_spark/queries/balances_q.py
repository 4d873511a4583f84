"""Per-trace balance-changes driver gate (SURVEY §2.4 A7 / §2.10 C7).

The reference computes TON + jetton deltas per account with a per-trace
BFS at API time (ton-index-go/index/crud/balances.go:147-349); the engine
re-expresses it as one union + one groupBy (operators/balances.py).  This
gate hydrates a multi-hop fixture trace — a jetton transfer chain with
fees on every hop plus a plain TON 2-hop — and checks both operators
against a DuckDB oracle that recomputes the grouped SUMs from the same
rows (a computing oracle, not a hardcoded VALUES result)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.queries import register

# (hash, account, total_fees, trace_id)
_TXS = [
    ("a", "0:USER", 5, "bt1"),
    ("b", "0:JWU", 3, "bt1"),
    ("c", "0:JWR", 2, "bt1"),
    ("d", "0:ROUTER", 4, "bt1"),
    ("e", "0:P", 7, "bt2"),
    ("f", "0:Q", 1, "bt2"),
]

# (tx_hash, direction, value, trace_id) — each internal message appears
# twice (out at the producer, in at the consumer), the store's shape;
# external-in rows carry NULL value and must not contribute
_MSGS = [
    ("a", "in", None, "bt1"),      # external in
    ("a", "out", 100, "bt1"),      # USER -> JWU
    ("b", "in", 100, "bt1"),
    ("b", "out", 80, "bt1"),       # JWU -> JWR
    ("c", "in", 80, "bt1"),
    ("c", "out", 60, "bt1"),       # JWR -> ROUTER
    ("d", "in", 60, "bt1"),
    ("e", "in", None, "bt2"),      # external in
    ("e", "out", 500, "bt2"),      # P -> Q
    ("f", "in", 500, "bt2"),
]

# (trace_id, source, destination, jetton_master_address, amount) —
# the second row's NULL destination exercises the owner-unknown filter
# (balances.go:303-306 skips unresolvable receivers)
_JTS = [
    ("bt1", "0:USER", "0:RECV", "0:JMASTER", 1200),
    ("bt1", "0:RECV", None, "0:JMASTER", 50),
]


def _sql_rows(rows) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


_ORACLE = f"""
WITH t(hash, account, total_fees, trace_id) AS (VALUES {_sql_rows(_TXS)}),
m(tx_hash, direction, value, trace_id) AS (VALUES {_sql_rows(_MSGS)}),
jt(trace_id, source, destination, jetton_master, amount)
    AS (VALUES {_sql_rows(_JTS)}),
ton AS (
    SELECT m.trace_id, t.account,
           CASE WHEN m.direction = 'in' THEN m.value ELSE -m.value END
               AS delta,
           0 AS fees
    FROM m JOIN t ON m.tx_hash = t.hash
    WHERE m.value IS NOT NULL
    UNION ALL
    SELECT trace_id, account, 0, total_fees FROM t
),
ton_g AS (
    SELECT trace_id, account, 'TON' AS asset,
           CAST(SUM(delta) AS BIGINT) AS delta,
           CAST(SUM(fees) AS BIGINT) AS fees
    FROM ton GROUP BY trace_id, account
),
j AS (
    SELECT trace_id, source AS account, jetton_master AS asset,
           -amount AS delta
    FROM jt
    UNION ALL
    SELECT trace_id, destination, jetton_master, amount FROM jt
),
j_g AS (
    SELECT trace_id, account, asset,
           CAST(SUM(delta) AS BIGINT) AS delta,
           CAST(0 AS BIGINT) AS fees
    FROM j WHERE account IS NOT NULL
    GROUP BY trace_id, account, asset
)
SELECT * FROM ton_g
UNION ALL
SELECT * FROM j_g
ORDER BY trace_id, account, asset
"""


@register(
    "trace_balance_changes",
    oracle=_ORACLE,
    survey_ops=("A7", "C7"),
    description="per-trace TON + jetton balance deltas per account — the "
    "reference's per-trace BFS (balances.go:147-349) as one union + one "
    "map-side-combinable groupBy; oracle recomputes the grouped SUMs",
)
def trace_balance_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.balances import (
        jetton_balance_changes,
        ton_balance_changes,
    )

    txs = spark.createDataFrame(
        _TXS, "hash string, account string, total_fees long, trace_id string"
    )
    msgs = spark.createDataFrame(
        _MSGS,
        "tx_hash string, direction string, value long, trace_id string",
    )
    jts = spark.createDataFrame(
        _JTS,
        "trace_id string, source string, destination string, "
        "jetton_master_address string, amount long",
    )
    ton = ton_balance_changes(txs, msgs).select(
        "trace_id", "account", F.lit("TON").alias("asset"),
        F.col("ton_delta").cast("long").alias("delta"),
        F.col("fees").cast("long").alias("fees"),
    )
    jet = jetton_balance_changes(jts).select(
        "trace_id", "account", F.col("jetton_master").alias("asset"),
        F.col("jetton_delta").cast("long").alias("delta"),
        F.lit(0).cast("long").alias("fees"),
    )
    return ton.unionByName(jet).orderBy("trace_id", "account", "asset")
