"""Per-trace balance changes (SURVEY.md §2.4 A7, §2.10 C7).

The reference computes this at API time with a per-trace BFS in Go
(ton-index-go/index/crud/balances.go:147-349): Σ received − Σ sent − fees
per account, plus per-jetton deltas per owner.  Because addition is
associative, the BFS is unnecessary — the scalable formulation is pure
relational algebra with map-side partial aggregation:

    in-msgs  → +value  to the consuming account
    out-msgs → −value  from the producing account
    tx fees  → −total_fees from the tx account
    jetton_transfers → ±amount per (owner, jetton master)

One union + one groupBy(trace_id, account); no per-trace iteration, no
collect — the shape survives any trace-size distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ton_balance_changes(transactions: DataFrame, messages: DataFrame) -> DataFrame:
    """(trace_id, account, ton_delta, fees) per involved account."""
    ins = messages.filter(
        (F.col("direction") == "in") & F.col("value").isNotNull()
    ).join(
        transactions.select(F.col("hash").alias("tx_hash"), "account"),
        "tx_hash",
    ).select("trace_id", "account", F.col("value").alias("delta"),
             F.lit(0).alias("fees"))
    outs = messages.filter(
        (F.col("direction") == "out") & F.col("value").isNotNull()
    ).join(
        transactions.select(F.col("hash").alias("tx_hash"), "account"),
        "tx_hash",
    ).select("trace_id", "account", (-F.col("value")).alias("delta"),
             F.lit(0).alias("fees"))
    fees = transactions.select(
        "trace_id", "account", F.lit(0).alias("delta"),
        F.col("total_fees").alias("fees"),
    )
    return (
        ins.unionByName(outs).unionByName(fees)
        .groupBy("trace_id", "account")
        .agg(
            F.sum("delta").alias("ton_delta"),
            F.sum("fees").alias("fees"),
        )
    )


def jetton_balance_changes(jetton_transfers: DataFrame) -> DataFrame:
    """(trace_id, account, jetton_master, jetton_delta) — balances.go:241-317."""
    minus = jetton_transfers.select(
        "trace_id",
        F.col("source").alias("account"),
        F.col("jetton_master_address").alias("jetton_master"),
        (-F.col("amount")).alias("delta"),
    )
    plus = jetton_transfers.select(
        "trace_id",
        F.col("destination").alias("account"),
        F.col("jetton_master_address").alias("jetton_master"),
        F.col("amount").alias("delta"),
    )
    return (
        minus.unionByName(plus)
        .filter(F.col("account").isNotNull())
        .groupBy("trace_id", "account", "jetton_master")
        .agg(F.sum("delta").alias("jetton_delta"))
    )
