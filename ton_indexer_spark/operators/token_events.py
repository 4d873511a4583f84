"""Ingest-time decoded token-event extraction (SURVEY.md §7 step 6 —
the derived `jetton_transfers` / `jetton_burns` tables, migrate.cpp:414-434
/ :395-412; decoded by the worker's interface detector at ingest).

A jetton transfer event row is derived from the wallet transaction that
consumed the 0x0f8a7ea5 request: one row per (tx, transfer), with amount /
destination decoded from the message body (the F2 decode seam) and the
wallet's master resolved via broadcast dimension join.  Pure DataFrame
algebra + the JSON-payload decode; at ingest this runs on the micro-batch,
so the event tables are append-only facts like the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JETTON_TRANSFER_OP = 0x0F8A7EA5
JETTON_BURN_OP = 0x595F07BC

# DECIMAL(38,0) amounts: jetton amounts are uint256-range on chain —
# int64 silently overflows on large-supply jettons (SURVEY §1.3; the
# reference stores `numeric`, migrate.cpp:414-434)
_BODY_SCHEMA = "amount DECIMAL(38,0), destination STRING, query_id DECIMAL(38,0)"


def _decoded(messages: DataFrame, message_contents: DataFrame | None) -> DataFrame:
    # widened message tables (plan-side catalogs) already carry tx_now /
    # mc_seqno; drop them so the join with the transactions projection
    # below stays unambiguous — tx fields come from transactions
    m = messages.drop("tx_now", "mc_seqno", "tx_aborted")
    if message_contents is not None:
        m = m.join(
            message_contents.select(
                F.col("hash").alias("body_hash"), F.col("body")
            ),
            "body_hash",
            "left",
        )
    else:
        m = m.withColumn("body", F.lit(None).cast("string"))
    # fixture bodies are base64 JSON (the TL-B parse seam); tolerate garbage
    return m.withColumn(
        "payload",
        F.from_json(F.unbase64(F.col("body")).cast("string"), _BODY_SCHEMA),
    )


def derive_jetton_transfers(
    transactions: DataFrame,
    messages: DataFrame,
    message_contents: DataFrame | None = None,
    jetton_wallets: DataFrame | None = None,
) -> DataFrame:
    """One row per consumed 0x0f8a7ea5 request at a jetton wallet."""
    reqs = _decoded(
        messages.filter(
            (F.col("direction") == "in") & (F.col("opcode") == JETTON_TRANSFER_OP)
        ),
        message_contents,
    )
    tx = transactions.select(
        F.col("hash").alias("tx_hash"),
        F.col("now").alias("tx_now"),
        F.col("aborted").alias("tx_aborted"),
        F.col("mc_block_seqno").alias("mc_seqno"),
        F.col("account"),
    )
    out = reqs.join(tx, "tx_hash").select(
        "tx_hash",
        F.col("tx_lt"),
        "tx_now",
        "tx_aborted",
        "mc_seqno",
        F.col("payload.query_id").alias("query_id"),
        F.col("payload.amount").alias("amount"),
        F.col("source"),
        F.col("payload.destination").alias("destination"),
        F.col("account").alias("jetton_wallet_address"),
        F.col("trace_id"),
    )
    if jetton_wallets is not None:
        jw = jetton_wallets.select(
            F.col("address").alias("jetton_wallet_address"),
            F.col("jetton").alias("jetton_master_address"),
        )
        # no forced broadcast: jetton_wallets is tens of millions of rows on
        # real chain — AQE picks broadcast only when the dim is small
        out = out.join(jw, "jetton_wallet_address", "left")
    else:
        out = out.withColumn(
            "jetton_master_address", F.lit(None).cast("string")
        )
    return out


def derive_jetton_burns(
    transactions: DataFrame,
    messages: DataFrame,
    message_contents: DataFrame | None = None,
    jetton_wallets: DataFrame | None = None,
) -> DataFrame:
    """One row per consumed 0x595f07bc burn at a jetton wallet."""
    reqs = _decoded(
        messages.filter(
            (F.col("direction") == "in") & (F.col("opcode") == JETTON_BURN_OP)
        ),
        message_contents,
    )
    tx = transactions.select(
        F.col("hash").alias("tx_hash"),
        F.col("now").alias("tx_now"),
        F.col("aborted").alias("tx_aborted"),
        F.col("mc_block_seqno").alias("mc_seqno"),
        F.col("account"),
    )
    out = reqs.join(tx, "tx_hash").select(
        "tx_hash",
        F.col("tx_lt"),
        "tx_now",
        "tx_aborted",
        "mc_seqno",
        F.col("payload.query_id").alias("query_id"),
        F.col("payload.amount").alias("amount"),
        F.col("source").alias("owner"),
        F.col("account").alias("jetton_wallet_address"),
        F.col("trace_id"),
    )
    if jetton_wallets is not None:
        jw = jetton_wallets.select(
            F.col("address").alias("jetton_wallet_address"),
            F.col("jetton").alias("jetton_master_address"),
        )
        # no forced broadcast: jetton_wallets is tens of millions of rows on
        # real chain — AQE picks broadcast only when the dim is small
        out = out.join(jw, "jetton_wallet_address", "left")
    else:
        out = out.withColumn(
            "jetton_master_address", F.lit(None).cast("string")
        )
    return out
