"""Pending-overlay endpoints: `/api/v3/pendingTransactions`,
`/pendingTraces`, `/pendingActions`.

Mirrors ton-index-go/main.go:2317,2362-2363 routes and
index/crud/crud_pending.go:

- :200-252  QueryPendingTransactionsImpl — pending (emulated) transactions
  of the scoped traces, minus those whose in-message already landed in the
  finalized ``messages`` table; each tx hydrated with in_msg + out_msgs
  ordered by created_lt (:288-297);
- :300-376  queryPendingTracesImpl — completed traces removed first
  (queryCompletedEmulatedTraces + RemoveTraces, here an anti-join against
  finalized trace ids), then hydration with the member transactions in
  order; trace_state is always 'pending' (pending.go:195-198);
- :379-392  queryPendingActionsImpl — the scoped traces' provisional
  actions;
- main.go:1348-1350 / :1496-1500 — account or ext_msg_hash is REQUIRED
  (422 otherwise) → ``ValueError`` here.  The account scope is trace-level:
  every transaction of any pending trace touching the account
  (ContextByAccount loads whole traces, pending.go:320-352).

Scale note: the pending store is small (minutes of unfinalized traces —
Redis in the reference), so broadcasting the scoped trace-id set into the
semi-joins is always safe; the finalized side is only probed with
anti-joins on its sort keys, never scanned into the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog


def _scoped_trace_ids(
    pending_txs: DataFrame,
    pending_msgs: DataFrame,
    account: str | None,
    trace_id: str | None = None,
    ext_msg_hash: str | None = None,
) -> DataFrame:
    """Trace ids of pending traces matching the route's filter."""
    if account is not None:
        return (
            pending_txs.filter(F.col("account") == account)
            .select("trace_id").distinct()
        )
    if trace_id is not None:
        return (
            pending_txs.filter(F.col("trace_id") == trace_id)
            .select("trace_id").distinct()
        )
    if ext_msg_hash is not None:
        # the trace's external hash = its root in-message (source IS NULL)
        return (
            pending_msgs.filter(
                (F.col("direction") == "in")
                & F.col("source").isNull()
                & (F.col("msg_hash") == ext_msg_hash)
            )
            .select("trace_id").distinct()
        )
    raise ValueError("account or ext_msg_hash should be specified")


def _drop_finalized(cat: Catalog, pending: DataFrame) -> DataFrame:
    """RemoveTraces(queryCompletedEmulatedTraces(...)): a pending trace that
    has since finalized is shadowed by the finalized row (crud_pending.go:
    204-209; same invalidation rule as plans.traces.pending_overlay)."""
    if not cat.has("traces"):
        return pending
    return pending.join(
        cat.traces.select("trace_id"), "trace_id", "left_anti"
    )


def pending_transactions_query(
    cat: Catalog,
    pending_txs: DataFrame,
    pending_msgs: DataFrame,
    account: str | None = None,
    trace_id: str | None = None,
) -> DataFrame:
    """`GET /api/v3/pendingTransactions` (main.go:320-369).

    account or trace_id required; returns every pending transaction of the
    matching traces, hydrated with in_msg + created_lt-ordered out_msgs.
    """
    if account is None and trace_id is None:
        raise ValueError("at least 1 account address or trace_id required")
    ids = _drop_finalized(
        cat, _scoped_trace_ids(pending_txs, pending_msgs, account, trace_id)
    )
    txs = pending_txs.join(F.broadcast(ids), "trace_id", "left_semi")
    if account is not None:
        # the account route returns only the requested account's own
        # transactions, not the whole trace (ContextByAccount is called
        # with filter_transactions=true → FilterTransactionsByAccounts,
        # main.go:355-356 + pending.go:292-316); the trace_id route keeps
        # every member (ContextByTraces applies no tx filter)
        txs = txs.filter(F.col("account") == account)

    # drop transactions whose in-message already landed finalized
    # (QueryPendingTransactionsImpl:220-243)
    if cat.has("messages"):
        landed = cat.messages.filter(F.col("direction") == "in").select(
            "msg_hash"
        )
        landed_tx = (
            pending_msgs.filter(F.col("direction") == "in")
            .join(landed, "msg_hash", "left_semi")
            .select(F.col("tx_hash").alias("hash"))
        )
        txs = txs.join(landed_tx, "hash", "left_anti")

    msgs = pending_msgs.join(
        F.broadcast(txs.select(F.col("hash").alias("tx_hash"))),
        "tx_hash", "left_semi",
    ).select(
        "tx_hash", "direction",
        F.struct(
            F.col("created_lt"), F.col("msg_hash"), F.col("source"),
            F.col("destination"), F.col("value"), F.col("opcode"),
            F.col("body"),
        ).alias("msg"),
    )
    folded = msgs.groupBy("tx_hash").agg(
        F.max(F.when(F.col("direction") == "in", F.col("msg"))).alias("in_msg"),
        F.array_sort(
            F.collect_list(F.when(F.col("direction") == "out", F.col("msg")))
        ).alias("out_msgs"),
    )
    return (
        txs.join(folded, txs["hash"] == folded["tx_hash"], "left")
        .drop("tx_hash")
        .withColumn("finality", F.lit("pending"))
        .orderBy("trace_id", "lt", "hash")
    )


def pending_traces_query(
    cat: Catalog,
    pending_txs: DataFrame,
    pending_msgs: DataFrame,
    account: str | None = None,
    ext_msg_hash: str | None = None,
) -> DataFrame:
    """`GET /api/v3/pendingTraces` (main.go:1336-1385).

    One row per still-pending trace: external_hash, start/end lt+utime,
    tx count, trace_state='pending', member transactions in (lt, account,
    hash) order (queryPendingTracesImpl:330-355).
    """
    if account is None and ext_msg_hash is None:
        raise ValueError("account or ext_msg_hash should be specified")
    ids = _drop_finalized(
        cat,
        _scoped_trace_ids(
            pending_txs, pending_msgs, account, ext_msg_hash=ext_msg_hash
        ),
    )
    txs = pending_txs.join(F.broadcast(ids), "trace_id", "left_semi")
    ext = (
        pending_msgs.filter(
            (F.col("direction") == "in") & F.col("source").isNull()
        )
        .select("trace_id", F.col("msg_hash").alias("external_hash"))
        .dropDuplicates(["trace_id"])
    )
    agg = txs.groupBy("trace_id").agg(
        F.min("lt").alias("start_lt"),
        F.max("lt").alias("end_lt"),
        F.min("now").alias("start_utime"),
        F.max("now").alias("end_utime"),
        F.count("*").alias("transactions_count"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("lt"), F.col("account"), F.col("hash"))
            )
        ).alias("transactions"),
    )
    return (
        agg.join(ext, "trace_id", "left")
        .withColumn("trace_state", F.lit("pending"))
        .orderBy("trace_id")
    )


def pending_actions_query(
    cat: Catalog,
    pending_actions: DataFrame,
    pending_msgs: DataFrame | None = None,
    account: str | None = None,
    ext_msg_hash: str | None = None,
    supported_action_types: list[str] | None = None,
) -> DataFrame:
    """`GET /api/v3/pendingActions` (main.go:1472-1523).

    Provisional actions of the scoped pending traces.  ``pending_actions``
    is the incremental classifier's overlay sink (streaming/ingest.py
    writes it with finality='pending'); account scope = membership in the
    action's accounts array, mirroring ActionContextByAccount.
    """
    if account is None and ext_msg_hash is None:
        raise ValueError("account or ext_msg_hash should be specified")
    acts = _drop_finalized(cat, pending_actions)
    # GetPendingActions defaults an absent param to ["latest"] then always
    # expands+filters (main.go:1487-1489 + ExpandActionTypeShortcuts)
    from ton_indexer_spark.classifier.action_versions import (
        expand_action_type_shortcuts,
    )

    allowed = expand_action_type_shortcuts(
        list(supported_action_types) if supported_action_types
        else ["latest"]
    )
    acts = acts.filter(F.col("type").isin(sorted(allowed)))
    if account is not None:
        acts = acts.filter(F.array_contains(F.col("accounts"), account))
    else:
        if pending_msgs is None:
            raise ValueError("ext_msg_hash scope needs pending messages")
        ids = _scoped_trace_ids(
            pending_txs=None,  # unused in ext-hash mode
            pending_msgs=pending_msgs,
            account=None,
            ext_msg_hash=ext_msg_hash,
        )
        acts = acts.join(F.broadcast(ids), "trace_id", "left_semi")
    return acts.orderBy("trace_id", "end_lt", "action_id")
