"""`GET /api/v3/traces` equivalent.

Mirrors ton-index-go/index/crud/crud_traces.go:
- :38-51  time/lt span filters on the trace row (end_lt/end_utime);
- :59-98  account / tx-hash / msg-hash scoping via EXISTS semi-joins —
  the reference deliberately replaced JOINs "that used to cause JOINs"
  (row duplication) with EXISTS; Spark: left_semi;
- :154-159 MaxTraceTransactions guard — oversized traces are returned as
  stubs instead of hydrated;
- :378-420 hydration: member transactions ordered by (lt, account) and
  collected — here one ordered collect_list instead of app-side maps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import filter_by_array, filter_range, paginate

MAX_TRACE_TRANSACTIONS = 4000  # crud_traces.go guard


def pending_overlay(finalized: DataFrame, pending: DataFrame | None) -> DataFrame:
    """T6 pending/emulated overlay: union not-yet-finalized traces (from the
    incremental assembler's state or the emulator) over finalized data with
    a ``finality`` discriminator; finalized rows shadow pending ones by
    trace_id (the invalidation-on-finalize rule, ton-trace-ttl-tracker).
    """
    finalized = finalized.withColumn("finality", F.lit("finalized"))
    if pending is None:
        return finalized
    pending = (
        pending.join(finalized.select("trace_id"), "trace_id", "left_anti")
        .withColumn("finality", F.lit("pending"))
    )
    return finalized.unionByName(pending, allowMissingColumns=True)


def traces_query(
    cat: Catalog,
    trace_ids: Sequence[str] | None = None,
    pending: DataFrame | None = None,
    account: str | None = None,
    tx_hash: str | None = None,
    msg_hash: str | None = None,
    states: Sequence[str] | None = None,
    start_lt: int | None = None,
    end_lt: int | None = None,
    start_utime: int | None = None,
    end_utime: int | None = None,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
    hydrate: bool = True,
    include_actions: bool = False,
    supported_action_types: Sequence[str] | None = None,
) -> DataFrame:
    tr = pending_overlay(cat.traces, pending)
    tr = filter_by_array(tr, "trace_id", trace_ids)
    tr = filter_by_array(tr, "state", states)
    tr = filter_range(tr, "end_lt", start_lt, end_lt)
    tr = filter_range(tr, "end_utime", start_utime, end_utime)

    if account is not None:  # EXISTS (crud_traces.go:62-72)
        probe = cat.transactions.filter(F.col("account") == account).select("trace_id")
        tr = tr.join(probe, "trace_id", "left_semi")
    if tx_hash is not None:
        probe = cat.transactions.filter(F.col("hash") == tx_hash).select("trace_id")
        tr = tr.join(probe, "trace_id", "left_semi")
    if msg_hash is not None:
        probe = cat.messages.filter(F.col("msg_hash") == msg_hash).select("trace_id")
        tr = tr.join(probe, "trace_id", "left_semi")

    key = "end_utime" if (start_utime is not None or end_utime is not None) else "end_lt"
    tr = paginate(
        tr,
        sort=[(key, sort), ("trace_id", "asc")],
        limit=limit,
        offset=offset,
    )
    if not hydrate:
        return tr

    # hydration with the big-trace guard: oversized traces stay stubs
    member = (
        cat.transactions.join(F.broadcast(tr.select("trace_id", "nodes_")), "trace_id")
        .filter(F.col("nodes_") <= MAX_TRACE_TRANSACTIONS)
        .select(
            "trace_id",
            F.struct(F.col("lt"), F.col("account"), F.col("hash")).alias("tx"),
        )
    )
    hydrated = member.groupBy("trace_id").agg(
        F.array_sort(F.collect_list("tx")).alias("transactions")
    )
    tr = tr.join(hydrated, "trace_id", "left").withColumn(
        "is_incomplete", F.col("nodes_") > MAX_TRACE_TRANSACTIONS
    )
    if include_actions:
        # includeActions hydration (crud_traces.go:162, 353-374): the
        # page's traces gather their actions, restricted to the client's
        # expanded action vocabulary — an absent param defaults to
        # ["latest"] as in the reference route (main.go:1296-1297);
        # ordered like the reference's (end_lt, action_id) serializer
        from ton_indexer_spark.classifier.action_versions import (
            expand_action_type_shortcuts,
        )

        acts = cat.actions
        allowed = expand_action_type_shortcuts(
            list(supported_action_types) if supported_action_types
            else ["latest"]
        )
        acts = acts.filter(F.col("type").isin(sorted(allowed)))
        acts = acts.join(
            F.broadcast(tr.select("trace_id")), "trace_id", "left_semi"
        ).select(
            "trace_id",
            F.struct(
                F.col("end_lt"), F.col("action_id"), F.col("type"),
                F.col("success"), F.col("start_lt"),
            ).alias("a"),
        )
        folded = acts.groupBy("trace_id").agg(
            F.array_sort(F.collect_list("a")).alias("actions")
        )
        tr = tr.join(folded, "trace_id", "left")
    # hydration joins discard paginate's ordering guarantee — re-apply
    # the route's total order on the page-sized result
    return tr.orderBy(
        F.col(key).desc() if sort == "desc" else F.col(key).asc(),
        F.col("trace_id").asc(),
    )
