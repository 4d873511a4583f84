"""`GET /api/v3/actions` (v2) equivalent — actions by account.

Mirrors ton-index-go/index/crud/crud_actions_v2.go:
- :341-351 account scoping through the pre-exploded ``action_accounts``
  table + DISTINCT ON dedup (the write-time materialized access path that
  replaces a per-account secondary index at 100 TB);
- :375-382 type allowlist / excludelist (= ANY($1));
- :437 ancestor suppression ``NOT (A.ancestor_type && $1)`` — child actions
  whose ancestor type is already returned are dropped;
- :352-363 tx-hash scoping via ``tx_hashes @> array[hash]``;
- :416-432 order by (trace_end_lt, trace_id, action_end_lt, action_id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import first_per_group, paginate


def actions_by_account(
    cat: Catalog,
    account: str | None = None,
    action_types: Sequence[str] | None = None,
    exclude_types: Sequence[str] | None = None,
    supported_action_types: Sequence[str] | None = None,
    suppress_ancestor_types: Sequence[str] | None = None,
    tx_hash: str | None = None,
    action_ids: Sequence[str] | None = None,
    trace_ids: Sequence[str] | None = None,
    mc_seqno: int | None = None,
    start_lt: int | None = None,
    end_lt: int | None = None,
    start_utime: int | None = None,
    end_utime: int | None = None,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
    include_transactions: bool = False,
) -> DataFrame:
    from ton_indexer_spark.operators import filter_by_array

    a = cat.actions
    # direct-id and trace filters (crud_actions_v2.go action_id/trace_id
    # query params — = ANY($1) lists)
    a = filter_by_array(a, "action_id", action_ids)
    a = filter_by_array(a, "trace_id", trace_ids)
    if mc_seqno is not None:
        # "actions of traces completed in mc block seqno" (main.go:390)
        a = a.filter(F.col("trace_mc_seqno_end") == mc_seqno)
    if account is not None:
        aa = cat.action_accounts.filter(F.col("account") == account).select(
            "action_id", "trace_id"
        )
        a = a.join(aa, ["action_id", "trace_id"], "left_semi")
    # version-shortcut expansion ("latest", "v2", "nft.v3", ...) — the
    # client's action vocabulary.  ALWAYS applied: the reference defaults
    # an absent param to ["latest"] (crud_actions_v2.go:21-24), so action
    # types a client never opted into (e.g. tgbtc) don't leak
    from ton_indexer_spark.classifier.action_versions import (
        expand_action_type_shortcuts,
    )

    allowed = expand_action_type_shortcuts(
        list(supported_action_types) if supported_action_types else ["latest"]
    )
    a = a.filter(F.col("type").isin(sorted(allowed)))
    if action_types:
        a = a.filter(F.col("type").isin(list(action_types)))
    if exclude_types:
        a = a.filter(~F.col("type").isin(list(exclude_types)))
    if suppress_ancestor_types:
        # crud_actions_v2.go:437 — NOT (ancestor_type && $1)
        a = a.filter(
            ~F.arrays_overlap(
                F.coalesce(F.col("ancestor_type"), F.array().cast("array<string>")),
                F.array(*[F.lit(t) for t in suppress_ancestor_types]),
            )
        )
    if tx_hash is not None:
        a = a.filter(F.array_contains(F.col("tx_hashes"), tx_hash))
    # the lt/utime span filters apply to the TRACE's end, not the
    # action's own (crud_actions_v2.go:305-340: A.trace_end_utime /
    # A.trace_end_lt) — an action inside a still-spanning trace stays
    # addressable by the trace's completion point
    if start_lt is not None:
        a = a.filter(F.col("trace_end_lt") >= start_lt)
    if end_lt is not None:
        a = a.filter(F.col("trace_end_lt") <= end_lt)
    if start_utime is not None:
        a = a.filter(F.col("trace_end_utime") >= start_utime)
    if end_utime is not None:
        a = a.filter(F.col("trace_end_utime") <= end_utime)

    # post-join dedup (DISTINCT ON) — a trace/action pair may match through
    # several accounts of the same action
    a = first_per_group(
        a,
        ["trace_id", "action_id"],
        [("end_lt", "desc")],
    )
    a = paginate(
        a,
        sort=[
            ("trace_end_lt", sort),
            ("trace_id", "asc"),
            ("end_lt", sort),
            ("action_id", "asc"),
        ],
        limit=limit,
        offset=offset,
    )
    if include_transactions:
        # include_transactions hydration (crud_pending.go:61-81 shape for
        # the batch route): gather full tx rows for each page action's
        # tx_hashes, ordered (lt, account, hash); page-scoped broadcast
        wanted = a.select(
            "action_id", F.explode("tx_hashes").alias("hash")
        )
        member = cat.transactions.join(
            F.broadcast(wanted), "hash"
        ).select(
            "action_id",
            F.struct(F.col("lt"), F.col("account"), F.col("hash")).alias("tx"),
        )
        folded = member.groupBy("action_id").agg(
            F.array_sort(F.collect_list("tx")).alias("transactions_full")
        )
        # the join discards paginate's ordering guarantee — re-apply the
        # route's total order on the page-sized result
        a = a.join(folded, "action_id", "left").orderBy(
            F.col("trace_end_lt").desc() if sort == "desc"
            else F.col("trace_end_lt").asc(),
            F.col("trace_id").asc(),
            F.col("end_lt").desc() if sort == "desc"
            else F.col("end_lt").asc(),
            F.col("action_id").asc(),
        )
    return a
