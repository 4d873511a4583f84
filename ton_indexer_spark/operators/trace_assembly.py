"""Batch trace assembly (SURVEY.md §2.8 T2, §7 step 4).

The reference assembles traces incrementally and strictly in-order
(ton-index-worker/tondb-scanner/src/TraceAssembler.cpp:285-412): a trace is
the connected component of transactions linked by message hashes, rooted at
the first transaction, with states:

- ``broken``  — an internal in-message whose producing out-message is
  missing (TraceAssembler.cpp:316-325);
- ``pending`` — an out-message with a destination but no consuming
  transaction yet (pending_edges > 0, TraceAssembler.cpp:350-366);
- ``complete`` otherwise.

Batch re-expression (order-free, so it parallelizes):
1. edge list: out-rows ⋈ in-rows on msg_hash (one shuffle on msg_hash);
2. a transaction consumes exactly one in-message, so producer→consumer
   edges form a FOREST; roots found by pointer doubling — one self-join
   per O(log depth) round (operators/graph.py:forest_roots);
3. trace_id = root transaction hash (the reference's convention,
   migrate.cpp:516) — the parentless tx, exactly as in the incremental
   assembler;
4. orphan in-messages / unconsumed out-messages are anti-joins on msg_hash
   → broken / pending flags + counters aggregated per component.

The streaming variant (streaming/trace_assembler.py) shares the same
semantics; this operator also serves as its reconciliation/backfill path —
the Spark analog of the reference's 50-block backtrack on lost state
(IndexScheduler.cpp:174-194).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.operators.graph import forest_roots


@dataclass
class AssembledTraces:
    transactions: DataFrame  # input txs + assigned trace_id
    traces: DataFrame        # one row per trace (schemas.TRACES minus class. state)


def assemble_traces(
    transactions: DataFrame,
    messages: DataFrame,
    forest_local_threshold: int | None = None,
) -> AssembledTraces:
    """Reproduce trace_id / state / counters from transactions+messages alone.

    Any pre-existing ``trace_id`` column on the input is dropped — this
    operator is the assigner of trace ids (ingest-time semantics,
    IndexScheduler.cpp:306 stage `assemble_traces`).

    ``forest_local_threshold`` passes through to
    ``forest_roots(local_threshold=...)`` — 0 forces the distributed
    pointer-doubling root finder (the backfill/100 TB path) regardless of
    edge count; None keeps the operator's size-gated default.
    """
    txs = transactions.drop("trace_id")
    # the message projection feeds four independent branches (edges,
    # orphans, unconsumed, root_in) — materialize it once with truncated
    # lineage instead of recomputing the caller's upstream plan per branch
    # (at block cadence the recompute, not the data, is the wall)
    msgs = messages.select(
        "tx_hash", "tx_lt", "msg_hash", "direction", "source", "destination"
    ).localCheckpoint(eager=True)

    outs = msgs.filter(F.col("direction") == "out").select(
        F.col("msg_hash"), F.col("tx_hash").alias("src_tx")
    )
    ins = msgs.filter(F.col("direction") == "in").select(
        F.col("msg_hash"), F.col("tx_hash").alias("dst_tx"), F.col("source")
    )

    # matched internal edges (one shuffle on msg_hash); reused by the
    # root-finding loop (both sides of its self-join) and edge_counts
    edges = (
        outs.join(ins, "msg_hash")
        .select("src_tx", "dst_tx", "msg_hash")
        .localCheckpoint(eager=True)
    )

    # orphan internal in-messages → broken roots (TraceAssembler.cpp:316-325)
    orphans = (
        ins.filter(F.col("source").isNotNull())
        .join(outs, "msg_hash", "left_anti")
        .select(F.col("dst_tx").alias("tx"), F.lit(1).alias("orphan"))
    )
    # unconsumed destined out-messages → pending edges
    unconsumed = (
        msgs.filter((F.col("direction") == "out") & F.col("destination").isNotNull())
        .join(ins.select("msg_hash"), "msg_hash", "left_anti")
        .groupBy(F.col("tx_hash").alias("tx"))
        .agg(F.count(F.lit(1)).alias("n_pending"))
    )

    # each tx consumes exactly ONE in-message → producer→consumer edges form
    # a forest; root-finding = pointer doubling (one join per round) instead
    # of generic connected components (operators/graph.py:forest_roots)
    fr_kwargs = (
        {} if forest_local_threshold is None
        else {"local_threshold": forest_local_threshold}
    )
    comp = forest_roots(
        edges.select(
            F.col("dst_tx").alias("child"), F.col("src_tx").alias("parent")
        ),
        **fr_kwargs,
    ).withColumnRenamed("node", "hash")
    labeled = (
        txs.join(comp, "hash", "left")
        # a tx with no parent roots its own trace; trace_id = root tx hash
        # (the reference's convention, migrate.cpp:516)
        .withColumn("component", F.coalesce(F.col("root"), F.col("hash")))
        .drop("root")
        .withColumn("trace_id", F.col("component"))
        # reused by roots/flags/edge_counts/root_in and the output
        .localCheckpoint(eager=True)
    )
    roots = labeled.select("component", "trace_id").distinct()

    # per-tx flags
    flags = (
        labeled.select("component", "hash", "lt", "now", "mc_block_seqno")
        .join(orphans.withColumnRenamed("tx", "hash"), "hash", "left")
        .join(unconsumed.withColumnRenamed("tx", "hash"), "hash", "left")
    )
    edge_counts = (
        edges.join(
            labeled.select(F.col("hash").alias("src_tx"), "component"), "src_tx"
        )
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("edges_"))
    )
    # external hash: root's in-message (external or orphaned internal)
    root_in = (
        ins.select(F.col("dst_tx").alias("hash"), "msg_hash")
        .join(
            labeled.select("hash", "component", "trace_id").filter(
                F.col("hash") == F.col("trace_id")
            ),
            "hash",
        )
        .groupBy("component")
        .agg(F.min("msg_hash").alias("external_hash"))
    )

    traces = (
        flags.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("nodes_"),
            F.sum(F.coalesce(F.col("orphan"), F.lit(0))).alias("n_orphans"),
            F.sum(F.coalesce(F.col("n_pending"), F.lit(0))).alias("pending_edges_"),
            F.min("lt").alias("start_lt"),
            F.max("lt").alias("end_lt"),
            F.min("now").alias("start_utime"),
            F.max("now").alias("end_utime"),
            F.min("mc_block_seqno").alias("mc_seqno_start"),
            F.max("mc_block_seqno").alias("mc_seqno_end"),
        )
        .join(edge_counts, "component", "left")
        .join(roots, "component")
        .join(root_in, "component", "left")
        .select(
            "trace_id",
            "external_hash",
            F.col("external_hash").alias("external_hash_norm"),
            "mc_seqno_start",
            "mc_seqno_end",
            "start_lt",
            "end_lt",
            "start_utime",
            "end_utime",
            F.when(F.col("n_orphans") > 0, "broken")
            .when(F.col("pending_edges_") > 0, "pending")
            .otherwise("complete")
            .alias("state"),
            F.coalesce(F.col("edges_"), F.lit(0)).alias("edges_"),
            "pending_edges_",
            "nodes_",
        )
    )
    assigned = labeled.drop("component")
    return AssembledTraces(transactions=assigned, traces=traces)


def broken_trace_roots(messages: DataFrame) -> DataFrame:
    """Trace ids containing a dangling internal edge — an out-message
    that names a destination but was never consumed by an indexed
    transaction (the detection query of the reference's repair tool,
    utils/fix-broken-traces/main.go:132-141: per msg_hash,
    ``bool_or(destination is not null) and max(in-direction tx) is
    null``).  One aggregation over messages; no fact is mutated."""
    per_msg = messages.groupBy("trace_id", "msg_hash").agg(
        F.max(
            F.when(F.col("direction") == "out", F.col("destination"))
        ).alias("dangling_dest"),
        F.max(
            F.when(F.col("direction") == "in", F.col("tx_hash"))
        ).alias("consumer"),
    )
    return (
        per_msg.filter(
            F.col("dangling_dest").isNotNull() & F.col("consumer").isNull()
        )
        .select("trace_id")
        .distinct()
    )


def trace_link_closure(
    messages: DataFrame, roots: DataFrame
) -> DataFrame:
    """Expand a set of trace ids to its msg_hash closure: every trace
    reachable from a flagged one through shared message hashes,
    transitively — the batch analog of the reference repair tool's
    recursive CTE walk over ALL messages (fix-broken-traces/main.go,
    trace_get_transactions), which follows msg links regardless of the
    transactions' CURRENT trace assignment.

    Why this matters: the dangling-edge detection flags only the
    PRODUCER fragment of a split trace (the consumer fragment has no
    dangling out-edge of its own), so reassembling the flagged trace ids
    alone would silently reproduce the split.  Closure first, then
    reassemble the union.

    Cost shape: one distinct + one groupBy over (trace_id, msg_hash),
    then connected components over only the CROSS-TRACE link pairs — a
    graph bounded by the number of split points, not by message volume.
    Returns a single-column ``trace_id`` DataFrame (superset of roots).
    """
    from ton_indexer_spark.operators.graph import connected_components

    m = messages.select("trace_id", "msg_hash").distinct()
    shared = (
        m.groupBy("msg_hash")
        .agg(F.collect_set("trace_id").alias("tids"))
        .filter(F.size("tids") > 1)
    )
    # star edges: every trace at a shared hash links to the min trace
    links = shared.select(
        F.explode("tids").alias("src"), F.array_min("tids").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    comp = connected_components(links, "src", "dst").withColumnRenamed(
        "node", "trace_id"
    )
    flagged_comps = comp.join(roots, "trace_id", "left_semi").select(
        "component"
    ).distinct()
    linked = comp.join(flagged_comps, "component", "left_semi").select(
        "trace_id"
    )
    return roots.select("trace_id").union(linked).distinct()


def repair_broken_traces(
    transactions: DataFrame,
    messages: DataFrame,
    roots: DataFrame | None = None,
) -> AssembledTraces:
    """Re-derive the traces named by ``roots`` from facts alone — the
    engine analog of the reference's utils/fix-broken-traces, whose
    Postgres surgery (delete_broken_trace + re-insert trace_edges,
    main.go:16-198) dissolves here because trace assignment is a pure
    recomputation: repair = re-run ``assemble_traces`` over the affected
    transaction subset and swap the rows in via
    ``sources.writer.replace_by_key(key=trace_id)`` (the same idempotent
    primitive reclassification uses).

    ``roots`` defaults to ``broken_trace_roots(messages)``.  The member
    set is the msg_hash CLOSURE of the flagged trace ids
    (``trace_link_closure``) — a trace split across two stored trace_ids
    is flagged only on the producer fragment, so the consumer fragment
    must be pulled in for the reassembly to actually heal the split
    (the reference walks messages recursively for the same reason,
    fix-broken-traces/main.go trace_get_transactions).  Scoping is a
    semi-join (no broadcast pin — a backfill repair set can be
    arbitrarily large; AQE picks the strategy)."""
    if roots is None:
        roots = broken_trace_roots(messages)
    members = trace_link_closure(messages, roots.select("trace_id"))
    member_txs = transactions.join(members, "trace_id", "left_semi")
    member_msgs = messages.join(members, "trace_id", "left_semi")
    return assemble_traces(
        member_txs.drop("trace_id"), member_msgs.drop("trace_id")
    )
