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
2. connected components via hash-min label propagation (operators/graph.py),
   O(log diameter) shuffles on tx hash;
3. root per component = min (lt, hash) transaction → trace_id = root hash
   (the reference's root-tx-hash convention, migrate.cpp:516);
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

from ton_indexer_spark.operators.graph import connected_components
from ton_indexer_spark.operators.windows import first_per_group


@dataclass
class AssembledTraces:
    transactions: DataFrame  # input txs + assigned trace_id
    traces: DataFrame        # one row per trace (schemas.TRACES minus class. state)


def assemble_traces(transactions: DataFrame, messages: DataFrame) -> AssembledTraces:
    """Reproduce trace_id / state / counters from transactions+messages alone.

    Any pre-existing ``trace_id`` column on the input is dropped — this
    operator is the assigner of trace ids (ingest-time semantics,
    IndexScheduler.cpp:306 stage `assemble_traces`).
    """
    txs = transactions.drop("trace_id")
    msgs = messages.select(
        "tx_hash", "tx_lt", "msg_hash", "direction", "source", "destination"
    )

    outs = msgs.filter(F.col("direction") == "out").select(
        F.col("msg_hash"), F.col("tx_hash").alias("src_tx")
    )
    ins = msgs.filter(F.col("direction") == "in").select(
        F.col("msg_hash"), F.col("tx_hash").alias("dst_tx"), F.col("source")
    )

    # matched internal edges (one shuffle on msg_hash)
    edges = outs.join(ins, "msg_hash").select("src_tx", "dst_tx", "msg_hash")

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

    # components over matched edges; singleton txs keep their own hash
    comp = connected_components(
        edges.select("src_tx", "dst_tx"), src="src_tx", dst="dst_tx"
    ).withColumnRenamed("node", "hash")
    labeled = (
        txs.join(comp, "hash", "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col("hash")))
    )

    # root per component = first tx by (lt, hash); trace_id = root hash
    roots = first_per_group(
        labeled.select("component", "hash", "lt"),
        ["component"],
        [("lt", "asc"), ("hash", "asc")],
    ).select("component", F.col("hash").alias("trace_id"))
    labeled = labeled.join(roots, "component")

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
