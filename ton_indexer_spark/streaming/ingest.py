"""Streaming ingest pipeline (SURVEY.md §3.2 re-expressed, T1/T5/T8).

Reference write path: scheduler discovers seqnos in order → fetch → parse →
assemble traces (stateful) → detect interfaces → per-seqno transactional
COPY (IndexScheduler.cpp:212-386).  Spark shape:

    readStream (file source over per-seqno-bucket parquet drops,
                maxFilesPerTrigger = the reference's --max-active-tasks)
      → foreachBatch:
            1. split batch into transactions/messages
            2. IncrementalTraceAssembler.process_batch  (T2 state op)
            3. write_facts(txs+trace ids, traces)        (T8 idempotent sink)
            4. merge_dimension(latest account states …)  (W2 LWW)

The classifier stage (T5) consumes the completed-traces output the same way
— a second stream over the traces table; no task-queue tables needed, the
micro-batch scheduler replaces them.

``run_available_now`` processes everything currently in the source dir and
stops — used by tests and backfills; a production deployment passes a
processing-time trigger instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ton_indexer_spark.sources.writer import merge_dimension, write_facts
from ton_indexer_spark.streaming.trace_assembler import IncrementalTraceAssembler


class IngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        state_dir: str,
        pending_ttl_mc_seqnos: int | None = None,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.assembler = IncrementalTraceAssembler(
            spark, state_dir=state_dir, pending_ttl_mc_seqnos=pending_ttl_mc_seqnos
        )

    def process_batch(self, txs: DataFrame, msgs: DataFrame) -> None:
        res = self.assembler.process_batch(txs, msgs)
        # facts: transactions with assigned trace ids (only final traces get
        # flushed; pending rows stay in assembler state, the T6 overlay)
        flushed = txs.join(res.tx_trace_ids, "hash")
        if flushed.head(1):
            write_facts(
                flushed,
                os.path.join(self.out_dir, "transactions"),
                sort_cols=["lt", "account", "hash"],
            )
        final = res.final_traces
        if final.head(1):
            write_facts(
                final.withColumnRenamed("mc_seqno_end", "mc_block_seqno"),
                os.path.join(self.out_dir, "traces"),
                sort_cols=["end_lt", "trace_id"],
            )
        # derived dimension: latest account state per account (W2)
        merge_dimension(
            self.spark,
            txs.selectExpr(
                "account",
                "account_state_hash_after as hash",
                "lt as last_trans_lt",
                "hash as last_trans_hash",
                "now as timestamp",
            ),
            os.path.join(self.out_dir, "latest_account_states"),
            key=["account"],
            version_col="last_trans_lt",
            tiebreakers=["hash"],
        )

    def run_available_now(self, tx_source_dir: str, msg_source_dir: str,
                          checkpoint_dir: str):
        """Structured Streaming wiring: one file-source stream drives the
        pipeline; messages for the batch are read by mc_seqno range (the
        per-seqno bundle discipline of the reference's scheduler)."""
        tx_schema = self.spark.read.parquet(tx_source_dir).schema
        msgs_all = self.spark.read.parquet(msg_source_dir)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            if not batch_df.head(1):
                return
            seqs = [r[0] for r in batch_df.select("mc_block_seqno").distinct().collect()]
            batch_msgs = msgs_all.filter(msgs_all["mc_seqno"].isin(seqs))
            self.process_batch(batch_df, batch_msgs)

        stream = (
            self.spark.readStream.schema(tx_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tx_source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
