"""Trace assembly must reproduce the hidden ground truth (FIXTURES.md §3)."""

from __future__ import annotations

import pytest


def test_assembly_reproduces_ground_truth(spark, fixture_dir):
    from ton_indexer_spark.operators.trace_assembly import assemble_traces

    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")
    truth_traces = spark.read.parquet(f"{fixture_dir}/traces.parquet")

    out = assemble_traces(txs.withColumnRenamed("trace_id", "true_trace_id"), msgs)

    # per-transaction trace assignment matches the hidden column
    mismatched_tx = out.transactions.filter(
        out.transactions["trace_id"] != out.transactions["true_trace_id"]
    ).count()
    assert mismatched_tx == 0

    # trace-level rows match on every assembled column
    cols = [
        "trace_id",
        "external_hash",
        "mc_seqno_start",
        "mc_seqno_end",
        "start_lt",
        "end_lt",
        "start_utime",
        "end_utime",
        "state",
        "edges_",
        "pending_edges_",
        "nodes_",
    ]
    got = {r["trace_id"]: r for r in out.traces.select(cols).collect()}
    want = {r["trace_id"]: r for r in truth_traces.select(cols).collect()}
    assert set(got) == set(want)
    diffs = [
        (tid, want[tid].asDict(), got[tid].asDict())
        for tid in want
        if got[tid].asDict() != want[tid].asDict()
    ]
    assert not diffs, f"{len(diffs)} trace mismatches, first: {diffs[:2]}"


def test_duplicate_msg_hash_is_deterministic(spark):
    """Corrupt input (same msg_hash produced twice) must not crash or
    produce nondeterministic trace ids: forest_roots keeps the min parent."""
    from ton_indexer_spark.operators.trace_assembly import assemble_traces

    txs = spark.createDataFrame(
        [(f"tx{i}", f"0:{i:064x}", 100 + i * 10, 1, 1000 + i, 0, -1, 2,
          False, "active", "active", 0, "ord") for i in range(3)],
        "hash string, account string, lt long, mc_block_seqno int, now long, "
        "block_workchain int, block_shard long, block_seqno int, "
        "aborted boolean, orig_status string, end_status string, "
        "total_fees long, descr string",
    )
    msgs = spark.createDataFrame(
        [
            ("tx0", 100, "mdup", "out", "0:" + "0" * 64, "0:" + "2" * 64, 99),
            ("tx1", 110, "mdup", "out", "0:" + "1" * 64, "0:" + "2" * 64, 109),
            ("tx2", 120, "mdup", "in", "0:" + "0" * 64, "0:" + "2" * 64, 99),
        ],
        "tx_hash string, tx_lt long, msg_hash string, direction string, "
        "source string, destination string, created_lt long",
    )
    out1 = assemble_traces(txs, msgs).transactions.select("hash", "trace_id")
    out2 = assemble_traces(txs, msgs).transactions.select("hash", "trace_id")
    a = sorted(map(tuple, out1.collect()))
    assert a == sorted(map(tuple, out2.collect()))
    # tx2's parent is deterministically the min of the duplicate producers
    assignment = dict(a)
    assert assignment["tx2"] == assignment["tx0"]
