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
