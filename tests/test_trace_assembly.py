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


def test_forest_roots_local_matches_distributed(spark):
    """The size-gated single-task fast path and the distributed
    pointer-doubling path must produce identical (node, root) sets —
    including deep chains, duplicate children (min parent wins), and
    multi-tree forests."""
    import random

    from pyspark.sql import functions as F

    from ton_indexer_spark.operators.graph import forest_roots

    rng = random.Random(7)
    rows = []
    # 40 trees: chains of depth up to 70 (forces >6 doubling rounds),
    # plus random branching
    nid = 0
    for t in range(40):
        root = f"r{t:03d}"
        prev = [root]
        for depth in range(rng.randint(1, 70)):
            cur = []
            for p in prev:
                for _ in range(rng.choice([1, 1, 2])):
                    node = f"n{nid:06d}"
                    nid += 1
                    rows.append((node, p))
                    cur.append(node)
            prev = cur[: rng.randint(1, max(1, len(cur)))]
    # one duplicate child with two parents — min must win on both paths
    rows.append(("dupchild", "zzz-parent"))
    rows.append(("dupchild", "aaa-parent"))

    edges = spark.createDataFrame(rows, "child string, parent string")
    local = forest_roots(edges)  # small input → local path
    dist = forest_roots(edges, local_threshold=0)  # forced distributed
    a = sorted(map(tuple, local.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b
    roots = dict(a)
    assert roots["dupchild"] == "aaa-parent"
    assert all(r.startswith(("r", "aaa")) for r in set(roots.values()))


def test_forest_roots_cyclic_corruption_parity(spark):
    """Corrupted input (duplicate msg_hash ⇒ mutual parent pair a↔b) must
    resolve identically on the local and distributed paths: the 2-cycle is
    broken deterministically (smaller id becomes the root), tails hanging
    off the cycle follow it, and the distributed loop terminates instead of
    spinning to max_iter."""
    from ton_indexer_spark.operators.graph import forest_roots

    rows = [
        ("b", "a"), ("a", "b"),          # mutual pair — the corruption
        ("c", "a"), ("d", "c"),          # tail into the cycle
        ("x", "w"), ("y", "x"),          # a clean chain alongside
    ]
    edges = spark.createDataFrame(rows, "child string, parent string")
    local = sorted(map(tuple, forest_roots(edges).collect()))
    dist = sorted(
        map(tuple, forest_roots(edges, local_threshold=0, max_iter=8).collect())
    )
    assert local == dist
    roots = dict(local)
    assert roots["b"] == "a" and roots["c"] == "a" and roots["d"] == "a"
    assert "a" not in roots  # a became the root: no parent row survives
    assert roots["x"] == "w" and roots["y"] == "w"


def test_broken_trace_detection_and_repair(spark, fixture_dir):
    """utils/fix-broken-traces parity: drop one leaf transaction from a
    multi-node trace (a missed index write) — detection must flag
    exactly that trace, and repair must re-derive consistent trace rows
    for the surviving members from facts alone."""
    from pyspark.sql import functions as F

    from ton_indexer_spark.operators.trace_assembly import (
        broken_trace_roots,
        repair_broken_traces,
    )

    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")

    # pre-existing detections are exactly the traces that genuinely have
    # unconsumed internal edges (the fixture's in-flight pending traces)
    truth = spark.read.parquet(f"{fixture_dir}/traces.parquet")
    pre = {r["trace_id"] for r in broken_trace_roots(msgs).collect()}
    states = {
        r["trace_id"]: r["state"]
        for r in truth.join(
            broken_trace_roots(msgs), "trace_id", "left_semi"
        ).collect()
    }
    assert pre == set(states)
    assert all(s != "complete" for s in states.values()), states

    # pick a leaf tx (has an in-edge, no out-edges) of a ≥3-node COMPLETE
    # trace — severing it simulates a missed index write
    outs = msgs.filter(F.col("direction") == "out").select(
        F.col("tx_hash").alias("hash")
    )
    complete_ids = truth.filter(F.col("state") == "complete").select(
        "trace_id"
    )
    leaf = (
        txs.join(outs, "hash", "left_anti")
        .join(complete_ids, "trace_id", "left_semi")
        .join(
            txs.groupBy("trace_id").count().filter("count >= 3"),
            "trace_id",
        )
        .select("hash", "trace_id")
        .orderBy("hash")
        .first()
    )
    crippled_txs = txs.filter(F.col("hash") != leaf["hash"])
    crippled_msgs = msgs.filter(F.col("tx_hash") != leaf["hash"])

    detected = {
        r["trace_id"] for r in broken_trace_roots(crippled_msgs).collect()
    }
    assert detected - pre == {leaf["trace_id"]}

    roots = spark.createDataFrame(
        [(leaf["trace_id"],)], "trace_id string"
    )
    fixed = repair_broken_traces(crippled_txs, crippled_msgs, roots=roots)
    # every surviving member is re-covered, ids are internally consistent
    n_members = crippled_txs.filter(
        F.col("trace_id") == leaf["trace_id"]
    ).count()
    assert fixed.transactions.count() == n_members
    tr = fixed.traces.collect()
    assert sum(r["nodes_"] for r in tr) == n_members
    # the severed edge shows up as a pending edge, not silent completeness
    assert any(r["pending_edges_"] > 0 and r["state"] == "pending" for r in tr)


def test_repair_split_trace_pulls_in_consumer_fragment(spark):
    """A trace SPLIT across two stored trace_ids — producer fragment A
    (whose out-message dangles within A) and consumer fragment B (which
    holds the in-row, so B itself is never flagged) — is the case the
    reference repair tool's recursive message walk exists for
    (fix-broken-traces/main.go trace_get_transactions).  Detection flags
    only A; the repair's msg_hash closure must pull B's transactions in
    so reassembly yields ONE complete trace, not a no-op."""
    from pyspark.sql import functions as F

    from ton_indexer_spark.operators.trace_assembly import (
        broken_trace_roots,
        repair_broken_traces,
        trace_link_closure,
    )

    tx_schema = ("hash string, lt long, now long, mc_block_seqno long, "
                 "trace_id string")
    msg_schema = ("trace_id string, tx_hash string, tx_lt long, "
                  "msg_hash string, direction string, source string, "
                  "destination string")
    txs = spark.createDataFrame([
        ("t1", 10, 1000, 1, "A"),
        ("t2", 20, 1001, 1, "B"),
        ("t3", 30, 1002, 1, "B"),
        # an unrelated healthy trace must stay untouched by the closure
        ("u1", 40, 1003, 1, "C"),
    ], tx_schema)
    msgs = spark.createDataFrame([
        ("A", "t1", 10, "e1", "in", None, "X"),
        ("A", "t1", 10, "m1", "out", "X", "Y"),   # dangles WITHIN A
        ("B", "t2", 20, "m1", "in", "X", "Y"),    # consumed under B
        ("B", "t2", 20, "m2", "out", "Y", "Z"),
        ("B", "t3", 30, "m2", "in", "Y", "Z"),
        ("C", "u1", 40, "e2", "in", None, "Q"),
    ], msg_schema)

    flagged = {r["trace_id"] for r in broken_trace_roots(msgs).collect()}
    assert flagged == {"A"}  # the consumer fragment is NOT flagged

    closure = {
        r["trace_id"]
        for r in trace_link_closure(
            msgs, spark.createDataFrame([("A",)], "trace_id string")
        ).collect()
    }
    assert closure == {"A", "B"}

    fixed = repair_broken_traces(txs, msgs)
    got_txs = fixed.transactions.collect()
    assert {r["hash"] for r in got_txs} == {"t1", "t2", "t3"}
    assert {r["trace_id"] for r in got_txs} == {"t1"}  # rooted at t1
    tr = fixed.traces.collect()
    assert len(tr) == 1
    assert tr[0]["nodes_"] == 3
    assert tr[0]["state"] == "complete"
    assert tr[0]["trace_id"] == "t1"
