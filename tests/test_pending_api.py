"""Pending-overlay endpoint plans + masterchainBlockShardState vs oracle.

Response shapes pinned against ton-index-go/index/crud/crud_pending.go
(:200-252 transactions, :300-376 traces, :379-392 actions) and
crud_blocks.go:183-197 (QueryShards over the shard_state table).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.plans.pending import (
    pending_actions_query,
    pending_traces_query,
    pending_transactions_query,
)

ACCT = "0:" + "c" * 63 + "a"


@pytest.fixture(scope="module")
def ton(spark, fixture_dir):
    return Catalog(spark, fixture_dir)


@pytest.fixture(scope="module")
def tduck(fixture_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(fixture_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def pend(spark, ton, tduck):
    """Three pending traces: pt1 live, pt2 already finalized (shadowed),
    pt3 live but one tx's in-message already landed in `messages`."""
    fin_trace = tduck.execute(
        "SELECT trace_id FROM traces ORDER BY trace_id LIMIT 1"
    ).fetchone()[0]
    fin_msg = tduck.execute(
        "SELECT msg_hash FROM messages WHERE direction = 'in' "
        "ORDER BY msg_hash LIMIT 1"
    ).fetchone()[0]

    tx_cols = ("account string, hash string, lt long, trace_id string, "
               "now long, orig_status string, end_status string, "
               "aborted boolean, finality string")
    msg_cols = ("tx_hash string, tx_lt long, tx_now long, msg_hash string, "
                "direction string, trace_id string, source string, "
                "destination string, value long, created_lt long, "
                "opcode long, body string, finality string")

    def tx(acct, h, lt, tid):
        return (acct, h, lt, tid, 5000 + lt, "active", "active", False,
                "pending")

    def msg(txh, lt, mh, direction, src, dst, tid, created_lt):
        return (txh, lt, 5000 + lt, mh, direction, tid, src, dst, 7,
                created_lt, 0, None, "pending")

    txs = [
        tx(ACCT, "pt1-a", 100, "pt1"),
        tx("0:other", "pt1-b", 110, "pt1"),
        tx(ACCT, "pt2-a", 200, fin_trace),   # trace already finalized
        tx(ACCT, "pt3-a", 300, "pt3"),
        tx("0:other", "pt3-b", 310, "pt3"),  # in-msg already landed
    ]
    msgs = [
        msg("pt1-a", 100, "ext1", "in", None, ACCT, "pt1", 98),
        msg("pt1-a", 100, "pt1-m1", "out", ACCT, "0:other", "pt1", 101),
        msg("pt1-b", 110, "pt1-m1", "in", ACCT, "0:other", "pt1", 101),
        msg("pt2-a", 200, "ext2", "in", None, ACCT, fin_trace, 198),
        msg("pt3-a", 300, "ext3", "in", None, ACCT, "pt3", 298),
        msg("pt3-a", 300, "pt3-m1", "out", ACCT, "0:other", "pt3", 301),
        msg("pt3-b", 310, fin_msg, "in", ACCT, "0:other", "pt3", 301),
    ]
    return (
        spark.createDataFrame(txs, tx_cols),
        spark.createDataFrame(msgs, msg_cols),
        fin_trace,
    )


def test_pending_transactions_by_account(ton, pend):
    ptxs, pmsgs, fin_trace = pend
    got = pending_transactions_query(ton, ptxs, pmsgs, account=ACCT)
    rows = got.collect()
    # the account route returns only ACCT's OWN txs of the scoped traces
    # (FilterTransactionsByAccounts): pt1-b is another account's member,
    # pt2 is shadowed by the finalized trace, pt3-b's in-msg landed
    assert sorted(r["hash"] for r in rows) == ["pt1-a", "pt3-a"]
    by_hash = {r["hash"]: r for r in rows}
    assert by_hash["pt1-a"]["in_msg"]["msg_hash"] == "ext1"
    assert [m["msg_hash"] for m in by_hash["pt1-a"]["out_msgs"]] == ["pt1-m1"]
    assert {r["finality"] for r in rows} == {"pending"}


def test_pending_transactions_by_trace_id(ton, pend):
    ptxs, pmsgs, _ = pend
    got = pending_transactions_query(ton, ptxs, pmsgs, trace_id="pt1")
    assert sorted(r["hash"] for r in got.collect()) == ["pt1-a", "pt1-b"]


def test_pending_requires_filter(ton, pend):
    ptxs, pmsgs, _ = pend
    with pytest.raises(ValueError):
        pending_transactions_query(ton, ptxs, pmsgs)
    with pytest.raises(ValueError):
        pending_traces_query(ton, ptxs, pmsgs)


def test_pending_traces_hydrated(ton, pend):
    ptxs, pmsgs, _ = pend
    got = {r["trace_id"]: r for r in
           pending_traces_query(ton, ptxs, pmsgs, account=ACCT).collect()}
    assert sorted(got) == ["pt1", "pt3"]  # finalized pt2 shadowed
    t1 = got["pt1"]
    assert t1["external_hash"] == "ext1"
    assert t1["trace_state"] == "pending"
    assert t1["transactions_count"] == 2
    assert [t["hash"] for t in t1["transactions"]] == ["pt1-a", "pt1-b"]
    assert (t1["start_lt"], t1["end_lt"]) == (100, 110)


def test_pending_traces_by_ext_hash(ton, pend):
    ptxs, pmsgs, _ = pend
    got = pending_traces_query(ton, ptxs, pmsgs, ext_msg_hash="ext3")
    assert [r["trace_id"] for r in got.collect()] == ["pt3"]


def test_pending_actions_scoped_and_shadowed(spark, ton, pend):
    ptxs, pmsgs, fin_trace = pend
    acts = spark.createDataFrame(
        [
            ("a1", "pt1", "ton_transfer", [ACCT, "0:other"], 110),
            ("a2", fin_trace, "ton_transfer", [ACCT], 210),  # shadowed
            ("a3", "pt3", "call_contract", ["0:other"], 310),  # wrong acct
        ],
        "action_id string, trace_id string, type string, "
        "accounts array<string>, end_lt long",
    )
    got = pending_actions_query(ton, acts, pmsgs, account=ACCT)
    assert [r["action_id"] for r in got.collect()] == ["a1"]
    got2 = pending_actions_query(ton, acts, pmsgs, ext_msg_hash="ext3")
    assert [r["action_id"] for r in got2.collect()] == ["a3"]
    with pytest.raises(ValueError):
        pending_actions_query(ton, acts, pmsgs)


def test_masterchain_block_shard_state(ton, tduck):
    from ton_indexer_spark.plans.blocks import masterchain_block_shard_state

    sq = tduck.execute(
        "SELECT max(mc_block_seqno) FROM blocks WHERE workchain != -1"
    ).fetchone()[0]
    got = sorted(
        (r["workchain"], r["shard"], r["seqno"])
        for r in masterchain_block_shard_state(ton, sq).collect()
    )
    want = sorted(tduck.execute(f"""
        SELECT workchain, shard, seqno FROM blocks
        WHERE workchain = -1 AND seqno = {sq}
        UNION ALL
        SELECT workchain, shard, seqno FROM blocks
        WHERE workchain != -1 AND mc_block_seqno <= {sq}
        QUALIFY seqno = max(seqno) OVER (PARTITION BY workchain, shard)
    """).fetchall())
    assert got == want and got
    # the mc block leads its own shard state (DbScanner.cpp:154)
    assert got[0][0] == -1 and got[0][2] == sq
    # exactly one tip per (workchain, shard) chain
    assert len({(w, s) for w, s, _ in got}) == len(got)
