"""Integrity audit (operators/audit.py) — the engine analog of the
reference's ton-integrity-checker (IntegrityCheckerpp:1-316): derived
tables must be exactly re-derivable from facts; injected corruption must
surface as findings with the right issue kind."""

from __future__ import annotations

from pyspark.sql import functions as F

from ton_indexer_spark.operators.audit import (
    audit_action_accounts,
    audit_latest_states,
    audit_traces,
    integrity_report,
)


def test_consistent_store_yields_zero_findings(spark, fixture_dir):
    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")
    truth = spark.read.parquet(f"{fixture_dir}/traces.parquet")
    assert audit_traces(txs, msgs, truth).count() == 0


def test_injected_trace_corruption_is_found(spark, fixture_dir):
    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")
    truth = spark.read.parquet(f"{fixture_dir}/traces.parquet")

    victims = [r["trace_id"] for r in
               truth.select("trace_id").orderBy("trace_id").head(2)]
    dropped, corrupted = victims
    stored = (
        truth.filter(F.col("trace_id") != dropped)      # lost write
        .withColumn(                                      # corrupted count
            "nodes_",
            F.when(F.col("trace_id") == corrupted,
                   F.col("nodes_") + 1).otherwise(F.col("nodes_")),
        )
    )
    # plus a row for a trace that never existed
    ghost = stored.limit(1).withColumn("trace_id", F.lit("ghost-trace"))
    stored = stored.unionByName(ghost)

    got = {r["key"]: r["issue"]
           for r in audit_traces(txs, msgs, stored).collect()}
    assert got[dropped] == "missing"
    assert got[corrupted] == "mismatch"
    assert got["ghost-trace"] == "extra"
    assert len(got) == 3


def test_latest_state_and_action_accounts_audits(spark):
    states = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)],
        "account string, last_trans_lt long",
    )
    stored_latest = spark.createDataFrame(
        [("a", 10),   # stale: 20 exists
         ("b", 5),    # fine
         ("d", 9)],   # extra: no history at all
        "account string, last_trans_lt long",
    )                  # c missing
    got = {r["key"]: r["issue"]
           for r in audit_latest_states(states, stored_latest).collect()}
    assert got == {"a": "mismatch", "c": "missing", "d": "extra"}

    actions = spark.createDataFrame(
        [("a1", "t1", ["x", "y"]), ("a2", "t1", ["z"])],
        "action_id string, trace_id string, accounts array<string>",
    )
    stored_aa = spark.createDataFrame(
        [("a1", "t1", "x"),             # ok
         ("a2", "t1", "z"),             # ok
         ("a2", "t1", "q")],            # extra
        "action_id string, trace_id string, account string",
    )                                    # a1/t1/y missing
    got = {r["key"]: r["issue"]
           for r in audit_action_accounts(actions, stored_aa).collect()}
    assert got == {"a1|t1|y": "missing", "a2|t1|q": "extra"}


def test_integrity_report_unions_all_checks(spark, fixture_dir):
    txs = spark.read.parquet(f"{fixture_dir}/transactions.parquet")
    msgs = spark.read.parquet(f"{fixture_dir}/messages.parquet")
    truth = spark.read.parquet(f"{fixture_dir}/traces.parquet")
    states = spark.createDataFrame(
        [("a", 10), ("a", 20)], "account string, last_trans_lt long"
    )
    latest_ok = spark.createDataFrame(
        [("a", 20)], "account string, last_trans_lt long"
    )
    acts = spark.createDataFrame(
        [("a1", "t1", ["x"])],
        "action_id string, trace_id string, accounts array<string>",
    )
    aa_ok = spark.createDataFrame(
        [("a1", "t1", "x")],
        "action_id string, trace_id string, account string",
    )
    rep = integrity_report(
        txs, msgs, truth,
        account_states=states, stored_latest=latest_ok,
        actions=acts, stored_action_accounts=aa_ok,
    )
    assert rep.columns == ["check", "key", "issue", "stored", "derived"]
    assert rep.count() == 0
