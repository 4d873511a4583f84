"""Integrity-audit driver gate (SURVEY §5 "Data integrity"; reference
ton-integrity-checker/src/IntegrityChecker.cpp:1-316).

The fixture is a deterministic store with three injected corruptions —
a lost trace write, a corrupted trace node count, a ghost trace row,
plus a stale latest-state row and a missing/extra action_account pair —
so the expected findings frame is a literal VALUES table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from ton_indexer_spark.queries import register


def _store(spark: SparkSession):
    """Facts: two complete 2-tx traces; stored tables corrupted."""
    txs = spark.createDataFrame(
        [("t1", 10, 1000, 1, None), ("t2", 20, 1001, 1, None),
         ("u1", 30, 1002, 1, None), ("u2", 40, 1003, 1, None)],
        "hash string, lt long, now long, mc_block_seqno long, "
        "trace_id string",
    )
    msgs = spark.createDataFrame(
        [("t1", 10, "e1", "in", None, "X"),
         ("t1", 10, "m1", "out", "X", "Y"),
         ("t2", 20, "m1", "in", "X", "Y"),
         ("u1", 30, "e2", "in", None, "P"),
         ("u1", 30, "m2", "out", "P", "Q"),
         ("u2", 40, "m2", "in", "P", "Q")],
        "tx_hash string, tx_lt long, msg_hash string, direction string, "
        "source string, destination string",
    )
    # truth: traces t1 (2 nodes complete) and u1 (2 nodes complete).
    # stored: t1 corrupted to 3 nodes, u1 LOST, ghost present.
    stored_traces = spark.createDataFrame(
        [("t1", 3, "complete"), ("ghost", 1, "complete")],
        "trace_id string, nodes_ long, state string",
    )
    states = spark.createDataFrame(
        [("X", 10), ("X", 20), ("Y", 5)],
        "account string, last_trans_lt long",
    )
    stored_latest = spark.createDataFrame(
        [("X", 10), ("Y", 5)],  # X stale (20 exists)
        "account string, last_trans_lt long",
    )
    actions = spark.createDataFrame(
        [("a1", "t1", ["X", "Y"])],
        "action_id string, trace_id string, accounts array<string>",
    )
    stored_aa = spark.createDataFrame(
        [("a1", "t1", "X"), ("a1", "t1", "Z")],  # Y missing, Z extra
        "action_id string, trace_id string, account string",
    )
    return txs, msgs, stored_traces, states, stored_latest, actions, stored_aa


_ORACLE = """
SELECT * FROM (VALUES
  ('action_accounts', 'a1|t1|Y', 'missing', CAST(NULL AS VARCHAR),
   'present'),
  ('action_accounts', 'a1|t1|Z', 'extra', 'present',
   CAST(NULL AS VARCHAR)),
  ('latest_account_states', 'X', 'mismatch', '10', '20'),
  ('traces', 'ghost', 'extra', '1/complete', CAST(NULL AS VARCHAR)),
  ('traces', 't1', 'mismatch', '3/complete', '2/complete'),
  ('traces', 'u1', 'missing', CAST(NULL AS VARCHAR), '2/complete')
) AS t("check", key, issue, stored, derived)
ORDER BY "check", key
"""


@register(
    "integrity_audit",
    oracle=_ORACLE,
    survey_ops=("T4",),
    description="facts-vs-derived integrity audit: recompute traces / "
    "latest-state window / action_accounts explode and diff against the "
    "store; injected corruption surfaces as typed findings "
    "(IntegrityChecker.cpp:1-316 analog as pure re-derivation)",
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.operators.audit import integrity_report

    txs, msgs, st, states, latest, acts, aa = _store(spark)
    return integrity_report(
        txs, msgs, st,
        account_states=states, stored_latest=latest,
        actions=acts, stored_action_accounts=aa,
    ).orderBy("check", "key")
