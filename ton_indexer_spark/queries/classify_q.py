"""Classifier- and overlay-exercising driver gates (C1-C5, C9-C10, S5/T6
coverage in CORRECTNESS).

Round-5 lesson: none of the registered gates ran ``classify_traces``, so a
matcher-library regression that broke ALL classification sailed through a
50/50-green CORRECTNESS file.  These gates close that hole: each runs the
real Spark classify pipeline (groupBy(trace_id).applyInPandas → matcher
library → serializer) over a small deterministic TON-shaped fixture built
inline, and the DuckDB oracle is a constant VALUES table — the classifier
is deterministic, so expected output is a literal (the same idea as the
reference's YAML golden cases, indexer/tests/test_actions.py:12-64).

The fixture shapes mirror the reference's canonical flows: a plain value
transfer with comment (ton_transfer), the 4-leg TEP-74 jetton transfer
chain (jetton_transfer), an unmatched contract call (call_contract), and
an over-cutoff trace (classification_state='skipped').
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.queries import register

ACC = [f"0:{i:064x}" for i in range(6)]
W1 = "0:" + "a" * 63 + "1"  # sender's jetton wallet
W2 = "0:" + "a" * 63 + "2"  # recipient's jetton wallet
JETTON = "0:" + "e" * 63 + "1"


def _b64(payload: dict) -> str:
    return base64.b64encode(
        json.dumps(payload, sort_keys=True).encode()
    ).decode()


def _fixture_rows():
    """(tx rows, msg rows, body rows) for four deterministic traces."""
    from ton_indexer_spark.classifier.matchers import (
        EXCESSES,
        JETTON_INTERNAL,
        JETTON_NOTIFY,
        JETTON_TRANSFER,
    )

    txs, msgs, bodies = [], [], []

    def tx(trace, n, account, lt, *, aborted=False):
        h = f"{trace}-tx{n}"
        txs.append((h, account, lt, 1_700_000_000 + lt, aborted,
                    "active", "active", trace))
        return h

    def msg(trace, tx_hash, tx_lt, n, direction, source, destination,
            value=None, opcode=None, body=None):
        mh = f"{trace}-m{n}"
        bh = None
        if body is not None:
            bh = f"bh-{mh}"
            bodies.append((bh, body))
        msgs.append((trace, tx_hash, tx_lt, mh, direction, source,
                     destination, value, opcode, tx_lt - 2, bh))
        return mh

    # gt1: external root wallet tx → simple value transfer w/ comment
    r = tx("gt1", 1, ACC[0], 100)
    msg("gt1", r, 100, 1, "in", None, ACC[0])
    m = msg("gt1", r, 100, 2, "out", ACC[0], ACC[1], value=10**9, opcode=0,
            body=_b64({"comment": "gate check"}))
    t = tx("gt1", 2, ACC[1], 110)
    msgs.append(("gt1", t, 110, m, "in", ACC[0], ACC[1], 10**9, 0, 101,
                 f"bh-{m}"))

    # gt2: TEP-74 jetton transfer — owner→W1(transfer)→W2(internal)
    #      →notify(new owner) + excesses(old owner)
    r = tx("gt2", 1, ACC[0], 200)
    msg("gt2", r, 200, 1, "in", None, ACC[0])
    body = _b64({"amount": 5000, "destination": ACC[1]})
    m = msg("gt2", r, 200, 2, "out", ACC[0], W1, value=10**8,
            opcode=JETTON_TRANSFER, body=body)
    t1 = tx("gt2", 2, W1, 210)
    msgs.append(("gt2", t1, 210, m, "in", ACC[0], W1, 10**8,
                 JETTON_TRANSFER, 201, f"bh-{m}"))
    m2 = msg("gt2", t1, 210, 3, "out", W1, W2, value=10**7,
             opcode=JETTON_INTERNAL)
    t2 = tx("gt2", 3, W2, 220)
    msgs.append(("gt2", t2, 220, m2, "in", W1, W2, 10**7,
                 JETTON_INTERNAL, 211, None))
    m3 = msg("gt2", t2, 220, 4, "out", W2, ACC[1], value=1,
             opcode=JETTON_NOTIFY)
    t3 = tx("gt2", 4, ACC[1], 230)
    msgs.append(("gt2", t3, 230, m3, "in", W2, ACC[1], 1,
                 JETTON_NOTIFY, 221, None))
    m4 = msg("gt2", t2, 220, 5, "out", W2, ACC[0], value=2,
             opcode=EXCESSES)
    t4 = tx("gt2", 5, ACC[0], 240)
    msgs.append(("gt2", t4, 240, m4, "in", W2, ACC[0], 2,
                 EXCESSES, 222, None))

    # gt3: unmatched internal call → call_contract
    r = tx("gt3", 1, ACC[2], 300)
    msg("gt3", r, 300, 1, "in", None, ACC[2])
    m = msg("gt3", r, 300, 2, "out", ACC[2], ACC[3], value=5,
            opcode=0x12345678)
    t = tx("gt3", 2, ACC[3], 310)
    msgs.append(("gt3", t, 310, m, "in", ACC[2], ACC[3], 5, 0x12345678,
                 301, None))

    # gt4: 6-tx chain — exceeds big_trace_cutoff=4 → skipped sentinel
    prev_acct, prev_tx = None, None
    for i in range(6):
        acct = ACC[i % 5]
        h = tx("gt4", i + 1, acct, 400 + 10 * i)
        if prev_tx is None:
            msg("gt4", h, 400, i * 2 + 1, "in", None, acct)
        else:
            m = msg("gt4", prev_tx, 400 + 10 * (i - 1), i * 2, "out",
                    prev_acct, acct, value=7, opcode=0x0BAD0000 + i)
            msgs.append(("gt4", h, 400 + 10 * i, m, "in", prev_acct, acct,
                         7, 0x0BAD0000 + i, 400 + 10 * (i - 1) + 1, None))
        prev_acct, prev_tx = acct, h
    return txs, msgs, bodies


_TX_SCHEMA = ("hash string, account string, lt long, now long, "
              "aborted boolean, orig_status string, end_status string, "
              "trace_id string")
_MSG_SCHEMA = ("trace_id string, tx_hash string, tx_lt long, "
               "msg_hash string, direction string, source string, "
               "destination string, value long, opcode long, "
               "created_lt long, body_hash string")


def _classified(spark: SparkSession):
    from ton_indexer_spark.classifier import classify_traces

    txs, msgs, bodies = _fixture_rows()
    txs_df = spark.createDataFrame(txs, _TX_SCHEMA)
    msgs_df = spark.createDataFrame(msgs, _MSG_SCHEMA)
    bodies_df = spark.createDataFrame(bodies, "hash string, body string")
    jw = spark.createDataFrame(
        [(W1, ACC[0], JETTON), (W2, ACC[1], JETTON)],
        "address string, owner string, jetton string",
    )
    return classify_traces(
        txs_df, msgs_df, bodies_df, jetton_wallets=jw, big_trace_cutoff=5
    )


# the classifier is deterministic over the fixed fixture, so the oracles
# are literal VALUES tables — the same golden-expectation idea as the
# reference's YAML cases, expressed as DuckDB constants
_ACTIONS_ORACLE = f"""
SELECT * FROM (VALUES
  ('gt1', 'ton_transfer', '{ACC[0]}', CAST(NULL AS VARCHAR),
   '{ACC[1]}', CAST(NULL AS VARCHAR), 'TON',
   CAST(1000000000 AS BIGINT), TRUE, 2,
   CAST(101 AS BIGINT), CAST(110 AS BIGINT)),
  ('gt2', 'jetton_transfer', '{ACC[0]}', '{W1}', '{ACC[1]}', '{W2}',
   '{JETTON}', CAST(5000 AS BIGINT), TRUE, 5,
   CAST(201 AS BIGINT), CAST(240 AS BIGINT)),
  ('gt3', 'call_contract', '{ACC[2]}', CAST(NULL AS VARCHAR),
   '{ACC[3]}', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
   CAST(5 AS BIGINT), TRUE, 2, CAST(301 AS BIGINT), CAST(310 AS BIGINT))
) AS t(trace_id, action_type, source, source_secondary, destination,
       destination_secondary, asset, amount_bi, success, n_tx,
       start_lt, end_lt)
ORDER BY trace_id, action_type
"""


@register(
    "classify_actions",
    oracle=_ACTIONS_ORACLE,
    survey_ops=("C1", "C2", "C3", "C4", "C5"),
    description="full classify pipeline over golden fixture traces",
)
def classify_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _classified(spark)
    return (
        res.actions.select(
            "trace_id",
            F.col("type").alias("action_type"),
            "source",
            "source_secondary",
            "destination",
            "destination_secondary",
            "asset",
            F.coalesce(F.col("amount"), F.col("value"))
            .cast("long").alias("amount_bi"),
            "success",
            F.size("tx_hashes").alias("n_tx"),
            "start_lt",
            "end_lt",
        )
        .orderBy("trace_id", "action_type")
    )


_STATES_ORACLE = """
SELECT * FROM (VALUES
  ('gt1', 'ok', CAST(NULL AS VARCHAR)),
  ('gt2', 'ok', CAST(NULL AS VARCHAR)),
  ('gt3', 'ok', CAST(NULL AS VARCHAR)),
  ('gt4', 'skipped', 'big_trace_cutoff: 6 txs')
) AS t(trace_id, classification_state, failure_reason)
ORDER BY trace_id
"""


@register(
    "classify_states",
    oracle=_STATES_ORACLE,
    survey_ops=("C5",),
    description="per-trace classification_state incl. cutoff skip",
)
def classify_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _classified(spark)
    return res.classification_states.select(
        "trace_id",
        "classification_state",
        # reason is deterministic text for the cutoff case, null otherwise
        "failure_reason",
    ).orderBy("trace_id")


_ACCOUNTS_ORACLE = f"""
SELECT * FROM (VALUES
  ('gt1', 'ton_transfer', '{ACC[0]}'),
  ('gt1', 'ton_transfer', '{ACC[1]}'),
  ('gt2', 'jetton_transfer', '{ACC[0]}'),
  ('gt2', 'jetton_transfer', '{ACC[1]}'),
  ('gt2', 'jetton_transfer', '{W1}'),
  ('gt2', 'jetton_transfer', '{W2}'),
  ('gt3', 'call_contract', '{ACC[2]}'),
  ('gt3', 'call_contract', '{ACC[3]}')
) AS t(trace_id, action_type, account)
ORDER BY trace_id, action_type, account
"""


def _failed_external_fixture(spark: SparkSession):
    """One lone aborted external wallet tx per wallet layout — the C10
    failed-external recovery path (reference try_process_unknown_event,
    event_processing.py:340-362): the signed body's embedded transfer is
    recovered as a success=False ghost action."""
    from ton_indexer_spark.classifier import classify_traces
    from ton_indexer_spark.functions.boc import (
        encode_comment,
        encode_jetton_transfer,
        parse_boc,
    )
    from ton_indexer_spark.functions.externals import encode_wallet_external
    from ton_indexer_spark.functions.tx_parse import encode_message_cell

    wallet, dest, jdest = ACC[0], ACC[1], ACC[2]
    inner = encode_message_cell(
        None, dest, value=17_192_063, created_lt=0, created_at=0,
        body=parse_boc(encode_comment("gate ghost")),
    )
    v3_body = encode_wallet_external([inner], wallet="v3")
    jt_inner = encode_message_cell(
        None, dest, value=10**8, created_lt=0, created_at=0,
        body=parse_boc(encode_jetton_transfer(
            query_id=9, amount=555, destination=jdest, response=wallet)),
    )
    v4_body = encode_wallet_external([jt_inner], wallet="v4")

    txs, msgs, bodies = [], [], []
    for tid, acct, lt, body in (("gf1", wallet, 100, v3_body),
                                ("gf2", wallet, 200, v4_body)):
        txs.append((f"{tid}-tx1", acct, lt, 1_700_000_000 + lt, True,
                    "active", "active", tid))
        bodies.append((f"bh-{tid}", body))
        msgs.append((tid, f"{tid}-tx1", lt, f"{tid}-m1", "in", None, acct,
                     None, None, lt - 2, f"bh-{tid}"))
    return classify_traces(
        spark.createDataFrame(txs, _TX_SCHEMA),
        spark.createDataFrame(msgs, _MSG_SCHEMA),
        spark.createDataFrame(bodies, "hash string, body string"),
    )


_FAILED_EXT_ORACLE = f"""
SELECT * FROM (VALUES
  ('gf1', 'ton_transfer', '{ACC[0]}', '{ACC[1]}',
   CAST(17192063 AS BIGINT), FALSE, 'gate ghost'),
  ('gf2', 'jetton_transfer', '{ACC[0]}', '{ACC[2]}',
   CAST(555 AS BIGINT), FALSE, CAST(NULL AS VARCHAR))
) AS t(trace_id, action_type, source, destination, amount_bi, success,
       content)
ORDER BY trace_id
"""


@register(
    "classify_failed_external",
    oracle=_FAILED_EXT_ORACLE,
    survey_ops=("C9", "C10", "F2"),
    description="failed-external recovery: lone aborted wallet externals "
    "classify from the signed BOC body (v3/v4 layouts) into success=False "
    "ghost actions — exercises the real cell codec + postprocess path",
)
def classify_failed_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _failed_external_fixture(spark)
    return (
        res.actions.select(
            "trace_id",
            F.col("type").alias("action_type"),
            "source",
            "destination",
            F.coalesce(F.col("amount"), F.col("value"))
            .cast("long").alias("amount_bi"),
            "success",
            F.col("ton_transfer_data")["content"].alias("content"),
        )
        .orderBy("trace_id")
    )


@register(
    "classify_action_accounts",
    oracle=_ACCOUNTS_ORACLE,
    survey_ops=("J6",),
    description="pre-exploded action_accounts off classify output",
)
def classify_action_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = _classified(spark)
    acts = res.actions.select(
        "action_id", "trace_id", F.col("type").alias("action_type")
    )
    return (
        res.action_accounts.join(acts, ["action_id", "trace_id"])
        .select("trace_id", "action_type", "account")
        .orderBy("trace_id", "action_type", "account")
    )


def _pending_fixture(spark: SparkSession):
    """Inline pending-overlay store: two live pending traces + one tx
    whose in-message "already landed" — exercised through the real
    pendingTransactions/pendingTraces plans (plans/pending.py).  The
    Catalog points at the driver's TPC-H dir, which has no finalized
    TON tables, so the finalized-shadowing joins pass through — their
    semantics are pinned by tests/test_pending_api.py over a TON fixture.
    """
    tx_cols = ("account string, hash string, lt long, trace_id string, "
               "now long, orig_status string, end_status string, "
               "aborted boolean, finality string")
    msg_cols = ("tx_hash string, tx_lt long, tx_now long, msg_hash string, "
                "direction string, trace_id string, source string, "
                "destination string, value long, created_lt long, "
                "opcode long, body string, finality string")
    acct, other = ACC[0], ACC[1]
    txs = spark.createDataFrame([
        (acct, "pp1-a", 100, "pp1", 5100, "active", "active", False, "pending"),
        (other, "pp1-b", 110, "pp1", 5110, "active", "active", False, "pending"),
        (other, "pp2-a", 200, "pp2", 5200, "active", "active", False, "pending"),
    ], tx_cols)
    msgs = spark.createDataFrame([
        ("pp1-a", 100, 5100, "ext1", "in", "pp1", None, acct, 7, 98, 0,
         None, "pending"),
        ("pp1-a", 100, 5100, "pp1-m1", "out", "pp1", acct, other, 3, 101,
         0, None, "pending"),
        ("pp1-b", 110, 5110, "pp1-m1", "in", "pp1", acct, other, 3, 101,
         0, None, "pending"),
        ("pp2-a", 200, 5200, "ext2", "in", "pp2", None, other, 9, 198, 0,
         None, "pending"),
    ], msg_cols)
    return txs, msgs


# account scope returns only the requested account's own transactions
# (FilterTransactionsByAccounts, pending.go:292-316) — pp1-b belongs to
# another account and is excluded even though its trace matches
_PENDING_TXS_ORACLE = f"""
SELECT * FROM (VALUES
  ('pp1', 'pp1-a', '{ACC[0]}', CAST(100 AS BIGINT), 'ext1', 1, 'pending')
) AS t(trace_id, hash, account, lt, in_msg_hash, n_out, finality)
ORDER BY trace_id, lt, hash
"""


@register(
    "pending_transactions_route",
    oracle=_PENDING_TXS_ORACLE,
    survey_ops=("S5", "T6"),
    description="pendingTransactions route: trace-level account scoping "
    "over the emulated overlay, txs hydrated with in_msg + ordered "
    "out_msgs (plans/pending.py vs crud_pending.go:200-252)",
)
def pending_transactions_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.plans.pending import pending_transactions_query

    txs, msgs = _pending_fixture(spark)
    got = pending_transactions_query(
        Catalog(spark, sf_dir), txs, msgs, account=ACC[0]
    )
    return got.select(
        "trace_id", "hash", "account", "lt",
        F.col("in_msg")["msg_hash"].alias("in_msg_hash"),
        F.size(F.coalesce("out_msgs", F.array())).alias("n_out"),
        "finality",
    ).orderBy("trace_id", "lt", "hash")


_PENDING_TRACES_ORACLE = """
SELECT * FROM (VALUES
  ('pp2', 'ext2', CAST(200 AS BIGINT), CAST(200 AS BIGINT),
   CAST(1 AS BIGINT), 'pending')
) AS t(trace_id, external_hash, start_lt, end_lt, transactions_count,
       trace_state)
ORDER BY trace_id
"""


@register(
    "pending_traces_route",
    oracle=_PENDING_TRACES_ORACLE,
    survey_ops=("S5", "T6"),
    description="pendingTraces route: ext_msg_hash scoping + trace "
    "aggregation over the overlay (crud_pending.go:300-376)",
)
def pending_traces_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.plans.pending import pending_traces_query

    txs, msgs = _pending_fixture(spark)
    got = pending_traces_query(
        Catalog(spark, sf_dir), txs, msgs, ext_msg_hash="ext2"
    )
    return got.select(
        "trace_id", "external_hash", "start_lt", "end_lt",
        "transactions_count", "trace_state",
    ).orderBy("trace_id")
