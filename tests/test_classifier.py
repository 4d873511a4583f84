"""Golden-output classifier tests (reference test strategy, SURVEY.md §5:
per-trace expected action lists — indexer/tests/test_cases/*.yaml analog,
here as inline expectations over hand-built traces)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from ton_indexer_spark.classifier.matchers import (
    BURN_NOTIFY,
    EXCESSES,
    JETTON_BURN,
    JETTON_INTERNAL,
    JETTON_NOTIFY,
    JETTON_TRANSFER,
    MULTISIG_NEW_ORDER,
    NFT_DISCOVERY,
    NFT_REPORT_STATIC,
    NFT_TRANSFER,
    OWNERSHIP_ASSIGNED,
    POOL_WITHDRAWAL,
    STAKE_WITHDRAW_OP,
    UNSUBSCRIBE_OP,
    VESTING_ADD_WHITELIST,
    VESTING_ADD_WHITELIST_RESP,
    VESTING_SEND,
    VESTING_SEND_RESP,
)

A = [f"0:{i:064x}" for i in range(10)]  # accounts
W1, W2, ITEM = "0:w1" + "0" * 60, "0:w2" + "0" * 60, "0:item" + "0" * 58


def body_of(payload: dict) -> str:
    return base64.b64encode(json.dumps(payload).encode()).decode()


class TraceBuilder:
    """Builds (transactions, messages) rows for one trace."""

    def __init__(self, trace_id="trace0"):
        self.trace_id = trace_id
        self.txs: list[dict] = []
        self.msgs: list[dict] = []
        self._lt = 100
        self._n = 0

    def tx(self, account, in_source, opcode=None, value=None, body=None,
           orig_status="active", end_status="active", aborted=False,
           in_msg_hash=None, no_in=False):
        self._lt += 10
        self._n += 1
        h = f"{self.trace_id}-tx{self._n}"
        self.txs.append({
            "hash": h, "account": account, "lt": self._lt, "now": 1000 + self._lt,
            "aborted": aborted, "orig_status": orig_status,
            "end_status": end_status,
        })
        if no_in:  # tick-tock system transactions consume no message
            return h
        mh = in_msg_hash or f"{self.trace_id}-m{self._n}"
        self.msgs.append({
            "trace_id": self.trace_id, "tx_hash": h, "tx_lt": self._lt,
            "msg_hash": mh, "direction": "in", "source": in_source,
            "destination": account, "value": value, "opcode": opcode,
            "created_lt": self._lt - 2,
            "body_hash": f"bh-{mh}" if body else None,
        })
        if body:
            self.bodies = getattr(self, "bodies", [])
            self.bodies.append({"hash": f"bh-{mh}", "body": body})
        return h

    def out(self, tx_hash, destination, opcode=None, value=None, body=None):
        """Emit an out message from tx_hash; returns msg_hash for linking."""
        tx = next(t for t in self.txs if t["hash"] == tx_hash)
        mh = f"{self.trace_id}-om{len(self.msgs)}"
        self.msgs.append({
            "trace_id": self.trace_id, "tx_hash": tx_hash, "tx_lt": tx["lt"],
            "msg_hash": mh, "direction": "out", "source": tx["account"],
            "destination": destination, "value": value, "opcode": opcode,
            "created_lt": tx["lt"] + 1,
            "body_hash": f"bh-{mh}" if body else None,
        })
        if body:
            self.bodies = getattr(self, "bodies", [])
            self.bodies.append({"hash": f"bh-{mh}", "body": body})
        return mh

    def chain(self, tx_hash, account, opcode=None, value=None, body=None,
              **tx_kw):
        """out-msg from tx_hash consumed by a new tx at `account`."""
        src = next(t for t in self.txs if t["hash"] == tx_hash)["account"]
        mh = self.out(tx_hash, account, opcode=opcode, value=value, body=body)
        return self.tx(account, src, opcode=opcode, value=value, body=body,
                       in_msg_hash=mh, **tx_kw)


def build_dfs(spark, builders):
    """(transactions, messages, bodies) DataFrames from TraceBuilders."""
    txs = [t for b in builders for t in b.txs]
    msgs = [m for b in builders for m in b.msgs]
    bodies = list(
        {x["hash"]: x for b in builders for x in getattr(b, "bodies", [])}.values()
    )
    tx_schema = ("hash string, account string, lt long, now long, "
                 "aborted boolean, orig_status string, end_status string, "
                 "trace_id string")
    msg_schema = ("trace_id string, tx_hash string, tx_lt long, "
                  "msg_hash string, direction string, source string, "
                  "destination string, value long, opcode long, "
                  "created_lt long, body_hash string")
    txs_df = spark.createDataFrame([tuple(t[k] for k in (
        "hash", "account", "lt", "now", "aborted", "orig_status",
        "end_status")) + (t["hash"].rsplit("-tx", 1)[0],) for t in txs],
        tx_schema)
    msgs_df = spark.createDataFrame([tuple(m[k] for k in (
        "trace_id", "tx_hash", "tx_lt", "msg_hash", "direction", "source",
        "destination", "value", "opcode", "created_lt", "body_hash"))
        for m in msgs], msg_schema)
    bodies_df = spark.createDataFrame(
        [(x["hash"], x["body"]) for x in bodies], "hash string, body string"
    ) if bodies else spark.createDataFrame([], "hash string, body string")
    return txs_df, msgs_df, bodies_df


def run(spark, builders, jetton_wallets=None, nft_items=None,
        dex_pools=None, multisig=None, auctions=None, nft_sales=None,
        dns_items=None, big_trace_cutoff=4000):
    from ton_indexer_spark.classifier import classify_traces

    txs_df, msgs_df, bodies_df = build_dfs(spark, builders)
    jw = spark.createDataFrame(
        [(w["address"], w["owner"], w["jetton"]) for w in jetton_wallets],
        "address string, owner string, jetton string",
    ) if jetton_wallets else None
    ni = spark.createDataFrame(
        [(n["address"],) for n in nft_items], "address string"
    ) if nft_items else None
    dp = spark.createDataFrame(
        [(p["address"], p["dex"]) for p in dex_pools],
        "address string, dex string",
    ) if dex_pools else None
    ms = spark.createDataFrame(
        [(m["address"],) for m in multisig], "address string"
    ) if multisig else None
    au = spark.createDataFrame(
        [(a["address"],) for a in auctions], "address string"
    ) if auctions else None
    ns = spark.createDataFrame(
        [(s["address"], s["nft_address"]) for s in nft_sales],
        "address string, nft_address string",
    ) if nft_sales else None
    di = spark.createDataFrame(
        [(d["address"],) for d in dns_items], "address string"
    ) if dns_items else None
    return classify_traces(
        txs_df, msgs_df, bodies_df,
        jetton_wallets=jw, nft_items=ni, dns_items=di, dex_pools=dp,
        multisig=ms, auctions=au, nft_sales=ns,
        big_trace_cutoff=big_trace_cutoff)


def acts_of(result, trace_id):
    return sorted(
        (r.asDict(recursive=True) for r in result.actions.filter(
            F.col("trace_id") == trace_id).collect()),
        key=lambda a: a["start_lt"],
    )


def test_ton_transfer_and_call(spark):
    b = TraceBuilder("t1")
    root = b.tx(A[0], None)                      # external root
    b.chain(root, A[1], opcode=0, value=10**9,   # simple value transfer
            body=body_of({"comment": "hello ton"}))
    b2 = TraceBuilder("t2")
    r2 = b2.tx(A[2], None)
    b2.chain(r2, A[3], opcode=0x12345678, value=5)  # contract call

    res = run(spark, [b, b2])
    a1 = acts_of(res, "t1")
    assert [a["type"] for a in a1] == ["ton_transfer"]
    assert a1[0]["source"] == A[0] and a1[0]["destination"] == A[1]
    assert a1[0]["value"] == 10**9 and a1[0]["asset"] == "TON"
    assert a1[0]["ton_transfer_data"]["content"] == "hello ton"
    assert a1[0]["ton_transfer_data"]["encrypted"] is False
    a2 = acts_of(res, "t2")
    assert [a["type"] for a in a2] == ["call_contract"]
    states = {r["trace_id"]: r["classification_state"]
              for r in res.classification_states.collect()}
    assert states == {"t1": "ok", "t2": "ok"}


def test_jetton_transfer_chain(spark):
    b = TraceBuilder("j1")
    root = b.tx(A[0], None)  # owner wallet-contract tx (external root)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 5000, "destination": A[1]}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    b.chain(w2, A[1], opcode=JETTON_NOTIFY)   # notify new owner
    b.chain(w2, A[0], opcode=EXCESSES)        # excesses back

    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
        {"address": W2, "owner": A[1], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "j1")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    a = acts[0]
    assert a["source"] == A[0]
    assert a["source_secondary"] == W1
    assert a["destination"] == A[1]
    assert a["destination_secondary"] == W2
    assert a["asset"] == "0:jetton1"
    assert a["amount"] == 5000
    assert len(a["tx_hashes"]) == 5  # initiator, W1, W2, notify, excesses


def test_jetton_transfer_fallback_no_internal_leg(spark):
    """Transfer request that never spawned the internal-transfer leg still
    classifies as jetton_transfer with has_internal_transfer=False
    (FallbackJettonTransferBlockMatcher, blocks/jettons.py:282-330)."""
    b = TraceBuilder("jf1")
    root = b.tx(A[0], None)
    b.chain(root, W1, opcode=JETTON_TRANSFER,
            body=body_of({"amount": 700, "destination": A[1]}))

    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "jf1")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    a = acts[0]
    assert a["source"] == A[0]
    assert a["source_secondary"] == W1
    assert a["destination"] == A[1]
    assert a["destination_secondary"] is None
    assert a["asset"] == "0:jetton1"
    assert a["amount"] == 700
    assert a["jetton_transfer_data"]["has_internal_transfer"] is False


def test_jetton_transfer_fallback_requires_decodable_body(spark):
    """Opcode collision guard: a 0x0f8a7ea5 message whose body does not
    decode as a transfer (no amount/destination) must NOT classify as
    jetton_transfer, even when no wallet interfaces are hydrated —
    mirrors the reference aborting the match when JettonTransfer(body)
    raises (blocks/jettons.py:292)."""
    b = TraceBuilder("jf2")
    root = b.tx(A[0], None)
    b.chain(root, A[1], opcode=JETTON_TRANSFER)  # no body at all

    res = run(spark, [b])  # no jetton_wallets context
    acts = acts_of(res, "jf2")
    assert "jetton_transfer" not in [a["type"] for a in acts]


def test_jetton_swap_multi_hop(spark):
    """A → B → C through two pools: one swap action, two peer_swaps hops,
    four child transfer legs."""
    P1, P2 = "0:p1" + "0" * 60, "0:p2" + "0" * 60
    WA1, WA2 = "0:wa1" + "0" * 59, "0:wa2" + "0" * 59
    WB1, WB2 = "0:wb1" + "0" * 59, "0:wb2" + "0" * 59
    WC1, WC2 = "0:wc1" + "0" * 59, "0:wc2" + "0" * 59
    b = TraceBuilder("mh1")
    root = b.tx(A[0], None)
    # leg 1: user's tokA → pool1
    wa1 = b.chain(root, WA1, opcode=JETTON_TRANSFER, body=body_of({"amount": 100}))
    wa2 = b.chain(wa1, WA2, opcode=JETTON_INTERNAL)
    p1 = b.chain(wa2, P1, opcode=JETTON_NOTIFY)
    # leg 2: pool1's tokB → pool2
    wb1 = b.chain(p1, WB1, opcode=JETTON_TRANSFER, body=body_of({"amount": 90}))
    wb2 = b.chain(wb1, WB2, opcode=JETTON_INTERNAL)
    p2 = b.chain(wb2, P2, opcode=JETTON_NOTIFY)
    # leg 3: pool2's tokC → user
    wc1 = b.chain(p2, WC1, opcode=JETTON_TRANSFER, body=body_of({"amount": 80}))
    wc2 = b.chain(wc1, WC2, opcode=JETTON_INTERNAL)
    b.chain(wc2, A[0], opcode=JETTON_NOTIFY)

    res = run(
        spark, [b],
        jetton_wallets=[
            {"address": WA1, "owner": A[0], "jetton": "0:tokA"},
            {"address": WA2, "owner": P1, "jetton": "0:tokA"},
            {"address": WB1, "owner": P1, "jetton": "0:tokB"},
            {"address": WB2, "owner": P2, "jetton": "0:tokB"},
            {"address": WC1, "owner": P2, "jetton": "0:tokC"},
            {"address": WC2, "owner": A[0], "jetton": "0:tokC"},
        ],
        dex_pools=[{"address": P1, "dex": "stonfi"}, {"address": P2, "dex": "stonfi"}],
    )
    acts = acts_of(res, "mh1")
    assert [a["type"] for a in acts if a["parent_action_id"] is None] == ["jetton_swap"]
    swap = next(a for a in acts if a["type"] == "jetton_swap")
    sd = swap["jetton_swap_data"]
    assert sd["asset_in"] == "0:tokA" and sd["asset_out"] == "0:tokC"
    assert sd["amount_in"] == 100 and sd["amount_out"] == 80
    assert [p["asset_out"] for p in sd["peer_swaps"]] == ["0:tokB", "0:tokC"]
    children = [a for a in acts if a["parent_action_id"] == swap["action_id"]]
    assert len(children) == 3  # one transfer leg per hop segment


def test_jetton_burn(spark):
    b = TraceBuilder("burn1")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_BURN, body=body_of({"amount": 77}))
    b.chain(w1, "0:master" + "0" * 56, opcode=BURN_NOTIFY)
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "burn1")
    assert [a["type"] for a in acts] == ["jetton_burn"]
    assert acts[0]["amount"] == 77 and acts[0]["asset"] == "0:jetton1"
    assert len(acts[0]["tx_hashes"]) == 3


def test_nft_transfer(spark):
    b = TraceBuilder("n1")
    root = b.tx(A[0], None)
    item = b.chain(root, ITEM, opcode=NFT_TRANSFER,
                   body=body_of({"new_owner": A[2]}))
    b.chain(item, A[2], opcode=OWNERSHIP_ASSIGNED)
    res = run(spark, [b], nft_items=[{"address": ITEM}])
    acts = acts_of(res, "n1")
    assert [a["type"] for a in acts] == ["nft_transfer"]
    assert acts[0]["destination"] == A[2]
    assert acts[0]["asset_secondary"] == ITEM


def test_jetton_swap_two_legs(spark):
    """user → W1 → W2(pool wallet) → notify POOL → pool sends W3 → W4 →
    notify user: one jetton_swap action with nested payload struct."""
    POOL = "0:pool" + "0" * 58
    W3, W4 = "0:w3" + "0" * 60, "0:w4" + "0" * 60
    b = TraceBuilder("s1")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 1000}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    pool = b.chain(w2, POOL, opcode=JETTON_NOTIFY)
    # pool reacts: transfer of token B back to the user
    w3 = b.chain(pool, W3, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 950}))
    w4 = b.chain(w3, W4, opcode=JETTON_INTERNAL)
    b.chain(w4, A[0], opcode=JETTON_NOTIFY)

    res = run(
        spark, [b],
        jetton_wallets=[
            {"address": W1, "owner": A[0], "jetton": "0:tokA"},
            {"address": W2, "owner": POOL, "jetton": "0:tokA"},
            {"address": W3, "owner": POOL, "jetton": "0:tokB"},
            {"address": W4, "owner": A[0], "jetton": "0:tokB"},
        ],
        dex_pools=[{"address": POOL, "dex": "stonfi"}],
    )
    acts = acts_of(res, "s1")
    assert [a["type"] for a in acts] == [
        "jetton_swap", "jetton_transfer", "jetton_transfer"
    ]
    # the two transfer legs are children, ancestor-tagged for P7 suppression
    swap_id = acts[0]["action_id"]
    for child in acts[1:]:
        assert child["parent_action_id"] == swap_id
        assert child["ancestor_type"] == ["jetton_swap"]
    a = acts[0]
    assert a["parent_action_id"] is None
    assert a["source"] == A[0] and a["destination"] == A[0]
    assert a["asset"] == "0:tokA"
    sd = a["jetton_swap_data"]
    assert sd["dex"] == "stonfi"
    assert sd["amount_in"] == 1000 and sd["asset_in"] == "0:tokA"
    assert sd["amount_out"] == 950 and sd["asset_out"] == "0:tokB"
    assert sd["peer_address"] == POOL
    assert sd["peer_swaps"] == [
        {"asset_in": "0:tokA", "amount_in": 1000,
         "asset_out": "0:tokB", "amount_out": 950}
    ]
    # nested dex_transfer_details twins (migrate.cpp:86,92)
    inc, out = sd["dex_incoming_transfer"], sd["dex_outgoing_transfer"]
    assert inc["amount"] == 1000 and inc["asset"] == "0:tokA"
    assert inc["source"] == A[0] and inc["destination"] == POOL
    assert inc["source_jetton_wallet"] == W1
    assert inc["destination_jetton_wallet"] == W2
    assert out["amount"] == 950 and out["asset"] == "0:tokB"
    assert out["source"] == POOL and out["destination"] == A[0]
    assert out["source_jetton_wallet"] == W3
    assert out["destination_jetton_wallet"] == W4
    assert sd["sender"] == A[0]
    assert len(a["tx_hashes"]) == 7  # initiator + both 3-node legs (pool node shared)


def test_multisig_create_order(spark):
    MS = "0:msig" + "0" * 58
    b = TraceBuilder("m1")
    root = b.tx(A[0], None)
    ms = b.chain(root, MS, opcode=MULTISIG_NEW_ORDER)
    b.chain(ms, A[7], opcode=0x11, orig_status="uninit")  # order deploy leg
    res = run(spark, [b], multisig=[{"address": MS}])
    acts = acts_of(res, "m1")
    # the order-contract deploy is unwound into its own action next to the
    # multisig action (postprocess.unwind_deployments — reference
    # event_processing.py:196-207)
    assert [a["type"] for a in acts] == ["multisig_create_order",
                                         "contract_deploy"]
    assert len(acts[0]["tx_hashes"]) == 3


def test_contract_deploy_and_unknown(spark):
    b = TraceBuilder("d1")
    root = b.tx(A[0], None)
    b.chain(root, A[4], opcode=0x11, orig_status="uninit")  # deploy
    b2 = TraceBuilder("u1")
    r2 = b2.tx(A[5], None)
    b2.chain(r2, A[6], opcode=None, value=0)  # nothing matches → unknown
    res = run(spark, [b, b2])
    assert [a["type"] for a in acts_of(res, "d1")] == ["contract_deploy"]
    assert [a["type"] for a in acts_of(res, "u1")] == ["unknown"]


def test_big_trace_skipped(spark):
    b = TraceBuilder("big1")
    root = b.tx(A[0], None)
    cur = root
    for _ in range(5):
        cur = b.chain(cur, A[1], opcode=0, value=1)
    res = run(spark, [b], big_trace_cutoff=3)
    states = {r["trace_id"]: r["classification_state"]
              for r in res.classification_states.collect()}
    assert states["big1"] == "skipped"
    assert res.actions.count() == 0


def test_tick_tock_and_stake(spark):
    from ton_indexer_spark.classifier.matchers import STAKE_DEPOSIT_OP

    b = TraceBuilder("tt1")
    b.tx("-1:" + "e" * 64, None, no_in=True)  # system tx, no in-message
    b2 = TraceBuilder("st1")
    r2 = b2.tx(A[0], None)
    pool_tx = b2.chain(r2, A[8], opcode=STAKE_DEPOSIT_OP, value=10**10)
    b2.chain(pool_tx, A[0], opcode=EXCESSES)
    res = run(spark, [b, b2])
    assert [a["type"] for a in acts_of(res, "tt1")] == ["tick_tock"]
    st = acts_of(res, "st1")
    assert [a["type"] for a in st] == ["stake_deposit"]
    assert len(st[0]["tx_hashes"]) == 3


def test_jetton_mint_from_master(spark):
    MASTER = "0:master" + "0" * 56
    b = TraceBuilder("jm1")
    root = b.tx(MASTER, None)
    w1 = b.chain(root, W1, opcode=JETTON_INTERNAL,
                 body=body_of({"amount": 31337}))
    b.chain(w1, A[1], opcode=JETTON_NOTIFY)
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[1], "jetton": MASTER},
    ])
    acts = acts_of(res, "jm1")
    assert [a["type"] for a in acts] == ["jetton_mint"]
    a = acts[0]
    assert a["amount"] == 31337 and a["asset"] == MASTER
    assert a["destination"] == A[1] and a["destination_secondary"] == W1


def test_nft_mint_and_auction_bid(spark):
    AUC = "0:auction" + "0" * 55
    b = TraceBuilder("nm1")
    root = b.tx(A[0], None)
    item_tx = b.chain(root, ITEM, opcode=0x1, orig_status="uninit")
    b.chain(item_tx, A[2], opcode=OWNERSHIP_ASSIGNED)
    b2 = TraceBuilder("ab1")
    r2 = b2.tx(A[3], None)
    b2.chain(r2, AUC, opcode=0, value=5 * 10**9)
    res = run(spark, [b, b2], nft_items=[{"address": ITEM}],
              auctions=[{"address": AUC}])
    nm = acts_of(res, "nm1")
    # the ownership notice classifies as its own nft_transfer next to the
    # mint (nft.py:299-345); single-node mint keeps its deploy folded
    assert sorted(a["type"] for a in nm) == ["nft_mint", "nft_transfer"]
    mint = next(a for a in nm if a["type"] == "nft_mint")
    assert mint["asset_secondary"] == ITEM and len(mint["tx_hashes"]) == 2
    ab = acts_of(res, "ab1")
    assert [a["type"] for a in ab] == ["auction_bid"]
    assert ab[0]["destination"] == AUC and ab[0]["value"] == 5 * 10**9


def test_dns_and_election(spark):
    from ton_indexer_spark.classifier.matchers import (
        CHANGE_DNS_OP,
        ELECTOR_NEW_STAKE,
        ELECTOR_RECOVER_STAKE,
    )

    b = TraceBuilder("dns1")
    r = b.tx(A[0], None)
    b.chain(r, A[5], opcode=CHANGE_DNS_OP, body=body_of({"value": "wallet=0:abc"}))
    b2 = TraceBuilder("dns2")
    r2 = b2.tx(A[0], None)
    b2.chain(r2, A[5], opcode=CHANGE_DNS_OP, body=body_of({"value": ""}))
    b3 = TraceBuilder("el1")
    r3 = b3.tx(A[6], None)
    el = b3.chain(r3, A[9], opcode=ELECTOR_NEW_STAKE, value=10**12)
    b3.chain(el, A[6], opcode=0x10)  # confirmation
    b4 = TraceBuilder("el2")
    r4 = b4.tx(A[6], None)
    b4.chain(r4, A[9], opcode=ELECTOR_RECOVER_STAKE)

    res = run(spark, [b, b2, b3, b4])
    assert [a["type"] for a in acts_of(res, "dns1")] == ["change_dns"]
    assert [a["type"] for a in acts_of(res, "dns2")] == ["delete_dns"]
    el_acts = acts_of(res, "el1")
    assert [a["type"] for a in el_acts] == ["election_deposit"]
    assert len(el_acts[0]["tx_hashes"]) == 3
    assert [a["type"] for a in acts_of(res, "el2")] == ["election_recover"]


def test_subscription_and_multisig_approve(spark):
    from ton_indexer_spark.classifier.matchers import (
        MULTISIG_APPROVE,
        MULTISIG_EXECUTE,
        SUBSCRIPTION_PAYMENT,
    )

    b = TraceBuilder("sub1")
    r = b.tx(A[0], None)
    w = b.chain(r, A[4], opcode=SUBSCRIPTION_PAYMENT)
    b.chain(w, A[5], opcode=0, value=10**8)  # payment leg to beneficiary
    from ton_indexer_spark.classifier.base import MULTISIG_APPROVE_ACCEPTED

    b2 = TraceBuilder("ma1")
    r2 = b2.tx(A[1], None)
    # signer → order contract; the order answers approve_accepted AND,
    # threshold reached, fires execute into the multisig — the reference
    # approve matcher requires the accepted/rejected answer
    # (multisig.py:178-189) and claims it into the action
    ms = b2.chain(r2, A[6], opcode=MULTISIG_APPROVE)
    b2.chain(ms, A[1], opcode=MULTISIG_APPROVE_ACCEPTED)
    b2.chain(ms, A[7], opcode=MULTISIG_EXECUTE)

    res = run(spark, [b, b2])
    sub = acts_of(res, "sub1")
    assert [a["type"] for a in sub] == ["subscribe"]
    assert sub[0]["destination"] == A[5] and len(sub[0]["tx_hashes"]) == 3
    ma = acts_of(res, "ma1")
    assert [a["type"] for a in ma] == ["multisig_approve", "multisig_execute"]
    approve = next(a for a in ma if a["type"] == "multisig_approve")
    assert approve["success"] is True  # accepted answer → success
    # approve node + claimed accepted leg + initiating tx (extended set)
    assert len(approve["tx_hashes"]) == 3
    assert sorted(approve["_claimed"] if "_claimed" in approve
                  else approve["tx_hashes"])  # non-empty


def test_nft_sale_lifecycle(spark):
    """put-on-sale (sale deploy) and fix-price purchase (value in → NFT out
    to buyer + payout legs) — the getgems marketplace flow."""
    SALE = "0:sale" + "0" * 58
    SELLER, BUYER, MARKET = A[3], A[4], A[7]

    b = TraceBuilder("ps1")
    r = b.tx(SELLER, None)
    b.chain(r, SALE, opcode=0x5, orig_status="uninit")  # sale deploy

    b2 = TraceBuilder("buy1")
    r2 = b2.tx(BUYER, None)
    sale_tx = b2.chain(r2, SALE, opcode=0, value=10**10)  # payment in
    item_tx = b2.chain(sale_tx, ITEM, opcode=NFT_TRANSFER,
                       body=body_of({"new_owner": BUYER}))
    b2.chain(item_tx, BUYER, opcode=OWNERSHIP_ASSIGNED)
    b2.chain(sale_tx, SELLER, opcode=0, value=9 * 10**9)   # seller payout
    b2.chain(sale_tx, MARKET, opcode=0, value=5 * 10**8)   # marketplace fee

    res = run(spark, [b, b2], nft_items=[{"address": ITEM}],
              nft_sales=[{"address": SALE, "nft_address": ITEM}])
    ps = acts_of(res, "ps1")
    assert [a["type"] for a in ps] == ["nft_put_on_sale"]
    assert ps[0]["asset"] == ITEM

    buy = acts_of(res, "buy1")
    # the purchase serializes as nft_transfer with is_purchase=true (the
    # reference keeps the transfer block; payout legs classify apart)
    assert sorted(a["type"] for a in buy) == [
        "nft_transfer", "ton_transfer", "ton_transfer",
    ]
    a = next(x for x in buy if x["type"] == "nft_transfer")
    assert a["source"] == SALE and a["destination"] == BUYER
    assert a["asset_secondary"] == ITEM
    assert a["nft_transfer_data"]["is_purchase"] is True
    assert len(a["tx_hashes"]) == 4  # initiator + sale, item, assigned


def test_classifier_feeds_actions_endpoint(spark):
    """Integration: classifier output + actions endpoint — child swap legs
    are suppressed when the parent type is requested (P7 over C5 output)."""
    import os
    import tempfile

    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.plans import actions_by_account

    POOL = "0:pool" + "0" * 58
    W3, W4 = "0:w3" + "0" * 60, "0:w4" + "0" * 60
    b = TraceBuilder("swapx")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER, body=body_of({"amount": 10}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    pool = b.chain(w2, POOL, opcode=JETTON_NOTIFY)
    w3 = b.chain(pool, W3, opcode=JETTON_TRANSFER, body=body_of({"amount": 9}))
    w4 = b.chain(w3, W4, opcode=JETTON_INTERNAL)
    b.chain(w4, A[0], opcode=JETTON_NOTIFY)
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:tokA"},
        {"address": W2, "owner": POOL, "jetton": "0:tokA"},
        {"address": W3, "owner": POOL, "jetton": "0:tokB"},
        {"address": W4, "owner": A[0], "jetton": "0:tokB"},
    ], dex_pools=[{"address": POOL, "dex": "stonfi"}])

    d = tempfile.mkdtemp()
    res.actions.withColumn("trace_end_lt", res.actions["end_lt"]) \
        .withColumn("trace_end_utime", res.actions["end_utime"]) \
        .withColumn("trace_mc_seqno_end", res.actions["end_lt"].cast("int")) \
        .write.parquet(os.path.join(d, "actions.parquet"))
    res.action_accounts.write.parquet(os.path.join(d, "action_accounts.parquet"))
    cat = Catalog(spark, d)

    all_types = [r["type"] for r in actions_by_account(cat, limit=10).collect()]
    assert sorted(all_types) == ["jetton_swap", "jetton_transfer", "jetton_transfer"]
    suppressed = [
        r["type"]
        for r in actions_by_account(
            cat, suppress_ancestor_types=["jetton_swap"], limit=10
        ).collect()
    ]
    assert suppressed == ["jetton_swap"]  # child legs hidden


def test_action_accounts_explode(spark):
    b = TraceBuilder("aa1")
    root = b.tx(A[0], None)
    b.chain(root, A[1], opcode=0, value=100)
    res = run(spark, [b])
    accs = sorted(r["account"] for r in res.action_accounts.collect())
    assert accs == sorted([A[0], A[1]])


def test_stake_withdraw(spark):
    """Withdraw request + payout leg = completed stake_withdrawal; a lone
    request (payout deferred past the trace) = stake_withdrawal_request."""
    POOL = "0:pool" + "0" * 58
    b = TraceBuilder("sw1")
    r = b.tx(A[0], None)
    p = b.chain(r, POOL, opcode=STAKE_WITHDRAW_OP)
    b.chain(p, A[0], opcode=POOL_WITHDRAWAL, value=7 * 10**9)
    b2 = TraceBuilder("sw2")
    r2 = b2.tx(A[1], None)
    b2.chain(r2, POOL, opcode=STAKE_WITHDRAW_OP)

    res = run(spark, [b, b2])
    a1 = acts_of(res, "sw1")
    assert [a["type"] for a in a1] == ["stake_withdrawal"]
    assert a1[0]["amount"] == 7 * 10**9
    assert a1[0]["destination"] == A[0]
    assert len(a1[0]["tx_hashes"]) == 3
    a2 = acts_of(res, "sw2")
    assert [a["type"] for a in a2] == ["stake_withdrawal_request"]


def test_vesting_and_unsubscribe(spark):
    """Vesting send_message claims only the request+ack; the forwarded inner
    message classifies as its own action (reference vesting semantics)."""
    VEST = "0:vest" + "0" * 58
    b = TraceBuilder("v1")
    r = b.tx(A[0], None)
    v = b.chain(r, VEST, opcode=VESTING_SEND)
    b.chain(v, A[0], opcode=VESTING_SEND_RESP)       # ack back to owner
    b.chain(v, A[5], opcode=0, value=10**9)          # forwarded message
    b2 = TraceBuilder("v2")
    r2 = b2.tx(A[1], None)
    v2 = b2.chain(r2, VEST, opcode=VESTING_ADD_WHITELIST)
    b2.chain(v2, A[1], opcode=VESTING_ADD_WHITELIST_RESP)
    b3 = TraceBuilder("u1")
    r3 = b3.tx(A[2], None)
    b3.chain(r3, A[6], opcode=UNSUBSCRIBE_OP)

    res = run(spark, [b, b2, b3])
    a1 = acts_of(res, "v1")
    assert [a["type"] for a in a1] == ["vesting_send_message", "ton_transfer"]
    assert len(a1[0]["tx_hashes"]) == 3
    assert a1[1]["source"] == VEST and a1[1]["destination"] == A[5]
    a2 = acts_of(res, "v2")
    assert [a["type"] for a in a2] == ["vesting_add_whitelist"]
    assert acts_of(res, "u1")[0]["type"] == "unsubscribe"


def test_nft_discovery(spark):
    b = TraceBuilder("nd1")
    r = b.tx(A[0], None)
    i = b.chain(r, ITEM, opcode=NFT_DISCOVERY)
    b.chain(i, A[0], opcode=NFT_REPORT_STATIC)
    res = run(spark, [b], nft_items=[{"address": ITEM}])
    acts = acts_of(res, "nd1")
    assert [a["type"] for a in acts] == ["nft_discovery"]
    assert acts[0]["asset"] == ITEM
    assert len(acts[0]["tx_hashes"]) == 3


def test_dex_liquidity(spark):
    """Provide-liquidity (jetton chain into pool → LP mint) and
    withdraw-liquidity (LP burn → pool pays out jetton + value legs)."""
    POOL = "0:pool" + "0" * 58
    LPW = "0:lpw" + "0" * 59
    b = TraceBuilder("dl1")
    r = b.tx(A[0], None)
    w1 = b.chain(r, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 1000}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    pool = b.chain(w2, POOL, opcode=JETTON_NOTIFY)
    lp = b.chain(pool, LPW, opcode=JETTON_INTERNAL)  # bare LP mint
    b.chain(lp, A[0], opcode=JETTON_NOTIFY)

    b2 = TraceBuilder("dl2")
    r2 = b2.tx(A[0], None)
    burn = b2.chain(r2, LPW, opcode=JETTON_BURN,
                    body=body_of({"amount": 500}))
    notif = b2.chain(burn, POOL, opcode=BURN_NOTIFY)
    w3 = b2.chain(notif, W2, opcode=JETTON_TRANSFER,
                  body=body_of({"amount": 400}))
    w4 = b2.chain(w3, W1, opcode=JETTON_INTERNAL)
    b2.chain(w4, A[0], opcode=JETTON_NOTIFY)
    b2.chain(notif, A[0], opcode=0, value=3 * 10**9)  # TON side payout

    res = run(
        spark, [b, b2],
        jetton_wallets=[
            {"address": W1, "owner": A[0], "jetton": "0:tokA"},
            {"address": W2, "owner": POOL, "jetton": "0:tokA"},
            {"address": LPW, "owner": A[0], "jetton": "0:lp"},
        ],
        dex_pools=[{"address": POOL, "dex": "stonfi"}],
    )
    d = acts_of(res, "dl1")
    assert [a["type"] for a in d] == ["dex_deposit_liquidity"]
    assert d[0]["asset"] == "0:tokA" and d[0]["amount"] == 1000
    assert d[0]["destination"] == POOL and d[0]["destination_secondary"] == LPW
    assert len(d[0]["tx_hashes"]) == 6
    w = acts_of(res, "dl2")
    assert [a["type"] for a in w] == ["dex_withdraw_liquidity"]
    assert w[0]["asset"] == "0:lp" and w[0]["amount"] == 500
    assert w[0]["source"] == A[0] and w[0]["destination"] == POOL
    assert len(w[0]["tx_hashes"]) == 7


def test_signed_opcode_normalization(spark):
    """Ingest sources may store opcodes as signed int32 (the reference's
    Postgres column); the tree normalizes via `opcode & 0xFFFFFFFF`
    (tree_utils.py:47 analog) so unsigned matcher constants still claim the
    legs.  0xD53276DB (excesses) as signed int32 is -718113061."""
    signed_excesses = EXCESSES - (1 << 32)
    assert signed_excesses == -718113061
    b = TraceBuilder("sg1")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 123, "destination": A[1]}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    b.chain(w2, A[1], opcode=JETTON_NOTIFY)
    b.chain(w2, A[0], opcode=signed_excesses)  # signed on the wire
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
        {"address": W2, "owner": A[1], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "sg1")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    assert len(acts[0]["tx_hashes"]) == 5  # initiator + excesses leg claimed, not stray


def test_deploy_in_first_transfer(spark):
    """A wallet deployed in the same transaction as its first incoming
    jetton internal-transfer still classifies the chain as jetton_transfer,
    with the deploy unwound into a separate contract_deploy action
    (reference: ContractDeploy child blocks never suppress the main action,
    basic_blocks.py:102, and are promoted to top-level actions by
    unwind_deployments, event_processing.py:196-207)."""
    b = TraceBuilder("dp1")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 42, "destination": A[1]}))
    # receiver wallet deployed by this very transfer (state_init attached)
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL, orig_status="uninit")
    b.chain(w2, A[1], opcode=JETTON_NOTIFY)
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
        {"address": W2, "owner": A[1], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "dp1")
    # wallet deploy rides along as an unwound contract_deploy action
    assert [a["type"] for a in acts] == ["jetton_transfer", "contract_deploy"]
    assert acts[0]["amount"] == 42


def test_nft_cancel_and_finish(spark):
    """Text-comment-driven sale/auction lifecycle: 'cancel' at a sale
    returns the item; 'finish' at an auction transfers + pays out."""
    SALE = "0:sale" + "0" * 58
    AUC = "0:auc" + "0" * 59
    b = TraceBuilder("c1")
    r = b.tx(A[3], None)
    s = b.chain(r, SALE, opcode=0, body=body_of({"comment": "cancel"}))
    item = b.chain(s, ITEM, opcode=NFT_TRANSFER,
                   body=body_of({"new_owner": A[3]}))
    b.chain(item, A[3], opcode=OWNERSHIP_ASSIGNED)

    b2 = TraceBuilder("f1")
    r2 = b2.tx(A[4], None)
    a_tx = b2.chain(r2, AUC, opcode=0, body=body_of({"comment": "finish"}))
    item2 = b2.chain(a_tx, ITEM, opcode=NFT_TRANSFER,
                     body=body_of({"new_owner": A[5]}))
    b2.chain(item2, A[5], opcode=OWNERSHIP_ASSIGNED)
    b2.chain(a_tx, A[4], opcode=0, value=8 * 10**9)  # seller payout

    res = run(spark, [b, b2], nft_items=[{"address": ITEM}],
              nft_sales=[{"address": SALE, "nft_address": ITEM}],
              auctions=[{"address": AUC}])
    c = acts_of(res, "c1")
    assert [a["type"] for a in c] == ["nft_cancel_sale"]
    assert c[0]["asset"] == ITEM and len(c[0]["tx_hashes"]) == 4
    f = acts_of(res, "f1")
    assert [a["type"] for a in f] == ["nft_finish_auction"]
    assert len(f[0]["tx_hashes"]) == 5


def test_decimal_amount_survives_uint128(spark):
    """Overflow policy pin (SURVEY §1.3): jetton amounts are uint256-range
    on chain and int64 silently overflows past 2^63 — the actions schema
    stores DECIMAL(38,0) (the reference's `numeric`, migrate.cpp:313-383)
    and a 2^100 amount must round-trip exactly."""
    big = 2 ** 100
    b = TraceBuilder("big1")
    root = b.tx(A[0], None)
    w1 = b.chain(root, W1, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": big, "destination": A[1]}))
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL)
    b.chain(w2, A[1], opcode=JETTON_NOTIFY)

    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
        {"address": W2, "owner": A[1], "jetton": "0:jetton1"},
    ])
    acts = acts_of(res, "big1")
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    assert int(acts[0]["amount"]) == big


def test_renew_dns_and_put_on_auction(spark):
    """renew_dns = change_dns_record with no value and the all-zero key
    (reference dns.py zero_key branch); a deploy of a known auction
    contract = nft_put_on_auction."""
    DNS_ITEM = "0:dns" + "0" * 59
    AUC = "0:auc" + "0" * 59

    b = TraceBuilder("rd1")
    r = b.tx(A[0], None)
    b.chain(r, DNS_ITEM, opcode=0x4EB1F0F9,
            body=body_of({"key": "0" * 64, "value": None}))

    b2 = TraceBuilder("pa1")
    r2 = b2.tx(A[1], None)
    b2.chain(r2, AUC, opcode=0x5, orig_status="uninit")

    res = run(spark, [b, b2], dns_items=[{"address": DNS_ITEM}],
              auctions=[{"address": AUC}])
    rd = acts_of(res, "rd1")
    assert [a["type"] for a in rd] == ["renew_dns"]
    pa = acts_of(res, "pa1")
    assert [a["type"] for a in pa] == ["nft_put_on_auction"]


def test_jetton_mint_entry_opcode_collision_rejected(spark):
    """A SUCCESSFUL call with opcode 0x15 whose body happens to decode an
    address must not classify as jetton_mint without the internal-transfer
    leg or dimension evidence (reference gates on the minter interface);
    with the jetton_wallets dimension hydrated, membership is
    authoritative even for legless failed calls."""
    from ton_indexer_spark.classifier.matchers import JETTON_MINT_MINTER
    from ton_indexer_spark.functions.boc import Builder

    NOT_MINTER, OTHER = A[5], A[6]
    # (query_id:uint64, addr, coins) — mint-shaped bits on a foreign op
    body_cell = (Builder().store_uint(JETTON_MINT_MINTER, 32)
                 .store_uint(7, 64).store_address(OTHER)
                 .store_coins(123).end_cell())
    import base64

    from ton_indexer_spark.functions.boc import serialize_boc

    b64 = base64.b64encode(serialize_boc(body_cell)).decode()

    b = TraceBuilder("jmcol1")
    r = b.tx(A[0], None)
    b.chain(r, NOT_MINTER, opcode=JETTON_MINT_MINTER, body=b64)
    res = run(spark, [b])
    types = [a["type"] for a in acts_of(res, "jmcol1")]
    assert "jetton_mint" not in types

    # ABORTED legless call: accepted as a failed mint EVEN with a
    # hydrated dimension — a failed mint's trace contains no jetton
    # wallet, so the trace-scoped masters set can never evidence it
    # (rejecting here would drop every legless failed mint whenever the
    # dimension is supplied)
    b2 = TraceBuilder("jmcol2")
    r2 = b2.tx(A[0], None)
    b2.chain(r2, NOT_MINTER, opcode=JETTON_MINT_MINTER, body=b64,
             aborted=True)
    MASTER = "0:feed" + "0" * 60
    res2 = run(spark, [b2], jetton_wallets=[
        {"address": A[7], "owner": A[8], "jetton": MASTER},
    ])
    acts2 = acts_of(res2, "jmcol2")
    assert [a["type"] for a in acts2] == ["jetton_mint"]
    assert acts2[0]["success"] is False
