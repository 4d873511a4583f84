"""Golden tests for the trace post-processors (reference
``event_processing.py:304-307`` — ``post_process_dedust_liquidity`` +
``unwind_deployments``), run through the full Spark classification path."""

from __future__ import annotations

from test_classifier import A, TraceBuilder, acts_of, body_of, run

from ton_indexer_spark.classifier.protocols import (
    DEDUST_ASK_FACTORY,
    DEDUST_DEPLOY_DEPOSIT,
    DEDUST_DEPOSIT_TO_POOL,
    DEDUST_DEPOSIT_TON,
    DEDUST_TOPUP_DEPOSIT,
)
from ton_indexer_spark.classifier.base import (
    JETTON_INTERNAL,
    JETTON_NOTIFY,
    JETTON_TRANSFER,
)

USER = A[0]
VAULT_TON = "0:vton" + "0" * 59
VAULT_JET = "0:vjet" + "0" * 59
FACTORY = "0:factory" + "0" * 56
DC = "0:depositc" + "0" * 55
POOL = "0:pool" + "0" * 58
W_USER = "0:wuser" + "0" * 58   # user's jetton wallet
W_VAULT = "0:wvault" + "0" * 57  # vault's jetton wallet
LPW = "0:lpw" + "0" * 59
JET = "0:jetmaster" + "0" * 54

WALLETS = [
    {"address": W_USER, "owner": USER, "jetton": JET},
    {"address": W_VAULT, "owner": VAULT_JET, "jetton": JET},
]


def _ton_partial_leg(b, root):
    """user → TON vault (0xd55e4686) → factory ask → {deploy, top-up} —
    the first-asset deposit shape (liquidity.py:413-461)."""
    v = b.chain(root, VAULT_TON, opcode=DEDUST_DEPOSIT_TON, value=5 * 10**9,
                body=body_of({
                    "amount": 5000,
                    "asset0": "TON", "asset0_target_balance": 5000,
                    "asset1": JET, "asset1_target_balance": 7000,
                }))
    f = b.chain(v, FACTORY, opcode=DEDUST_ASK_FACTORY)
    b.chain(f, DC, opcode=DEDUST_DEPLOY_DEPOSIT,
            orig_status="nonexist")  # deploys the deposit contract
    b.chain(f, DC, opcode=DEDUST_TOPUP_DEPOSIT)
    return v


def _jetton_final_leg(b, root):
    """user wallet → internal → vault notify → top-up → deposit-to-pool →
    LP mint — the final (pool-triggering) deposit shape."""
    jt = b.chain(root, W_USER, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 7000, "destination": VAULT_JET}))
    it = b.chain(jt, W_VAULT, opcode=JETTON_INTERNAL,
                 body=body_of({"amount": 7000}))
    nt = b.chain(it, VAULT_JET, opcode=JETTON_NOTIFY,
                 body=body_of({"amount": 7000, "sender": USER}))
    tp = b.chain(nt, DC, opcode=DEDUST_TOPUP_DEPOSIT)
    pl = b.chain(tp, POOL, opcode=DEDUST_DEPOSIT_TO_POOL)
    b.chain(pl, LPW, opcode=JETTON_INTERNAL, body=body_of({"amount": 123}))
    return jt


def test_dedust_two_sided_deposit_merges(spark):
    """Partial (TON) + final (jetton) deposit legs in one trace collapse to
    a single dex_deposit_liquidity action keyed on the deposit contract
    (post_process_dedust_liquidity, liquidity.py:473-508)."""
    b = TraceBuilder("dd-merge")
    root = b.tx(USER, None)
    _ton_partial_leg(b, root)
    _jetton_final_leg(b, root)

    res = run(spark, [b], jetton_wallets=WALLETS)
    acts = acts_of(res, "dd-merge")
    deposits = [a for a in acts if a["type"] == "dex_deposit_liquidity"]
    assert len(deposits) == 1
    d = deposits[0]
    data = d["dex_deposit_liquidity_data"]
    assert data["dex"] == "dedust"
    # combine_deposits order: partial legs first, then final
    # TON renders as null in every asset column (_addr(Asset))
    assert data["asset1"] is None and data["amount1"] == 5000
    assert data["asset2"] == JET and data["amount2"] == 7000
    assert data["user_jetton_wallet_2"] == W_USER
    assert data["lp_tokens_minted"] == 123
    assert data["target_asset_1"] is None and data["target_amount_1"] == 5000
    assert data["target_asset_2"] == JET and data["target_amount_2"] == 7000
    # claimed span covers both entry legs (Block.merge_blocks analog)
    assert len(d["tx_hashes"]) >= 9
    # the deposit-contract deploy is unwound into its own action
    assert [a["type"] for a in acts if a["type"] == "contract_deploy"] \
        == ["contract_deploy"]


def test_dedust_partial_only_stays_partial(spark):
    """A first-asset deposit with no pool leg in the trace stays a single
    (unmerged) dex_deposit_liquidity action — the reference emits the
    DedustDepositLiquidityPartial block as a dex_deposit_liquidity action
    (block_tree_serializer.py:627-645)."""
    b = TraceBuilder("dd-part")
    root = b.tx(USER, None)
    _ton_partial_leg(b, root)

    res = run(spark, [b])
    acts = acts_of(res, "dd-part")
    deposits = [a for a in acts if a["type"] == "dex_deposit_liquidity"]
    assert len(deposits) == 1
    d = deposits[0]
    data = d["dex_deposit_liquidity_data"]
    assert data["asset1"] is None and data["amount1"] == 5000
    assert data["amount2"] is None and data["lp_tokens_minted"] is None
    assert d["destination_secondary"] == DC
    assert d["source"] == USER
    # deploy claimed into the partial action is still unwound
    assert sum(a["type"] == "contract_deploy" for a in acts) == 1


def test_dedust_ambiguous_contract_skips_merge(spark):
    """>2 deposits touching one deposit contract → merging is skipped
    wholesale (liquidity.py:486-489)."""
    b = TraceBuilder("dd-amb")
    root = b.tx(USER, None)
    _ton_partial_leg(b, root)
    _ton_partial_leg(b, root)          # duplicate partial on the same DC
    _jetton_final_leg(b, root)

    res = run(spark, [b], jetton_wallets=WALLETS)
    acts = acts_of(res, "dd-amb")
    deposits = [a for a in acts if a["type"] == "dex_deposit_liquidity"]
    assert len(deposits) == 3  # nothing merged


def test_unwind_keeps_single_node_deploy_fold(spark):
    """A standalone deploy still classifies as exactly one contract_deploy
    action (no double emission from the unwinding pass)."""
    b = TraceBuilder("dd-solo")
    root = b.tx(USER, None)
    b.chain(root, A[4], opcode=0x11, orig_status="uninit")

    res = run(spark, [b])
    acts = acts_of(res, "dd-solo")
    assert [a["type"] for a in acts] == ["contract_deploy"]


def test_dedust_partial_decodes_real_boc_body(spark):
    """The TON-side partial deposit decodes its vault body from a real
    BOC cell (TL-B decoder OP_DEDUST_DEPOSIT_TON) — target assets and
    balances come out of the cell reader, not the JSON fallback."""
    import base64

    from ton_indexer_spark.functions.boc import (
        OP_DEDUST_DEPOSIT_TON,
        Builder,
        serialize_boc,
        store_dedust_asset,
    )

    # store_dedust_asset needs a real hex account; the decoder renders
    # addresses uppercase (reference AccountId.as_str, ton_utils.py:94-97)
    HEXJET = "0:" + "AB" * 32
    params = (Builder().store_coins(1).store_coins(5000)
              .store_coins(7000).end_cell())
    dep = Builder().store_uint(OP_DEDUST_DEPOSIT_TON, 32).store_uint(9, 64)
    dep.store_coins(5000).store_bit(0)
    store_dedust_asset(dep, "TON")
    store_dedust_asset(dep, HEXJET)
    dep.store_ref(params)
    body = base64.b64encode(serialize_boc(dep.end_cell())).decode()

    b = TraceBuilder("dd-boc")
    root = b.tx(USER, None)
    v = b.chain(root, VAULT_TON, opcode=DEDUST_DEPOSIT_TON,
                value=5 * 10**9, body=body)
    f = b.chain(v, FACTORY, opcode=DEDUST_ASK_FACTORY)
    b.chain(f, DC, opcode=DEDUST_DEPLOY_DEPOSIT, orig_status="nonexist")
    b.chain(f, DC, opcode=DEDUST_TOPUP_DEPOSIT)

    res = run(spark, [b])
    acts = acts_of(res, "dd-boc")
    d = next(a for a in acts if a["type"] == "dex_deposit_liquidity")
    data = d["dex_deposit_liquidity_data"]
    assert data["amount1"] == 5000 and data["asset1"] is None
    assert data["target_asset_1"] is None  # TON renders null
    assert data["target_amount_1"] == 5000
    assert data["target_asset_2"] == HEXJET
    assert data["target_amount_2"] == 7000


def test_failed_external_recovers_intent(spark):
    """A lone failed external (wallet tx aborted, no children) classifies
    from the signed wallet body: the embedded transfer becomes a
    success=False ton_transfer / jetton_transfer instead of vanishing
    (reference try_process_unknown_event + externals.py wallet layouts —
    the 'Failed ton transfer (external-in only)' reference test case)."""
    from ton_indexer_spark.functions.boc import (
        encode_comment,
        encode_jetton_transfer,
        parse_boc,
    )
    from ton_indexer_spark.functions.externals import encode_wallet_external
    from ton_indexer_spark.functions.tx_parse import encode_message_cell

    WALLET = A[5]
    DEST = A[6]

    inner = encode_message_cell(
        None, DEST, value=17_192_063, created_lt=0, created_at=0,
        body=parse_boc(encode_comment("109872119")),
    )
    body = encode_wallet_external([inner], wallet="v3")
    b = TraceBuilder("fx1")
    b.tx(WALLET, None, body=body, aborted=True)

    jt_inner = encode_message_cell(
        None, DEST, value=10**8, created_lt=0, created_at=0,
        body=parse_boc(encode_jetton_transfer(
            query_id=9, amount=555, destination=A[7], response=WALLET)),
    )
    b2 = TraceBuilder("fx2")
    b2.tx(WALLET, None, body=encode_wallet_external([jt_inner], wallet="v4"),
          aborted=True)

    res = run(spark, [b, b2])
    tt = acts_of(res, "fx1")
    assert [a["type"] for a in tt] == ["ton_transfer"]
    assert tt[0]["success"] is False
    assert tt[0]["source"] == WALLET and tt[0]["destination"] == DEST
    assert tt[0]["value"] == 17_192_063
    assert tt[0]["ton_transfer_data"]["content"] == "109872119"

    jt = acts_of(res, "fx2")
    assert [a["type"] for a in jt] == ["jetton_transfer"]
    assert jt[0]["success"] is False and jt[0]["amount"] == 555
    assert jt[0]["destination"] == A[7]
    assert jt[0]["jetton_transfer_data"]["has_internal_transfer"] is False


def test_plain_external_without_wallet_body_stays_silent(spark):
    """A lone external whose body is not a known wallet layout keeps the
    old behavior: no action (the trace stays visible via the sentinel)."""
    b = TraceBuilder("fx3")
    b.tx(A[5], None, body=body_of({"whatever": 1}), aborted=True)
    res = run(spark, [b])
    assert acts_of(res, "fx3") == []


def test_successful_lone_external_recovers_ghost(spark):
    """A finalized single-tx external-only trace means the send never
    executed, aborted flag or not — the reference recovers the signed
    wallet body as failed ghost actions for ANY childless external
    (trace_processor.py:44-46 + try_process_unknown_event:340-348)."""
    from ton_indexer_spark.functions.boc import (
        encode_comment,
        parse_boc,
    )
    from ton_indexer_spark.functions.externals import encode_wallet_external
    from ton_indexer_spark.functions.tx_parse import encode_message_cell

    WALLET, DEST = A[5], A[6]
    inner = encode_message_cell(
        None, DEST, value=5_000_000, created_lt=0, created_at=0,
        body=parse_boc(encode_comment("in flight")),
    )
    b = TraceBuilder("okx1")
    b.tx(WALLET, None, body=encode_wallet_external([inner], wallet="v3"),
         aborted=False)
    res = run(spark, [b])
    acts = acts_of(res, "okx1")
    assert [a["type"] for a in acts] == ["ton_transfer"]
    assert acts[0]["success"] is False  # ghost: the send never landed
