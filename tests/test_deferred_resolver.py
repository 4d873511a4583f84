"""The deferred dimension point-lookup (classify.py post-pass): a matcher
may reference a jetton wallet that never transacts in its trace (the
reference awaits the interface repository there, swaps.py:1164-1180).
The tonco driver gates cover the a2 (failed-swap target) and dep2
(is_first provision) flag paths; this module pins the remaining two:
the dep1 side (second-asset entry leg) and the pTON-resolves-to-NULL
discipline."""

from __future__ import annotations

import base64

from tests.test_classifier import A, TraceBuilder, acts_of, body_of, run

ROUTER = "0:" + "b" * 63 + "9"
POOL = "0:" + "c" * 62 + "99"
ACCT = "0:" + "d" * 62 + "99"
UW, RW = "0:" + "a" * 62 + "91", "0:" + "a" * 62 + "92"
OTHER_W = "0:" + "a" * 62 + "93"
J_SECOND = "0:" + "e" * 62 + "91"
J_FIRST = "0:" + "e" * 62 + "92"
PTON_MASTER = (
    "0:8CDC1D7640AD5EE326527FC1AD0514F468B30DC84B0173F0E155F451B4E11F7C"
)


def _fund_payload_b64(other_wallet: str) -> str:
    from ton_indexer_spark.functions.boc import (
        encode_tonco_fund_payload,
        serialize_boc,
    )

    return base64.b64encode(
        serialize_boc(encode_tonco_fund_payload(other_wallet, 0, 500))
    ).decode()


def _deposit_trace(tid: str) -> TraceBuilder:
    from ton_indexer_spark.classifier.protocols import (
        TONCO_ADD_LIQUIDITY,
        TONCO_FUND_ACCOUNT,
    )
    from ton_indexer_spark.classifier.matchers import (
        JETTON_INTERNAL,
        JETTON_NOTIFY,
        JETTON_TRANSFER,
    )

    b = TraceBuilder(tid)
    root = b.tx(A[0], None)
    w1 = b.chain(root, UW, opcode=JETTON_TRANSFER,
                 body=body_of({"amount": 500, "destination": ROUTER}))
    w2 = b.chain(w1, RW, opcode=JETTON_INTERNAL)
    n = b.chain(w2, ROUTER, opcode=JETTON_NOTIFY,
                body=body_of({"amount": 500, "sender": A[0],
                              "forward_payload":
                              _fund_payload_b64(OTHER_W)}))
    f = b.chain(n, POOL, opcode=TONCO_FUND_ACCOUNT)
    # new_amount0 == 0 -> is_first=False: the entering leg is the pool's
    # SECOND asset, so the unresolved other wallet patches target_asset_1
    b.chain(f, ACCT, opcode=TONCO_ADD_LIQUIDITY,
            body=body_of({"new_amount0": 0, "new_amount1": 500,
                          "new_enough0": 111, "new_enough1": 500,
                          "tick_lower": -60, "tick_upper": 60}))
    return b


def test_deferred_resolver_patches_dep1_side(spark):
    """is_first=False: the payload's other wallet (absent from the trace)
    resolves through the post-classification point lookup into
    target_asset_1."""
    res = run(spark, [_deposit_trace("dr1")], jetton_wallets=[
        {"address": UW, "owner": A[0], "jetton": J_SECOND},
        {"address": RW, "owner": ROUTER, "jetton": J_SECOND},
        # the pair's other wallet exists ONLY in the dimension
        {"address": OTHER_W, "owner": ROUTER, "jetton": J_FIRST},
    ])
    acts = acts_of(res, "dr1")
    dep = next(a for a in acts if a["type"] == "dex_deposit_liquidity")
    d = dep["dex_deposit_liquidity_data"]
    assert d["target_asset_2"] == J_SECOND   # the entering leg's asset
    assert d["target_asset_1"] == J_FIRST    # deferred-resolved
    assert dep["asset2"] is None             # top-level untouched (dep1)


def test_deferred_resolver_pton_fills_null(spark):
    """A pTON-family other wallet resolves to TON = NULL asset — the
    _wallet_asset lookup discipline holds through the deferred path."""
    res = run(spark, [_deposit_trace("dr2")], jetton_wallets=[
        {"address": UW, "owner": A[0], "jetton": J_SECOND},
        {"address": RW, "owner": ROUTER, "jetton": J_SECOND},
        {"address": OTHER_W, "owner": ROUTER, "jetton": PTON_MASTER},
    ])
    acts = acts_of(res, "dr2")
    dep = next(a for a in acts if a["type"] == "dex_deposit_liquidity")
    d = dep["dex_deposit_liquidity_data"]
    assert d["target_asset_1"] is None       # pTON renders TON = NULL
    assert d["target_asset_2"] == J_SECOND


def test_deferred_resolver_unknown_wallet_stays_null(spark):
    """A wallet the dimension does not know stays NULL (no fabrication)."""
    res = run(spark, [_deposit_trace("dr3")], jetton_wallets=[
        {"address": UW, "owner": A[0], "jetton": J_SECOND},
        {"address": RW, "owner": ROUTER, "jetton": J_SECOND},
    ])
    acts = acts_of(res, "dr3")
    dep = next(a for a in acts if a["type"] == "dex_deposit_liquidity")
    assert dep["dex_deposit_liquidity_data"]["target_asset_1"] is None
