"""BOC codec + TL-B decode tests (S2/F2).

Round-trips the pure-Python cell reader/writer, property-tests the bit
packing with hypothesis, and runs the jetton/NFT golden classifier flows
against REAL BOC-encoded message bodies (VERDICT round-1 item 5)."""

from __future__ import annotations

import base64

from hypothesis import given, settings
from hypothesis import strategies as st

from ton_indexer_spark.functions.boc import (
    Builder,
    Cell,
    decode_message_body,
    encode_comment,
    encode_jetton_burn,
    encode_jetton_internal,
    encode_jetton_transfer,
    encode_nft_transfer,
    parse_boc,
    serialize_boc,
)

ADDR_A = "0:" + "AB" * 32
ADDR_B = "-1:" + "CD" * 32


def roundtrip(cell: Cell) -> Cell:
    return parse_boc(serialize_boc(cell))


def test_empty_cell_roundtrip():
    c = roundtrip(Builder().end_cell())
    assert c.bits == 0 and c.refs == []


def test_unaligned_bits_roundtrip():
    # 13 bits — completion tag must be added and stripped exactly
    c = roundtrip(Builder().store_uint(0b1010110011011, 13).end_cell())
    assert c.bits == 13
    assert c.begin_parse().load_uint(13) == 0b1010110011011


def test_refs_and_tree_roundtrip():
    leaf = Builder().store_uint(7, 8).end_cell()
    mid = Builder().store_uint(1, 1).store_ref(leaf).end_cell()
    root = Builder().store_uint(0xDEAD, 16).store_ref(mid).store_ref(
        leaf
    ).end_cell()
    r = roundtrip(root)
    s = r.begin_parse()
    assert s.load_uint(16) == 0xDEAD
    m = s.load_ref().begin_parse()
    assert m.load_bit() == 1
    assert m.load_ref().begin_parse().load_uint(8) == 7
    assert s.load_ref().begin_parse().load_uint(8) == 7


def test_address_and_coins_roundtrip():
    cell = (
        Builder()
        .store_address(ADDR_A)
        .store_address(None)
        .store_address(ADDR_B)
        .store_coins(0)
        .store_coins(10**18)
        .end_cell()
    )
    s = roundtrip(cell).begin_parse()
    assert s.load_address() == ADDR_A
    assert s.load_address() is None
    assert s.load_address() == ADDR_B
    assert s.load_coins() == 0
    assert s.load_coins() == 10**18


def test_snake_string_spans_refs():
    long = "x" * 500  # > 1023 bits, must chain through refs
    cell = Builder().store_snake_string(long).end_cell()
    assert roundtrip(cell).begin_parse().load_snake_string() == long


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=1, max_value=64), st.data()),
        min_size=1,
        max_size=8,
    )
)
def test_uint_packing_property(vals):
    b = Builder()
    expect = []
    for n, data in vals:
        v = data.draw(st.integers(min_value=0, max_value=(1 << n) - 1))
        b.store_uint(v, n)
        expect.append((n, v))
    s = roundtrip(b.end_cell()).begin_parse()
    for n, v in expect:
        assert s.load_uint(n) == v
    assert s.remaining_bits == 0


def test_decode_comment():
    d = decode_message_body(encode_comment("hello ton"))
    assert d == {"comment": "hello ton", "is_encrypted": False}


def test_decode_jetton_transfer():
    b64 = encode_jetton_transfer(
        query_id=42, amount=5000, destination=ADDR_A, response=ADDR_B,
        forward_ton_amount=1, forward_comment="gift",
    )
    d = decode_message_body(b64)
    assert d["opcode"] == 0x0F8A7EA5
    assert d["query_id"] == 42
    assert d["amount"] == 5000
    assert d["destination"] == ADDR_A
    assert d["response_destination"] == ADDR_B
    assert d["forward_ton_amount"] == 1
    assert d["forward_comment"] == "gift"


def test_decode_jetton_internal_and_burn():
    d = decode_message_body(encode_jetton_internal(1, 777, ADDR_A))
    assert d["opcode"] == 0x178D4519 and d["amount"] == 777
    assert d["from"] == ADDR_A
    d = decode_message_body(encode_jetton_burn(2, 88, ADDR_B))
    assert d["opcode"] == 0x595F07BC and d["amount"] == 88


def test_decode_nft_transfer():
    d = decode_message_body(encode_nft_transfer(3, ADDR_A, ADDR_B, 5))
    assert d["opcode"] == 0x5FCC3D14
    assert d["new_owner"] == ADDR_A
    assert d["forward_amount"] == 5


def test_decode_change_dns():
    from ton_indexer_spark.functions.boc import encode_change_dns

    key = bytes(range(32))
    d = decode_message_body(encode_change_dns(5, key, ADDR_A))
    assert d["query_id"] == 5
    assert d["key"] == key.hex()
    assert d["value_schema"] == "DNSNextResolver"
    assert d["value"] == ADDR_A
    # no value ref = record deletion
    d2 = decode_message_body(encode_change_dns(6, key))
    assert d2["value"] is None
    # unknown record schema: the record exists, value must be non-empty
    # so the matcher does not misread the set as delete_dns
    d3 = decode_message_body(encode_change_dns(7, key, ADDR_A, schema=0x1234))
    assert d3["value"]


def test_decode_dedust_swap_entry():
    from ton_indexer_spark.functions.boc import encode_dedust_swap

    d = decode_message_body(encode_dedust_swap(9, 12345, ADDR_B, limit=111))
    assert d["query_id"] == 9
    assert d["amount"] == 12345
    assert d["pool"] == ADDR_B
    assert d["limit"] == 111


def test_garbage_degrades_to_empty():
    assert decode_message_body("not-base64!!") == {}
    assert decode_message_body(base64.b64encode(b"junkjunk").decode()) == {}


# ------------------------------------------------ classifier over BOC bodies


def test_jetton_transfer_chain_boc_bodies(spark):
    """The jetton-transfer golden flow with REAL BOC message bodies instead
    of the JSON stand-in: amount/destination come out of the cell reader."""
    from pyspark.sql import functions as F

    from tests.test_classifier import A, W1, W2, TraceBuilder, run
    from ton_indexer_spark.classifier.matchers import (
        EXCESSES,
        JETTON_INTERNAL,
        JETTON_NOTIFY,
        JETTON_TRANSFER,
    )

    b = TraceBuilder("boc1")
    root = b.tx(A[0], None)
    w1 = b.chain(
        root, W1, opcode=JETTON_TRANSFER,
        body=encode_jetton_transfer(7, 1234, A[1], A[0]),
    )
    w2 = b.chain(w1, W2, opcode=JETTON_INTERNAL,
                 body=encode_jetton_internal(7, 1234, A[0]))
    b.chain(w2, A[1], opcode=JETTON_NOTIFY)
    b.chain(w2, A[0], opcode=EXCESSES)
    res = run(spark, [b], jetton_wallets=[
        {"address": W1, "owner": A[0], "jetton": "0:jetton1"},
        {"address": W2, "owner": A[1], "jetton": "0:jetton1"},
    ])
    acts = [r.asDict() for r in res.actions.filter(
        F.col("trace_id") == "boc1").collect()]
    assert [a["type"] for a in acts] == ["jetton_transfer"]
    assert acts[0]["amount"] == 1234
    assert acts[0]["destination"] == A[1]
    # 5 = the 4-tx transfer chain + the initiating root tx (reference
    # serialization includes the trace-initiating transaction)
    assert len(acts[0]["tx_hashes"]) == 5


def test_nft_transfer_boc_body(spark):
    from pyspark.sql import functions as F

    from tests.test_classifier import A, ITEM, TraceBuilder, run
    from ton_indexer_spark.classifier.matchers import (
        NFT_TRANSFER,
        OWNERSHIP_ASSIGNED,
    )

    b = TraceBuilder("boc2")
    root = b.tx(A[0], None)
    item = b.chain(root, ITEM, opcode=NFT_TRANSFER,
                   body=encode_nft_transfer(9, A[2], A[0]))
    b.chain(item, A[2], opcode=OWNERSHIP_ASSIGNED)
    res = run(spark, [b], nft_items=[{"address": ITEM}])
    acts = [r.asDict() for r in res.actions.filter(
        F.col("trace_id") == "boc2").collect()]
    assert [a["type"] for a in acts] == ["nft_transfer"]
    assert acts[0]["destination"] == A[2]


def test_ton_transfer_boc_comment(spark):
    from pyspark.sql import functions as F

    from tests.test_classifier import A, TraceBuilder, run

    b = TraceBuilder("boc3")
    root = b.tx(A[0], None)
    b.chain(root, A[1], opcode=0, value=10**9,
            body=encode_comment("boc says hi"))
    res = run(spark, [b])
    acts = [r.asDict(recursive=True) for r in res.actions.filter(
        F.col("trace_id") == "boc3").collect()]
    assert [a["type"] for a in acts] == ["ton_transfer"]
    assert acts[0]["ton_transfer_data"]["content"] == "boc says hi"


def test_decode_protocol_ops():
    """Round-trip the protocol message shapes added for the matcher
    library (reference TL-B: messages/swaps.py, multisig.py, vesting.py,
    coffee.py — re-derived)."""
    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_STK_CLAIM,
        OP_COFFEE_STK_DEPOSIT,
        OP_DEDUST_PAYOUT,
        OP_MULTISIG_APPROVE,
        OP_MULTISIG_EXECUTE,
        OP_MULTISIG_NEW_ORDER,
        OP_STONFI_PAYMENT_REQ,
        OP_STONFI_SWAP,
        OP_VESTING_ADD_WL,
        OP_VESTING_SEND,
        Builder,
        decode_message_body,
        serialize_boc,
    )
    import base64

    def b64(cell):
        return base64.b64encode(serialize_boc(cell)).decode()

    a1 = "0:" + "11" * 32
    a2 = "0:" + "22" * 32

    # dedust payout: query_id, ^proof, amount
    payout = (
        Builder().store_uint(OP_DEDUST_PAYOUT, 32).store_uint(7, 64)
        .store_ref(Builder().end_cell()).store_coins(1234).end_cell()
    )
    d = decode_message_body(b64(payout))
    assert d["query_id"] == 7 and d["amount"] == 1234

    # stonfi v1 swap
    swap = (
        Builder().store_uint(OP_STONFI_SWAP, 32).store_uint(1, 64)
        .store_address(a1).store_address(a2).store_coins(500)
        .store_coins(490).end_cell()
    )
    d = decode_message_body(b64(swap))
    assert d["user"] == a1 and d["amount"] == 500 and d["min_out"] == 490

    # stonfi payment request with dual payout ref
    ref = (
        Builder().store_coins(300).store_address(a1)
        .store_coins(0).store_address(None).end_cell()
    )
    pr = (
        Builder().store_uint(OP_STONFI_PAYMENT_REQ, 32).store_uint(2, 64)
        .store_address(a2).store_uint(0, 32).store_ref(ref).end_cell()
    )
    d = decode_message_body(b64(pr))
    assert d["owner"] == a2 and d["amount0_out"] == 300
    assert d["token0_out"] == a1 and d["amount1_out"] == 0

    # multisig new_order / approve / execute
    order_ref = Builder().end_cell()
    no = (
        Builder().store_uint(OP_MULTISIG_NEW_ORDER, 32).store_uint(3, 64)
        .store_uint(12, 256).store_bit(1).store_uint(2, 8)
        .store_uint(1999, 48).store_ref(order_ref).end_cell()
    )
    d = decode_message_body(b64(no))
    assert d["order_seqno"] == 12 and d["is_created_by_signer"] is True
    assert d["creator_index"] == 2 and d["expiration_date"] == 1999

    ap = (
        Builder().store_uint(OP_MULTISIG_APPROVE, 32).store_uint(4, 64)
        .store_uint(5, 8).end_cell()
    )
    assert decode_message_body(b64(ap))["signer_index"] == 5

    ex = (
        Builder().store_uint(OP_MULTISIG_EXECUTE, 32).store_uint(5, 64)
        .store_uint(12, 256).store_uint(1999, 48).store_uint(3, 8)
        .store_bytes(b"\xab" * 32).store_ref(order_ref).end_cell()
    )
    d = decode_message_body(b64(ex))
    assert d["approvals_num"] == 3 and d["signers_hash"] == "ab" * 32

    # vesting send + whitelist chain
    vs = (
        Builder().store_uint(OP_VESTING_SEND, 32).store_uint(6, 64)
        .store_uint(3, 8).store_ref(Builder().end_cell()).end_cell()
    )
    assert decode_message_body(b64(vs))["send_mode"] == 3

    tail = Builder().store_address(a2).end_cell()
    wl = (
        Builder().store_uint(OP_VESTING_ADD_WL, 32).store_uint(7, 64)
        .store_address(a1).store_ref(tail).end_cell()
    )
    d = decode_message_body(b64(wl))
    assert d["accounts_added"] == [a1, a2]

    # coffee staking deposit / claim
    cd = (
        Builder().store_uint(OP_COFFEE_STK_DEPOSIT, 32).store_uint(8, 64)
        .store_address(a1).store_coins(777).store_address(a2)
        .store_uint(3, 32).end_cell()
    )
    d = decode_message_body(b64(cd))
    assert d["jetton_amount"] == 777 and d["period_id"] == 3
    assert d["sender"] == a1 and d["from_user"] == a2

    cc = (
        Builder().store_uint(OP_COFFEE_STK_CLAIM, 32).store_uint(9, 64)
        .store_address(a1).store_coins(99).store_address(a2).end_cell()
    )
    d = decode_message_body(b64(cc))
    assert d["jetton_wallet"] == a1 and d["jetton_amount"] == 99
    assert d["receiver"] == a2


def _b64(cell):
    import base64 as _b

    from ton_indexer_spark.functions.boc import serialize_boc

    return _b.b64encode(serialize_boc(cell)).decode()


def test_multisig_family_boc_bodies(spark):
    """Golden: the multisig matchers run on REAL BOC-encoded bodies
    (new_order / approve shapes from messages/multisig.py, re-derived) —
    no JSON fallback involved."""
    from ton_indexer_spark.functions.boc import Builder
    from ton_indexer_spark.classifier.matchers import (
        MULTISIG_APPROVE,
        MULTISIG_APPROVE_ACCEPTED,
        MULTISIG_NEW_ORDER,
    )
    from tests.test_classifier import A, TraceBuilder, acts_of, run

    MS = "0:ms" + "0" * 60
    order = Builder().store_uint(0xDEAD, 32).end_cell()
    new_order = (
        Builder().store_uint(MULTISIG_NEW_ORDER, 32).store_uint(9, 64)
        .store_uint(41, 256).store_bit(1).store_uint(2, 8)
        .store_uint(1_800_000_000, 48).store_ref(order).end_cell()
    )
    b = TraceBuilder("mb1")
    root = b.tx(A[0], None)
    ms = b.chain(root, MS, opcode=MULTISIG_NEW_ORDER, body=_b64(new_order))
    b.chain(ms, A[7], opcode=0x11, orig_status="uninit")

    approve = (
        Builder().store_uint(MULTISIG_APPROVE, 32).store_uint(3, 64)
        .store_uint(5, 8).end_cell()
    )
    accepted = (
        Builder().store_uint(MULTISIG_APPROVE_ACCEPTED, 32)
        .store_uint(3, 64).end_cell()
    )
    b2 = TraceBuilder("mb2")
    r2 = b2.tx(A[1], None)
    ms2 = b2.chain(r2, MS, opcode=MULTISIG_APPROVE, body=_b64(approve))
    # the order must answer accepted/rejected or the reference refuses to
    # build the block (multisig.py:178-189) — claim the answer leg
    b2.chain(ms2, A[1], opcode=MULTISIG_APPROVE_ACCEPTED,
             body=_b64(accepted))

    res = run(spark, [b, b2], multisig=[{"address": MS}])
    a1 = acts_of(res, "mb1")
    assert [a["type"] for a in a1] == ["multisig_create_order",
                                       "contract_deploy"]
    d = a1[0]["multisig_create_order_data"]
    assert d["query_id"] == 9
    assert d["order_seqno"] == 41
    assert d["is_created_by_signer"] is True
    assert d["creator_index"] == 2
    assert d["expiration_date"] == 1_800_000_000
    assert d["order_boc"]  # the ^Order ref rides along as base64 BOC
    a2 = acts_of(res, "mb2")
    assert [a["type"] for a in a2] == ["multisig_approve"]
    assert a2[0]["multisig_approve_data"]["signer_index"] == 5


def test_vesting_family_boc_bodies(spark):
    """Golden: vesting send_message / add_whitelist matchers on BOC
    bodies (messages/vesting.py shapes, re-derived)."""
    from ton_indexer_spark.functions.boc import Builder
    from ton_indexer_spark.classifier.matchers import (
        VESTING_ADD_WHITELIST,
        VESTING_ADD_WHITELIST_RESP,
        VESTING_SEND,
        VESTING_SEND_RESP,
    )
    from tests.test_classifier import A, TraceBuilder, acts_of, run

    VEST = "0:vest" + "0" * 58
    inner = Builder().store_uint(0, 32).end_cell()
    send = (
        Builder().store_uint(VESTING_SEND, 32).store_uint(4, 64)
        .store_uint(3, 8).store_ref(inner).end_cell()
    )
    b = TraceBuilder("vb1")
    r = b.tx(A[0], None)
    v = b.chain(r, VEST, opcode=VESTING_SEND, body=_b64(send))
    b.chain(v, A[0], opcode=VESTING_SEND_RESP)
    b.chain(v, A[5], opcode=0, value=10**9)

    wl_tail = Builder().store_address(A[3]).end_cell()
    add_wl = (
        Builder().store_uint(VESTING_ADD_WHITELIST, 32).store_uint(6, 64)
        .store_address(A[2]).store_ref(wl_tail).end_cell()
    )
    b2 = TraceBuilder("vb2")
    r2 = b2.tx(A[1], None)
    v2 = b2.chain(r2, VEST, opcode=VESTING_ADD_WHITELIST, body=_b64(add_wl))
    b2.chain(v2, A[1], opcode=VESTING_ADD_WHITELIST_RESP)

    res = run(spark, [b, b2])
    a1 = acts_of(res, "vb1")
    assert [a["type"] for a in a1] == ["vesting_send_message", "ton_transfer"]
    assert a1[0]["vesting_send_message_data"]["query_id"] == 4
    a2 = acts_of(res, "vb2")
    assert [a["type"] for a in a2] == ["vesting_add_whitelist"]
    assert a2[0]["vesting_add_whitelist_data"]["accounts_added"] == [A[2], A[3]]


def test_nft_sale_update_boc_body():
    """SaleUpdateMessage (0x6c6c2080) decodes price/fee/royalty from the
    wire shape (getgems.py:249-262, re-derived)."""
    from ton_indexer_spark.functions.boc import (
        OP_NFT_SALE_UPDATE,
        Builder,
        decode_message_body,
    )

    body = (
        Builder().store_uint(OP_NFT_SALE_UPDATE, 32).store_uint(8, 64)
        .store_coins(10**10).store_coins(5 * 10**8).store_coins(10**8)
        .end_cell()
    )
    d = decode_message_body(_b64(body))
    assert d["query_id"] == 8
    assert d["full_price"] == 10**10
    assert d["marketplace_fee"] == 5 * 10**8
    assert d["royalty_amount"] == 10**8


def test_nft_sale_state_decode_roundtrip(spark):
    """Fix-price sale DATA cells round-trip into the getgems_nft_sales
    dimension via the Spark state-decode stage (getgems.py:91-113 shape,
    re-derived); undecodable states surface as error rows."""
    from ton_indexer_spark.functions.boc import (
        decode_nft_sale_data,
        encode_nft_sale_data,
    )
    from ton_indexer_spark.sources.tx_ingest import nft_sales_from_states

    MP = "0:" + "77" * 32
    NFT = "0:" + "88" * 32
    OWN = "0:" + "99" * 32
    raw = encode_nft_sale_data(
        is_complete=False, created_at=1_700_000_777,
        marketplace_address=MP, nft_address=NFT, nft_owner_address=OWN,
        full_price=2**70,  # > int64: Decimal end to end
        marketplace_fee_address=MP, marketplace_fee=123,
        royalty_address=OWN, royalty_amount=45,
    )
    d = decode_nft_sale_data(raw)
    assert d["nft_address"] == NFT and d["full_price"] == 2**70
    assert d["marketplace_fee"] == 123 and d["royalty_amount"] == 45

    df = spark.createDataFrame(
        [("0:sale" + "0" * 58, raw), ("0:bad" + "0" * 59, "bm9wZQ==")],
        "address string, data_boc string",
    )
    rows = {r["address"]: r for r in nft_sales_from_states(df).collect()}
    good = rows["0:sale" + "0" * 58]
    assert good["decode_error"] is None
    assert good["nft_address"] == NFT
    assert int(good["full_price"]) == 2**70
    assert good["created_at"] == 1_700_000_777
    bad = rows["0:bad" + "0" * 59]
    assert bad["decode_error"] is not None


def test_liquidity_and_swap_body_decoders():
    """Golden round-trips for the round-4 decoder additions: DeDust
    deposit (vault entry + jetton forward payload), Ston.fi v2 provide,
    Tonco mint/swap, wallet-plugin subscription payment request
    (reference shapes: messages/liquidity.py, swaps.py:205-242,
    subscriptions.py:6-12 — re-derived)."""
    from ton_indexer_spark.functions.boc import (
        OP_DEDUST_DEPOSIT_FWD,
        OP_DEDUST_DEPOSIT_TON,
        OP_STONFI_V2_PROVIDE,
        OP_SUBSCRIPTION_PAY_REQ,
        OP_TONCO_MINT,
        OP_TONCO_SWAP,
        Builder,
        decode_message_body,
        store_dedust_asset,
    )

    JET = "0:" + "AB" * 32
    USR = "0:" + "CD" * 32

    params = (Builder().store_coins(1).store_coins(5000)
              .store_coins(7000).end_cell())
    dep = Builder().store_uint(OP_DEDUST_DEPOSIT_TON, 32).store_uint(9, 64)
    dep.store_coins(5000).store_bit(0)
    store_dedust_asset(dep, "TON")
    store_dedust_asset(dep, JET)
    dep.store_ref(params)
    d = decode_message_body(_b64(dep.end_cell()))
    assert d["amount"] == 5000 and d["pool_type"] == "volatile"
    assert d["asset0"] == "TON" and d["asset1"] == JET
    assert d["asset0_target_balance"] == 5000
    assert d["asset1_target_balance"] == 7000

    fwd = Builder().store_uint(OP_DEDUST_DEPOSIT_FWD, 32).store_bit(1)
    store_dedust_asset(fwd, JET)
    store_dedust_asset(fwd, "TON")
    fwd.store_coins(2).store_coins(11).store_coins(22)
    d = decode_message_body(_b64(fwd.end_cell()))
    assert d["pool_type"] == "stable" and d["asset0"] == JET
    assert d["asset0_target_balance"] == 11

    prov = (Builder().store_uint(OP_STONFI_V2_PROVIDE, 32).store_uint(3, 64)
            .store_address(USR).store_coins(100).store_coins(200).end_cell())
    d = decode_message_body(_b64(prov))
    assert d["from_user"] == USR and d["amount"] == 100 and d["amount2"] == 200

    mint = (Builder().store_uint(OP_TONCO_MINT, 32).store_uint(4, 64)
            .store_address(USR).store_coins(10).store_coins(20)
            .store_coins(10).store_coins(20).store_uint(777, 128)
            .store_int(-100, 24).store_int(200, 24).end_cell())
    d = decode_message_body(_b64(mint))
    assert d["amount"] == 10 and d["amount2"] == 20
    assert d["liquidity"] == 777
    assert d["tick_lower"] == -100 and d["tick_upper"] == 200

    sw_params = (Builder().store_coins(50).store_uint(0, 160)
                 .store_coins(49).end_cell())
    sw_payloads = (Builder().store_address(USR).store_coins(0).store_bit(0)
                   .store_coins(0).store_bit(0).end_cell())
    sw = (Builder().store_uint(OP_TONCO_SWAP, 32).store_uint(5, 64)
          .store_address(USR).store_address(JET)
          .store_ref(sw_params).store_ref(sw_payloads).end_cell())
    d = decode_message_body(_b64(sw))
    assert d["owner"] == USR and d["source_wallet"] == JET
    assert d["amount"] == 50 and d["min_out"] == 49
    assert d["target_address"] == USR

    sub = (Builder().store_uint(OP_SUBSCRIPTION_PAY_REQ, 32)
           .store_uint(6, 64).store_coins(10**9).end_cell())
    d = decode_message_body(_b64(sub))
    assert d["grams"] == 10**9 and d["query_id"] == 6


def test_evaa_and_jvault_body_decoders():
    """Golden round-trips for the EVAA lending and JVault staking shapes
    (messages/evaa.py, jvault.py — re-derived)."""
    from ton_indexer_spark.functions.boc import (
        OP_EVAA_SUPPLY_MASTER,
        OP_EVAA_SUPPLY_USER,
        OP_EVAA_WITHDRAW_COLL,
        OP_EVAA_WITHDRAW_MASTER,
        OP_JVAULT_CLAIM,
        OP_JVAULT_UNSTAKE,
        OP_JVAULT_UNSTAKE_REQ,
        Builder,
        decode_message_body,
    )

    USR = "0:" + "12" * 32
    AID = int("ab" * 32, 16)

    sup = (Builder().store_uint(OP_EVAA_SUPPLY_MASTER, 32).store_uint(7, 64)
           .store_int(-1, 2).store_uint(12345, 64).store_address(USR)
           .end_cell())
    d = decode_message_body(_b64(sup))
    assert d["include_user_code"] and d["amount"] == 12345
    assert d["recipient_address"] == USR

    su = (Builder().store_uint(OP_EVAA_SUPPLY_USER, 32).store_uint(8, 64)
          .store_uint(AID, 256).store_uint(999, 64).end_cell())
    d = decode_message_body(_b64(su))
    assert d["asset_id"] == "ab" * 32 and d["amount"] == 999

    wm = (Builder().store_uint(OP_EVAA_WITHDRAW_MASTER, 32).store_uint(9, 64)
          .store_uint(AID, 256).store_uint(777, 64).store_address(USR)
          .end_cell())
    d = decode_message_body(_b64(wm))
    assert d["amount"] == 777 and d["recipient_address"] == USR

    wc = (Builder().store_uint(OP_EVAA_WITHDRAW_COLL, 32).store_uint(10, 64)
          .store_address(USR).store_uint(AID, 256).store_uint(555, 64)
          .end_cell())
    d = decode_message_body(_b64(wc))
    assert d["owner_address"] == USR and d["amount"] == 555

    un = (Builder().store_uint(OP_JVAULT_UNSTAKE, 32).store_uint(1, 64)
          .store_coins(42).store_bit(1).end_cell())
    d = decode_message_body(_b64(un))
    assert d["amount"] == 42 and d["force_unstake"] is True

    ur = (Builder().store_uint(OP_JVAULT_UNSTAKE_REQ, 32).store_uint(2, 64)
          .store_coins(43).end_cell())
    assert decode_message_body(_b64(ur))["amount"] == 43

    cl = (Builder().store_uint(OP_JVAULT_CLAIM, 32).store_uint(3, 64)
          .end_cell())
    assert decode_message_body(_b64(cl))["query_id"] == 3


def test_liquidity_matchers_on_boc_bodies(spark):
    """Ston.fi v2 provide, Tonco mint, and subscription payment classify
    from REAL BOC bodies through the new round-4 decoders."""
    from tests.test_classifier import A, TraceBuilder, acts_of, run
    from ton_indexer_spark.classifier.base import (
        JETTON_INTERNAL,
        SUBSCRIPTION_PAYMENT,
    )
    from ton_indexer_spark.classifier.protocols import (
        PTON_TRANSFER,
        STONFI_V2_PROVIDE_LIQUIDITY,
        TONCO_ADD_LIQUIDITY,
        TONCO_FUND_ACCOUNT,
    )
    from ton_indexer_spark.functions.boc import (
        OP_JETTON_NOTIFY,
        OP_PTON_TRANSFER,
        OP_STONFI_V2_PROVIDE,
        OP_SUBSCRIPTION_PAY_REQ,
        OP_TONCO_ADD_LIQUIDITY,
        Builder,
    )
    from ton_indexer_spark.classifier.base import JETTON_NOTIFY

    USR = "0:" + "12" * 32

    from ton_indexer_spark.classifier.protocols import (
        STONFI_V2_ACCOUNT_ADD,
        STONFI_V2_CB_ADD,
    )

    prov = (Builder().store_uint(OP_STONFI_V2_PROVIDE, 32).store_uint(3, 64)
            .store_address(USR).store_coins(100).store_coins(200).end_cell())
    b = TraceBuilder("sv2")
    r = b.tx(A[0], None)
    p = b.chain(r, A[5], opcode=STONFI_V2_PROVIDE_LIQUIDITY,
                body=_b64(prov))
    # the reference requires the 0x50c6a654 account-add + 0x06ecd527 cb
    # legs (liquidity.py:720-721) before the LP mint
    acc = b.chain(p, A[6], opcode=STONFI_V2_ACCOUNT_ADD)
    cb = b.chain(acc, A[5], opcode=STONFI_V2_CB_ADD)
    b.chain(cb, A[6], opcode=JETTON_INTERNAL)

    # tonco deposit, reference shape over REAL BOC bodies:
    # pTON entry -> notify -> FUND_ACCOUNT -> ADD_LIQUIDITY
    pton = (Builder().store_uint(OP_PTON_TRANSFER, 32).store_uint(4, 64)
            .store_coins(10).store_address(USR).end_cell())
    notify = (Builder().store_uint(OP_JETTON_NOTIFY, 32).store_uint(4, 64)
              .store_coins(10).store_address(USR).store_bit(0).end_cell())
    add = (Builder().store_uint(OP_TONCO_ADD_LIQUIDITY, 32)
           .store_uint(4, 64).store_coins(10).store_coins(0)
           .store_coins(10).store_coins(20).store_uint(777, 128)
           .store_int(-100, 24).store_int(200, 24).end_cell())
    b2 = TraceBuilder("tm1")
    r2 = b2.tx(A[1], None)
    pt = b2.chain(r2, A[7], opcode=PTON_TRANSFER, body=_b64(pton))
    n2 = b2.chain(pt, A[5], opcode=JETTON_NOTIFY, body=_b64(notify))
    f2 = b2.chain(n2, A[6], opcode=TONCO_FUND_ACCOUNT)
    b2.chain(f2, A[4], opcode=TONCO_ADD_LIQUIDITY, body=_b64(add))

    sub = (Builder().store_uint(OP_SUBSCRIPTION_PAY_REQ, 32)
           .store_uint(6, 64).store_coins(10**9).end_cell())
    b3 = TraceBuilder("sb1")
    r3 = b3.tx(A[2], None)
    s = b3.chain(r3, A[8], opcode=SUBSCRIPTION_PAYMENT, body=_b64(sub))
    b3.chain(s, A[9], opcode=0, value=10**9)

    res = run(spark, [b, b2, b3])

    sv = acts_of(res, "sv2")
    assert [a["type"] for a in sv] == ["dex_deposit_liquidity"]
    assert sv[0]["amount"] == 100
    assert sv[0]["dex_deposit_liquidity_data"]["dex"] == "stonfi_v2"

    tm = acts_of(res, "tm1")
    assert [a["type"] for a in tm] == ["dex_deposit_liquidity"]
    d = tm[0]["dex_deposit_liquidity_data"]
    assert d["amount1"] == 10 and d["target_amount_2"] == 20
    assert d["tick_lower"] == -100 and d["tick_upper"] == 200

    sb = acts_of(res, "sb1")
    assert [a["type"] for a in sb] == ["subscribe"]
    assert sb[0]["destination"] == A[9]


def test_coffee_body_decoders():
    """swap.coffee native entry shapes: shared query_id+amount prefix
    (messages/coffee.py — re-derived)."""
    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_DEPOSIT_NATIVE,
        OP_COFFEE_POOL_NATIVE,
        OP_COFFEE_SWAP_NATIVE,
        OP_COFFEE_WITHDRAW,
        Builder,
        decode_message_body,
    )

    for op in (OP_COFFEE_SWAP_NATIVE, OP_COFFEE_POOL_NATIVE,
               OP_COFFEE_DEPOSIT_NATIVE):
        c = (Builder().store_uint(op, 32).store_uint(5, 64)
             .store_coins(31337).end_cell())
        d = decode_message_body(_b64(c))
        assert d["query_id"] == 5 and d["amount"] == 31337

    w = (Builder().store_uint(OP_COFFEE_WITHDRAW, 32).store_uint(6, 64)
         .end_cell())
    assert decode_message_body(_b64(w))["query_id"] == 6


def test_jetton_mint_entry_boc_bodies(spark):
    """Minter-side mint (op 0x15 with ^master_msg, and the 0x642b7d07
    variant): classified from the entry call, including the FAILED case
    where the internal-transfer leg never ran (reference
    JettonMintBlockMatcher + jetton-mints.yaml failed case)."""
    from tests.test_classifier import A, TraceBuilder, acts_of, run
    from ton_indexer_spark.classifier.matchers import (
        JETTON_INTERNAL,
        JETTON_MINT_ALT,
        JETTON_MINT_MINTER,
    )
    from ton_indexer_spark.functions.boc import (
        Builder,
        OP_JETTON_INTERNAL,
    )

    MASTER, OWNER, WALLET = A[5], A[6], A[7]

    master_msg = (Builder().store_uint(OP_JETTON_INTERNAL, 32)
                  .store_uint(1, 64).store_coins(10**9).end_cell())
    mint15 = (Builder().store_uint(JETTON_MINT_MINTER, 32).store_uint(1, 64)
              .store_address(OWNER).store_coins(10**8)
              .store_ref(master_msg).end_cell())

    b = TraceBuilder("jm-ok")
    r = b.tx(A[0], None)
    m = b.chain(r, MASTER, opcode=JETTON_MINT_MINTER, body=_b64(mint15))
    b.chain(m, WALLET, opcode=JETTON_INTERNAL)

    # failed mint: minter tx aborted, no internal leg
    b2 = TraceBuilder("jm-fail")
    r2 = b2.tx(A[1], None)
    b2.chain(r2, MASTER, opcode=JETTON_MINT_MINTER, body=_b64(mint15),
             aborted=True)

    mint_alt = (Builder().store_uint(JETTON_MINT_ALT, 32).store_uint(2, 64)
                .store_address(OWNER).store_coins(5).end_cell())
    b3 = TraceBuilder("jm-alt")
    r3 = b3.tx(A[2], None)
    m3 = b3.chain(r3, MASTER, opcode=JETTON_MINT_ALT, body=_b64(mint_alt))
    b3.chain(m3, WALLET, opcode=JETTON_INTERNAL)

    res = run(spark, [b, b2, b3])

    ok = acts_of(res, "jm-ok")
    assert [a["type"] for a in ok] == ["jetton_mint"]
    assert ok[0]["destination"] == OWNER
    assert ok[0]["destination_secondary"] == WALLET
    assert ok[0]["asset"] == MASTER and ok[0]["amount"] == 10**9
    assert ok[0]["success"] is True

    fail = acts_of(res, "jm-fail")
    assert [a["type"] for a in fail] == ["jetton_mint"]
    assert fail[0]["success"] is False and fail[0]["amount"] == 10**9
    assert fail[0]["destination_secondary"] is None

    alt = acts_of(res, "jm-alt")
    assert [a["type"] for a in alt] == ["jetton_mint"]
    assert alt[0]["destination"] == OWNER and alt[0]["asset"] == MASTER


def test_round4b_decoder_batch():
    """TL-B decoders for the previously fallback-reliant payloads:
    tonstakers burn notification, coffee staking withdraw (3 shapes),
    tgBTC event logs, DeDust swap notification, Ston.fi v2 pay_to."""
    import base64

    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_STK_WITHDRAW,
        OP_DEDUST_SWAP_NOTIFICATION,
        OP_STONFI_V2_PAYOUT,
        OP_TGBTC_BURN_EVENT,
        OP_TGBTC_DKG_EVENT,
        OP_TGBTC_MINT_EVENT,
        OP_TGBTC_NEW_KEY_EVENT,
        OP_TS_NFT_BURN_NOTIF,
        Builder,
        decode_message_body,
        serialize_boc,
        store_dedust_asset,
    )

    def b64(cell):
        return base64.b64encode(serialize_boc(cell)).decode()

    A1 = "0:" + "11" * 32
    A2 = "0:" + "22" * 32
    A3 = "0:" + "33" * 32

    # tonstakers payout-NFT burn notification
    c = (Builder().store_uint(OP_TS_NFT_BURN_NOTIF, 32).store_uint(9, 64)
         .store_coins(12345).store_address(A1).end_cell())
    d = decode_message_body(b64(c))
    assert d["tokens_burnt"] == 12345 and d["owner"] == A1

    # coffee staking withdraw_1 / _2 / _3 share the opcode
    w1 = (Builder().store_uint(OP_COFFEE_STK_WITHDRAW, 32)
          .store_uint(1, 64).end_cell())
    d1 = decode_message_body(b64(w1))
    assert d1["query_id"] == 1 and "nft_id" not in d1

    jd = Builder().store_address(A2).store_coins(777).end_cell()
    w2 = (Builder().store_uint(OP_COFFEE_STK_WITHDRAW, 32).store_uint(2, 64)
          .store_uint(42, 64).store_address(A1).store_coins(99)
          .store_ref(jd).end_cell())
    d2 = decode_message_body(b64(w2))
    assert d2["nft_id"] == 42 and d2["owner"] == A1 and d2["points"] == 99
    assert d2["jetton_wallet"] == A2 and d2["jetton_amount"] == 777

    w3 = (Builder().store_uint(OP_COFFEE_STK_WITHDRAW, 32).store_uint(3, 64)
          .store_address(A2).store_coins(555).store_address(A1).end_cell())
    d3 = decode_message_body(b64(w3))
    assert d3["jetton_amount"] == 555 and d3["owner"] == A1
    assert "nft_id" not in d3

    # tgBTC events
    txid = int.from_bytes(bytes(range(32)), "big")
    mint = (Builder().store_uint(OP_TGBTC_MINT_EVENT, 32).store_coins(10**8)
            .store_address(A1).store_uint(txid, 256).end_cell())
    dm = decode_message_body(b64(mint))
    assert dm["amount"] == 10**8 and dm["recipient"] == A1
    assert dm["bitcoin_txid"] == bytes(range(32))[::-1].hex()  # LE hex

    burn = (Builder().store_uint(OP_TGBTC_BURN_EVENT, 32).store_coins(7)
            .store_address(A1).store_address(A2).end_cell())
    db = decode_message_body(b64(burn))
    assert db["amount"] == 7 and db["pegout_address"] == A2

    key = (Builder().store_uint(OP_TGBTC_NEW_KEY_EVENT, 32).store_coins(1)
           .store_uint(5, 256).store_address(A3).end_cell())
    dk = decode_message_body(b64(key))
    assert dk["new_internal_pubkey"] == "5"  # hex()[2:] — unpadded
    assert dk["pegout_address"] == A3

    dkg = (Builder().store_uint(OP_TGBTC_DKG_EVENT, 32)
           .store_uint(1700000000, 64).store_uint(6, 256).end_cell())
    dd = decode_message_body(b64(dkg))
    assert dd["timestamp"] == 1700000000

    # DeDust swap notification
    ref = (Builder().store_address(A1).store_address(None)
           .store_coins(1).store_coins(2).end_cell())
    swap = (Builder().store_uint(OP_DEDUST_SWAP_NOTIFICATION, 32))
    swap = store_dedust_asset(swap, "TON")
    swap = store_dedust_asset(swap, A2)
    swap = (swap.store_coins(1000).store_coins(990)
            .store_ref(ref).end_cell())
    ds = decode_message_body(b64(swap))
    assert ds["asset_in"] == "TON" and ds["asset_out"] == A2
    assert ds["amount_in"] == 1000 and ds["amount_out"] == 990
    assert ds["sender"] == A1

    # Ston.fi v2 pay_to
    add = (Builder().store_coins(3).store_coins(400).store_address(A1)
           .store_coins(0).store_address(None).end_cell())
    payto = (Builder().store_uint(OP_STONFI_V2_PAYOUT, 32).store_uint(8, 64)
             .store_address(A1).store_address(A2).store_address(A3)
             .store_uint(200, 32).store_bit(0)  # no custom payload
             .store_ref(add).end_cell())
    dp = decode_message_body(b64(payto))
    assert dp["to_address"] == A1 and dp["exit_code"] == 200
    assert dp["amount0_out"] == 400 and dp["token0_address"] == A1
    assert dp["amount1_out"] == 0 and dp["token1_address"] is None


def test_layerzero_send_md_decodes():
    """The lzSend metadata tree (md_obj → lzSend → packet → path) decodes
    request id, fees, nonce/guid and the eid/oapp route from a real BOC
    body, and the send matcher consumes it."""
    import base64

    from ton_indexer_spark.functions.boc import (
        _LZ_CELL_FILLER_BITS,
        _LZ_CELL_HEADER_BITS,
        _LZ_MD_NAME,
        _LZ_PACKET_HEADER,
        _LZ_PATH_HEADER,
        _LZ_SEND_FILLER_BITS,
        _LZ_SEND_HEADER,
        _LZ_SEND_HEADER_BITS,
        OP_LZ_ENDPOINT_SEND,
        Builder,
        decode_message_body,
        serialize_boc,
    )

    ones = lambda n: (1 << n) - 1  # noqa: E731
    path = (Builder()
            .store_uint(_LZ_PATH_HEADER, _LZ_CELL_HEADER_BITS)
            .store_uint(ones(_LZ_CELL_FILLER_BITS), _LZ_CELL_FILLER_BITS)
            .store_uint(30343, 32).store_uint(0xAA, 256)
            .store_uint(30184, 32).store_uint(0xBB, 256).end_cell())
    packet = (Builder()
              .store_uint(_LZ_PACKET_HEADER, _LZ_CELL_HEADER_BITS)
              .store_uint(ones(_LZ_CELL_FILLER_BITS), _LZ_CELL_FILLER_BITS)
              .store_ref(path)
              .store_ref(Builder().store_uint(0xDEAD, 16).end_cell())
              .store_uint(77, 64).store_uint(0xCAFE, 256)
              .end_cell())
    fees = (Builder().store_uint(1, 256)
            .store_uint(5000, 128).store_uint(0, 128)
            .store_ref(Builder().end_cell())
            .store_ref(Builder().end_cell()).end_cell())
    lz = (Builder().store_uint(_LZ_MD_NAME, 80)
          .store_uint(_LZ_SEND_HEADER, _LZ_SEND_HEADER_BITS)
          .store_uint(ones(_LZ_SEND_FILLER_BITS), _LZ_SEND_FILLER_BITS)
          .store_uint(42, 64).store_uint(0x11, 256).store_uint(0x22, 256)
          .store_ref(packet)
          .store_ref(Builder().end_cell())
          .store_ref(fees).end_cell())
    md_obj = (Builder().store_ref(lz)
              .store_ref(Builder().end_cell()).end_cell())
    A1 = "0:" + "44" * 32
    body = (Builder().store_uint(OP_LZ_ENDPOINT_SEND, 32).store_uint(9, 64)
            .store_coins(100).store_address(A1).store_ref(md_obj).end_cell())
    d = decode_message_body(base64.b64encode(serialize_boc(body)).decode())
    assert d["send_request_id"] == 42
    assert d["native_fee"] == 5000 and d["zro_fee"] == 0
    assert d["nonce"] == 77 and d["guid"] == hex(0xCAFE)
    assert d["src_eid"] == 30343 and d["dst_eid"] == 30184
    assert d["src_oapp"] == hex(0xAA) and d["dst_oapp"] == hex(0xBB)
    assert d["origin"] == A1


def test_tonco_start_burn_and_teleitem_auction_decode():
    import base64

    from ton_indexer_spark.functions.boc import (
        OP_TELEITEM_START_AUCTION,
        OP_TONCO_START_BURN,
        Builder,
        decode_message_body,
        serialize_boc,
    )

    def b64(c):
        return base64.b64encode(serialize_boc(c)).decode()

    burn = (Builder().store_uint(OP_TONCO_START_BURN, 32).store_uint(1, 64)
            .store_uint(17, 64).store_uint(10**20, 128)
            .store_int(-887272, 24).store_int(887272, 24).end_cell())
    d = decode_message_body(b64(burn))
    assert d["nft_index"] == 17 and d["amount"] == 10**20
    assert d["tick_lower"] == -887272 and d["tick_upper"] == 887272

    A1 = "0:" + "55" * 32
    cfg = (Builder().store_address(A1).store_coins(10**9)
           .store_coins(5 * 10**9).store_uint(5, 8).store_uint(300, 32)
           .store_uint(86400, 32).end_cell())
    auc = (Builder().store_uint(OP_TELEITEM_START_AUCTION, 32)
           .store_uint(2, 64).store_ref(cfg).end_cell())
    d2 = decode_message_body(b64(auc))
    assert d2["beneficiary_address"] == A1
    assert d2["initial_min_bid"] == 10**9 and d2["max_bid"] == 5 * 10**9
    assert d2["duration"] == 86400


def test_dedust_deposit_to_pool_decode_and_matcher(spark):
    """DedustDepositLiquidityToPool (0xb56b9598) decodes the second-asset
    amounts from the pool hop's BOC body, and the deposit matcher uses
    them when the entry body carries no fixture keys."""
    import base64

    from tests.test_classifier import A, TraceBuilder, acts_of, run
    from ton_indexer_spark.classifier.protocols import (
        DEDUST_DEPOSIT_TO_POOL,
        DEDUST_DEPOSIT_TON,
        DEDUST_TOPUP_DEPOSIT,
    )
    from ton_indexer_spark.functions.boc import (
        OP_DEDUST_DEPOSIT_TO_POOL,
        Builder,
        decode_message_body,
        serialize_boc,
        store_dedust_asset,
    )

    JET = "0:" + "66" * 32
    amounts = Builder()
    amounts = store_dedust_asset(amounts, "TON").store_coins(10**9)
    amounts = store_dedust_asset(amounts, JET).store_coins(777)
    cell = (Builder().store_uint(OP_DEDUST_DEPOSIT_TO_POOL, 32)
            .store_uint(4, 64).store_ref(Builder().end_cell())
            .store_address(A[3]).store_coins(5)
            .store_ref(amounts.end_cell())
            .store_bit(0).store_bit(0).end_cell())
    b64 = base64.b64encode(serialize_boc(cell)).decode()
    d = decode_message_body(b64)
    assert d["amount1"] == 10**9 and d["asset1"] == "TON"
    assert d["amount2"] == 777 and d["asset2"] == JET
    assert d["owner"] == A[3]

    # entry (no fixture payload) → topup → deposit-to-pool with BOC body
    VAULT, DEPOSIT, POOL = A[5], A[6], A[7]
    tb = TraceBuilder("ddp1")
    r = tb.tx(A[0], None)
    from tests.test_classifier import body_of
    v = tb.chain(r, VAULT, opcode=DEDUST_DEPOSIT_TON, value=10**9,
                 body=body_of({"amount": 10**9}))
    t = tb.chain(v, DEPOSIT, opcode=DEDUST_TOPUP_DEPOSIT)
    tb.chain(t, POOL, opcode=DEDUST_DEPOSIT_TO_POOL, body=b64)
    res = run(spark, [tb])
    acts = acts_of(res, "ddp1")
    assert [a["type"] for a in acts] == ["dex_deposit_liquidity"]
    data = acts[0]["dex_deposit_liquidity_data"]
    # pool-hop targets override the entry's: TON slot renders null
    assert data["target_asset_2"] == JET and data["target_amount_2"] == 777


def test_round4c_decoder_batch():
    """Golden decode of the seven matcher-feeding ops added in this pass:
    pTON transfer, EVAA liquidate entry, Tonco fund-account/create-pool,
    coffee MEV-protect refund, JVault receive, Ethena tsUSDe leg."""
    import base64

    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_MEV_FAILED_SWAP,
        OP_ETHENA_TSUSDE_TRANSFER,
        OP_EVAA_LIQUIDATE_MASTER,
        OP_JVAULT_RECEIVE,
        OP_PTON_TRANSFER,
        OP_TONCO_CREATE_POOL,
        OP_TONCO_FUND_ACCOUNT,
        Builder,
        decode_message_body,
        serialize_boc,
    )

    def b64(cell):
        return base64.b64encode(serialize_boc(cell)).decode()

    A1 = "0:" + "11" * 32
    A2 = "0:" + "22" * 32
    A3 = "0:" + "33" * 32

    # pTON transfer with a text-comment forward payload
    comment = (Builder().store_uint(0, 32)
               .store_snake_string("gas refill").end_cell())
    c = (Builder().store_uint(OP_PTON_TRANSFER, 32).store_uint(7, 64)
         .store_coins(5 * 10**8).store_address(A1)
         .store_bit(1).store_ref(comment).end_cell())
    d = decode_message_body(b64(c))
    assert d["amount"] == 5 * 10**8
    assert d["refund_address"] == A1
    assert d["comment"] == "gas refill"

    # EVAA liquidate_master
    asset = 0xDEADBEEF
    c = (Builder().store_uint(OP_EVAA_LIQUIDATE_MASTER, 32)
         .store_uint(8, 64).store_address(A1).store_address(A2)
         .store_uint(asset, 256).store_uint(42, 64).store_int(-1, 2)
         .store_uint(123456, 64).end_cell())
    d = decode_message_body(b64(c))
    assert d["borrower_address"] == A1
    assert d["liquidator_address"] == A2
    assert d["asset_id"] == f"{asset:064x}"
    assert d["debt_amount"] == 123456

    # Tonco fund account
    c = (Builder().store_uint(OP_TONCO_FUND_ACCOUNT, 32).store_uint(9, 64)
         .store_address(A3).store_coins(1000).store_coins(2000)
         .store_coins(900).store_coins(1800).store_uint(5_000_000, 128)
         .store_int(-60, 24).store_int(60, 24).end_cell())
    d = decode_message_body(b64(c))
    assert d["amount"] == 1000 and d["amount2"] == 2000
    assert d["tick_lower"] == -60 and d["tick_upper"] == 60
    assert d["liquidity"] == 5_000_000

    # Tonco create pool
    minters = (Builder().store_address(A1).store_address(A2)
               .store_address(A3).end_cell())
    c = (Builder().store_uint(OP_TONCO_CREATE_POOL, 32).store_uint(1, 64)
         .store_address(A2).store_address(A3).store_int(60, 24)
         .store_uint(2**96, 160).store_uint(30, 16).store_uint(25, 16)
         .store_uint(20, 16)
         .store_ref(Builder().end_cell())
         .store_ref(Builder().end_cell())
         .store_ref(minters).end_cell())
    d = decode_message_body(b64(c))
    assert d["jetton_wallet0"] == A2 and d["jetton_wallet1"] == A3
    assert d["tick_spacing"] == 60
    assert d["initial_price_x96"] == 2**96
    assert (d["protocol_fee"], d["lp_fee_base"], d["lp_fee_current"]) == (
        30, 25, 20)
    assert d["jetton0_minter"] == A1 and d["jetton1_minter"] == A2

    # coffee MEV-protect failed-swap refund
    c = (Builder().store_uint(OP_COFFEE_MEV_FAILED_SWAP, 32)
         .store_uint(3, 64).store_address(A1).end_cell())
    d = decode_message_body(b64(c))
    assert d["recipient"] == A1

    # JVault receive_jettons (whitelist dict skipped as Maybe ^Cell)
    c = (Builder().store_uint(OP_JVAULT_RECEIVE, 32).store_uint(4, 64)
         .store_coins(10).store_coins(10**12).store_uint(250, 16)
         .store_coins(5 * 10**7).store_bit(0).store_coins(777_000)
         .end_cell())
    d = decode_message_body(b64(c))
    assert d["amount"] == 777_000
    assert d["min_deposit"] == 10 and d["max_deposit"] == 10**12
    assert d["unstake_commission"] == 250

    # Ethena tsUSDe leg = jetton internal-transfer layout, custom op
    c = (Builder().store_uint(OP_ETHENA_TSUSDE_TRANSFER, 32)
         .store_uint(5, 64).store_coins(999).store_address(A2)
         .store_address(A3).store_coins(1).end_cell())
    d = decode_message_body(b64(c))
    assert d["amount"] == 999 and d["from"] == A2


def test_round4c_matchers_on_boc_bodies(spark):
    """pTON transfer, EVAA liquidate, Tonco deploy-pool, and the coffee
    MEV-protect refund classify from REAL BOC bodies (no fixture JSON)
    through the round-4c decoders."""
    from tests.test_classifier import A, TraceBuilder, acts_of, run
    from ton_indexer_spark.classifier.protocols import (
        COFFEE_MEV_FAILED_SWAP,
        EVAA_LIQUIDATE_MASTER,
        EVAA_LIQUIDATE_SATISFIED,
        EVAA_LIQUIDATE_USER,
        PTON_TRANSFER,
        TONCO_CREATE_POOL,
        TONCO_POOL_INIT,
    )
    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_MEV_FAILED_SWAP,
        OP_EVAA_LIQUIDATE_MASTER,
        OP_PTON_TRANSFER,
        OP_TONCO_CREATE_POOL,
        Builder,
    )

    USR = "0:" + "12" * 32

    comment = (Builder().store_uint(0, 32)
               .store_snake_string("hi").end_cell())
    pt = (Builder().store_uint(OP_PTON_TRANSFER, 32).store_uint(1, 64)
          .store_coins(4 * 10**9).store_address(USR)
          .store_bit(1).store_ref(comment).end_cell())
    b = TraceBuilder("pt1")
    r = b.tx(A[0], None)
    b.chain(r, A[5], opcode=PTON_TRANSFER, body=_b64(pt))

    liq = (Builder().store_uint(OP_EVAA_LIQUIDATE_MASTER, 32)
           .store_uint(2, 64).store_address(A[1]).store_address(A[2])
           .store_uint(0xAA, 256).store_uint(0, 64).store_int(0, 2)
           .store_uint(55_000, 64).end_cell())
    b2 = TraceBuilder("el1")
    r2 = b2.tx(A[1], None)
    m = b2.chain(r2, A[6], opcode=EVAA_LIQUIDATE_MASTER, body=_b64(liq))
    u = b2.chain(m, A[7], opcode=EVAA_LIQUIDATE_USER)
    b2.chain(u, A[6], opcode=EVAA_LIQUIDATE_SATISFIED)

    minters = (Builder().store_address(A[1]).store_address(A[2])
               .store_address(A[3]).end_cell())
    cp = (Builder().store_uint(OP_TONCO_CREATE_POOL, 32).store_uint(3, 64)
          .store_address(A[8]).store_address(A[9]).store_int(10, 24)
          .store_uint(7 * 2**96, 160).store_uint(9, 16).store_uint(8, 16)
          .store_uint(7, 16)
          .store_ref(Builder().end_cell())
          .store_ref(Builder().end_cell())
          .store_ref(minters).end_cell())
    b3 = TraceBuilder("tcp1")
    r3 = b3.tx(A[2], None)
    router = b3.chain(r3, A[8], opcode=TONCO_CREATE_POOL, body=_b64(cp))
    b3.chain(router, A[9], opcode=TONCO_POOL_INIT)

    mev = (Builder().store_uint(OP_COFFEE_MEV_FAILED_SWAP, 32)
           .store_uint(4, 64).store_address(USR).end_cell())
    b4 = TraceBuilder("mev1")
    r4 = b4.tx(A[3], None)
    b4.chain(r4, A[4], opcode=COFFEE_MEV_FAILED_SWAP, body=_b64(mev),
             value=3 * 10**9)

    res = run(spark, [b, b2, b3, b4])

    pt_acts = acts_of(res, "pt1")
    assert [a["type"] for a in pt_acts] == ["ton_transfer"]
    assert pt_acts[0]["amount"] == 4 * 10**9
    assert pt_acts[0]["ton_transfer_data"]["content"] == "hi"

    el = acts_of(res, "el1")
    assert [a["type"] for a in el] == ["evaa_liquidate"]
    assert el[0]["amount"] == 55_000
    assert el[0]["evaa_liquidate_data"]["asset_id"] == f"{0xAA:064x}"
    assert el[0]["success"] is True

    tc = acts_of(res, "tcp1")
    assert [a["type"] for a in tc] == ["tonco_deploy_pool"]
    d = tc[0]["tonco_deploy_pool_data"]
    assert d["jetton0_minter"] == A[1] and d["jetton1_minter"] == A[2]
    assert d["tick_spacing"] == 10
    assert d["initial_price_x96"] == str(7 * 2**96)
    assert (d["protocol_fee"], d["lp_fee_base"], d["lp_fee_current"]) == (
        9, 8, 7)

    mv = acts_of(res, "mev1")
    assert [a["type"] for a in mv] == ["coffee_mev_protect_failed_swap"]
    assert mv[0]["destination"] == USR


def test_coffee_param_tail_decoders():
    """Coffee entry param tails decode: swap step (first pool + min_out),
    pool-params assets, deposit recipient; prefix-only bodies still
    decode their prefix (fixture compatibility)."""
    from ton_indexer_spark.functions.boc import (
        OP_COFFEE_CREATE_POOL_JETTON,
        OP_COFFEE_DEPOSIT_JETTON,
        OP_COFFEE_DEPOSIT_NATIVE,
        OP_COFFEE_POOL_NATIVE,
        OP_COFFEE_SWAP_JETTON,
        OP_COFFEE_SWAP_NATIVE,
        Builder,
        decode_message_body,
        store_coffee_asset,
    )

    JET = "0:" + "77" * 32
    USR = "0:" + "13" * 32
    pool_hash = int("ab" * 32, 16)

    # native swap with step params
    c = (Builder().store_uint(OP_COFFEE_SWAP_NATIVE, 32).store_uint(1, 64)
         .store_coins(10**9).store_uint(pool_hash, 256).store_coins(555)
         .store_bit(0).end_cell())
    d = decode_message_body(_b64(c))
    assert d["amount"] == 10**9
    assert d["first_pool"] == f"0:{pool_hash:064X}"
    assert d["min_out"] == 555

    # jetton swap forward payload: step params only, no query_id
    c = (Builder().store_uint(OP_COFFEE_SWAP_JETTON, 32)
         .store_uint(pool_hash, 256).store_coins(777).store_bit(0)
         .end_cell())
    d = decode_message_body(_b64(c))
    assert d["min_out"] == 777 and "query_id" not in d

    # native create-pool: amount + PoolParams assets
    b = (Builder().store_uint(OP_COFFEE_POOL_NATIVE, 32).store_uint(2, 64)
         .store_coins(123))
    b = store_coffee_asset(b, "TON")
    b = store_coffee_asset(b, JET)
    c = b.store_uint(0, 3).store_bit(0).end_cell()  # amm tag + no settings
    d = decode_message_body(_b64(c))
    assert d["asset_1"] == "TON" and d["asset_2"] == JET
    assert d["provided_asset"] == "TON" and d["amount_1"] == 123

    # jetton create-pool forward payload
    b = Builder().store_uint(OP_COFFEE_CREATE_POOL_JETTON, 32)
    b = store_coffee_asset(b, JET)
    b = store_coffee_asset(b, "extra:7")
    c = b.store_uint(0, 3).store_bit(0).end_cell()
    d = decode_message_body(_b64(c))
    assert d["asset_1"] == JET and d["asset_2"] == "extra:7"

    # native deposit: recipient + pool assets
    b = (Builder().store_uint(OP_COFFEE_DEPOSIT_NATIVE, 32)
         .store_uint(3, 64).store_coins(999).store_address(USR)
         .store_bit(1))
    b = store_coffee_asset(b, "TON")
    b = store_coffee_asset(b, JET)
    c = b.store_uint(0, 3).store_bit(0).end_cell()
    d = decode_message_body(_b64(c))
    assert d["recipient"] == USR
    assert d["asset1"] == "TON" and d["asset2"] == JET

    # jetton deposit forward payload
    b = (Builder().store_uint(OP_COFFEE_DEPOSIT_JETTON, 32)
         .store_address(USR).store_bit(0))
    b = store_coffee_asset(b, JET)
    b = store_coffee_asset(b, "TON")
    c = b.store_uint(0, 3).store_bit(0).end_cell()
    d = decode_message_body(_b64(c))
    assert d["recipient"] == USR and d["asset1"] == JET

    # prefix-only fixture bodies keep decoding the prefix
    c = (Builder().store_uint(OP_COFFEE_SWAP_NATIVE, 32).store_uint(5, 64)
         .store_coins(31337).end_cell())
    d = decode_message_body(_b64(c))
    assert d["query_id"] == 5 and d["amount"] == 31337


def test_nft_sale_v4r1_decode():
    """The v4r1 sale layout (the reference's 'latest' fallback) decodes
    percent-factor fees; the amount columns stay null (the reference
    only surfaces the raw percent fields for v4r1)."""
    from ton_indexer_spark.functions.boc import (
        Builder,
        decode_nft_sale_data,
        serialize_boc,
    )
    import base64

    MP, OWN, FEE, ROY = ("0:" + c * 64 for c in "ABCD")
    static = (Builder().store_address(FEE).store_address(ROY)
              .store_uint(5000, 17).store_uint(2500, 17).end_cell())
    cell = (Builder().store_bit(0).store_address(MP).store_address(OWN)
            .store_coins(10**9).store_uint(1234, 32).store_uint(7, 64)
            .store_ref(static).end_cell())
    d = decode_nft_sale_data(
        base64.b64encode(serialize_boc(cell)).decode(), version="v4r1")
    assert d["marketplace_address"] == MP
    assert d["nft_owner_address"] == OWN
    assert d["full_price"] == 10**9
    assert d["sold_at"] == 1234
    assert d["fee_percent"] == 5000 and d["royalty_percent"] == 2500
    assert d["marketplace_fee"] is None
    assert d["royalty_amount"] is None


def test_pton_inline_comment():
    """The Either Cell ^Cell payload's INLINE arm (bit 0, comment in the
    remaining body bits) decodes the same as the ref arm."""
    import base64

    from ton_indexer_spark.functions.boc import (
        OP_PTON_TRANSFER,
        Builder,
        decode_message_body,
        serialize_boc,
    )

    c = (Builder().store_uint(OP_PTON_TRANSFER, 32).store_uint(2, 64)
         .store_coins(77).store_address("0:" + "55" * 32)
         .store_bit(0).store_uint(0, 32)
         .store_snake_string("inline note").end_cell())
    d = decode_message_body(base64.b64encode(serialize_boc(c)).decode())
    assert d["amount"] == 77
    assert d["comment"] == "inline note"


def test_address_hashmap_write_read_roundtrip():
    """The write-side HashmapE(267) codec (boc.encode_address_hashmap)
    round-trips through the existing key parser for single keys,
    multi-key radix splits, and negative workchains."""
    from ton_indexer_spark.functions.boc import (
        address_hashmap_keys,
        encode_address_hashmap,
    )

    assert encode_address_hashmap([]) is None
    single = ["0:" + "ab" * 32]
    got = address_hashmap_keys(encode_address_hashmap(single))
    assert [a.lower() for a in got] == [a.lower() for a in single]
    multi = [
        "0:" + "ab" * 32,
        "0:" + "ac" * 32,   # long shared prefix → deep fork
        "-1:" + "cd" * 32,  # masterchain: wc 0xFF in the key
        "0:" + "00" * 32,
    ]
    got = address_hashmap_keys(encode_address_hashmap(multi))
    assert sorted(a.lower() for a in got) == sorted(
        a.lower() for a in multi
    )


def test_jvault_body_encoders_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        encode_jvault_claim,
        encode_jvault_receive,
        encode_jvault_unstake,
        parse_boc,
    )

    d = decode_body_cell(parse_boc(encode_jvault_receive(5, 1234)))
    assert d["amount"] == 1234 and d["min_deposit"] == 1
    d = decode_body_cell(parse_boc(
        encode_jvault_unstake(6, 777, force_unstake=True)))
    assert d["amount"] == 777 and d["force_unstake"] is True
    d = decode_body_cell(parse_boc(
        encode_jvault_unstake(7, 88, request_only=True)))
    assert d["amount"] == 88 and "force_unstake" not in d
    jet = "0:" + "e" * 63 + "7"
    d = decode_body_cell(parse_boc(encode_jvault_claim(8, [jet])))
    assert [a.lower() for a in d["jettons_to_claim"]] == [jet.lower()]
    d = decode_body_cell(parse_boc(encode_jvault_claim(9, [])))
    assert d["jettons_to_claim"] == []


def test_lz_packet_tree_encoders_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_lz_commit_packet,
        decode_lz_execute_callback,
        decode_lz_send_callback,
        encode_lz_packet,
        encode_lz_packet_envelope,
        encode_lz_send_callback,
    )

    pkt = encode_lz_packet(30343, 0xAA, 30184, 0xBB, nonce=77,
                           guid=0xCAFE, message=b"\x01\x02")
    md = decode_lz_send_callback(
        encode_lz_send_callback(42, 0x11, 0x22, pkt, 5000, 3))
    assert md["send_request_id"] == 42
    assert md["native_fee"] == 5000 and md["zro_fee"] == 3
    assert md["packet"]["src_eid"] == 30343
    assert md["packet"]["dst_oapp"] == hex(0xBB)
    assert md["packet"]["message"] == "0x0102"
    for dec in (decode_lz_commit_packet, decode_lz_execute_callback):
        got = dec(encode_lz_packet_envelope(0x5388CD88, pkt))
        assert got["nonce"] == 77 and got["guid"] == hex(0xCAFE)


def test_tgbtc_event_encoders_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        encode_tgbtc_burn_event,
        encode_tgbtc_dkg_event,
        encode_tgbtc_mint_event,
        encode_tgbtc_new_key_event,
        parse_boc,
    )

    user = "0:" + "0" * 64
    txid = "aa55" * 16  # little-endian display hex
    d = decode_body_cell(parse_boc(
        encode_tgbtc_mint_event(100000, user, txid)))
    assert d["amount"] == 100000 and d["bitcoin_txid"] == txid
    d = decode_body_cell(parse_boc(
        encode_tgbtc_burn_event(5000, user, None)))
    assert d["amount"] == 5000 and d["pegout_address"] is None
    d = decode_body_cell(parse_boc(
        encode_tgbtc_new_key_event(3000, 0xF00D, user)))
    assert d["new_internal_pubkey"] == "f00d"  # hex()[2:] parity
    d = decode_body_cell(parse_boc(encode_tgbtc_dkg_event(1700, 0xBEEF)))
    assert d["timestamp"] == 1700 and d["internal_pubkey"] == "beef"


def test_tonco_payload_encoders_roundtrip():
    import base64

    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        decode_tonco_fund_payload,
        decode_tonco_swap_payload,
        encode_tonco_add_liquidity,
        encode_tonco_fund_payload,
        encode_tonco_pay_to,
        encode_tonco_pool_burn,
        encode_tonco_position_burn,
        encode_tonco_position_init,
        encode_tonco_start_burn,
        encode_tonco_swap_payload,
        parse_boc,
        serialize_boc,
    )

    w = "0:" + "8" * 63 + "6"
    u = "0:" + "0" * 64
    raw = base64.b64encode(serialize_boc(
        encode_tonco_swap_payload([(w, 450, u), (w, 10, None)]))).decode()
    assert decode_tonco_swap_payload(raw) == [
        (w.upper(), 450), (w.upper(), 10)]
    raw = base64.b64encode(serialize_boc(
        encode_tonco_fund_payload(w, 1000, 0))).decode()
    fp = decode_tonco_fund_payload(raw)
    assert fp["other_jetton_wallet"].lower() == w.lower()
    assert fp["amount0"] == 1000 and fp["amount1"] == 0
    d = decode_body_cell(parse_boc(
        encode_tonco_add_liquidity(1, 10, 0, 10, 20, 777, -60, 60)))
    assert d["new_amount0"] == 10 and d["tick_lower"] == -60
    d = decode_body_cell(parse_boc(
        encode_tonco_position_init(1, u, 777, -60, 60, 5, 10, 20)))
    assert d["liquidity"] == 777 and d["nft_index"] == 5
    d = decode_body_cell(parse_boc(
        encode_tonco_start_burn(1, 5, 777, -60, 60)))
    assert d["nft_index"] == 5 and d["amount"] == 777
    d = decode_body_cell(parse_boc(
        encode_tonco_position_burn(1, u, 777, -60, 60)))
    assert d["liquidity_to_burn"] == 777
    d = decode_body_cell(parse_boc(
        encode_tonco_pool_burn(1, u, 5, 777, -60, 60)))
    assert d["burned_index"] == 5
    d = decode_body_cell(parse_boc(encode_tonco_pay_to(
        1, u, None, 200, amount0=600, jetton0=w)))
    assert d["exit_code"] == 200 and d["amount0"] == 600


def test_stonfi_v2_pay_to_encoder_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        encode_stonfi_v2_pay_to,
        parse_boc,
    )

    w = "0:" + "a" * 63 + "7"
    d = decode_body_cell(parse_boc(encode_stonfi_v2_pay_to(
        7, w, w, "0:" + "0" * 64, 0xC64370E5, 0, 800, w, 0, None)))
    assert d["exit_code"] == 0xC64370E5
    assert d["amount0_out"] == 800 and d["token1_address"] is None


def test_cocoon_and_staking_body_encoders_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        decode_cocoon_body,
        encode_cocoon_client_register,
        encode_cocoon_client_topup,
        encode_cocoon_payout_payload,
        encode_cocoon_worker_request,
        encode_coffee_staking_claim,
        encode_coffee_staking_deposit,
        encode_coffee_staking_withdraw,
        encode_ethena_tsusde_transfer,
        encode_evaa_liquidate_master,
        parse_boc,
    )

    u = "0:" + "0" * 64
    d = decode_cocoon_body(encode_cocoon_payout_payload(51, 1200, u))
    assert d["new_tokens"] == 1200 and d["query_id"] == 51
    d = decode_cocoon_body(encode_cocoon_payout_payload(5, 9, u, last=True))
    assert d["opcode"] == 0xF5F26A36
    d = decode_cocoon_body(encode_cocoon_worker_request(51, u, 1, 1200))
    assert d["state"] == 1 and d["tokens"] == 1200
    d = decode_cocoon_body(encode_cocoon_client_topup(52, 5, u))
    assert d["amount"] == 5
    d = decode_cocoon_body(encode_cocoon_client_register(53, 99, u))
    assert d["nonce"] == 99
    d = decode_body_cell(parse_boc(
        encode_coffee_staking_deposit(81, u, 1000, u, 3)))
    assert d["jetton_amount"] == 1000 and d["period_id"] == 3
    d = decode_body_cell(parse_boc(
        encode_coffee_staking_claim(83, u, 444, u)))
    assert d["jetton_amount"] == 444
    # the three withdraw hop shapes decode to their distinct field sets
    d = decode_body_cell(parse_boc(encode_coffee_staking_withdraw(82)))
    assert d == {"opcode": 0xCB03BFAF, "query_id": 82}
    d = decode_body_cell(parse_boc(encode_coffee_staking_withdraw(
        82, nft_id=7, owner=u, points=5000, jetton_wallet=u,
        jetton_amount=900)))
    assert d["nft_id"] == 7 and d["points"] == 5000
    d = decode_body_cell(parse_boc(encode_coffee_staking_withdraw(
        82, jetton_wallet=u, jetton_amount=900, owner=u)))
    assert d["jetton_amount"] == 900 and "nft_id" not in d
    d = decode_body_cell(parse_boc(encode_evaa_liquidate_master(
        91, u, u, 0xDD11, 1, 5000)))
    assert d["debt_amount"] == 5000 and d["asset_id"] == f"{0xDD11:064x}"
    d = decode_body_cell(parse_boc(
        encode_ethena_tsusde_transfer(92, 650, u)))
    assert d["amount"] == 650


def test_dedust_deposit_encoders_roundtrip():
    from ton_indexer_spark.functions.boc import (
        decode_body_cell,
        encode_dedust_deposit_to_pool,
        encode_dedust_deposit_ton,
        parse_boc,
    )

    j = "0:" + "c" * 63 + "9"
    u = "0:" + "0" * 64
    d = decode_body_cell(parse_boc(encode_dedust_deposit_ton(
        71, 2 * 10**9, "TON", j, min_lp=1, asset0_target=2 * 10**9,
        asset1_target=1000)))
    assert d["amount"] == 2 * 10**9 and d["asset0"] == "TON"
    assert d["asset1"].lower() == j.lower()
    assert d["asset1_target_balance"] == 1000
    d = decode_body_cell(parse_boc(encode_dedust_deposit_to_pool(
        71, u, 1, "TON", 2 * 10**9, j, 1000)))
    assert d["owner"] == u.upper() or d["owner"].lower() == u.lower()
    assert d["asset1"] == "TON" and d["amount2"] == 1000


def test_address_hashmap_roundtrip_property():
    """Property: any set of distinct MsgAddressStd keys survives the
    write-side hashmap codec (random radix splits, shared prefixes,
    both workchains)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ton_indexer_spark.functions.boc import (
        address_hashmap_keys,
        encode_address_hashmap,
    )

    addr = st.tuples(
        st.sampled_from([0, -1]),
        st.integers(min_value=0, max_value=(1 << 256) - 1),
    ).map(lambda t: f"{t[0]}:{t[1]:064X}")

    @settings(max_examples=50, deadline=None)
    @given(st.lists(addr, min_size=1, max_size=24, unique=True))
    def check(addresses):
        got = address_hashmap_keys(encode_address_hashmap(addresses))
        assert sorted(got) == sorted(addresses)

    check()
