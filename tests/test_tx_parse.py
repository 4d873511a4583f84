"""TL-B transaction flatten round-trip (S2 completion).

Fixtures are REAL BOC bytes: encode_transaction_cell builds genuine
transaction cells (wire format, genuine cell hashes), serialize_boc
writes the bag-of-cells, and the parser must recover every phase field —
the same discipline the reference applies in DataParser.cpp:29-82,334.
"""

from __future__ import annotations

import base64

import pytest

from ton_indexer_spark.functions.boc import (
    Builder,
    cell_hash_b64,
    parse_boc,
    serialize_boc,
)
from ton_indexer_spark.functions.tx_parse import (
    encode_message_cell,
    encode_ord_descr,
    encode_transaction_cell,
    flatten_transaction,
    parse_transaction_boc,
)

A_SRC = "0:" + "AB" * 32
A_DST = "0:" + "CD" * 32
A_PEER = "0:" + "EF" * 32


def _comment_body(op: int = 0x12345678) -> "Builder":
    return Builder().store_uint(op, 32).store_uint(99, 64).end_cell()


def _sample_tx(out_count: int = 2, bounce: str | None = None, **descr_kw):
    in_msg = encode_message_cell(
        A_SRC, A_DST, value=5_000_000_000, bounce=True,
        fwd_fee=666, ihr_fee=7, created_lt=999, created_at=1700000000,
        body=_comment_body(0x0F8A7EA5),
    )
    outs = [
        encode_message_cell(
            A_DST, A_PEER, value=100 + i, created_lt=1000 + i,
            created_at=1700000001, body=_comment_body(0x178D4519 + i),
        )
        for i in range(out_count)
    ]
    descr = encode_ord_descr(
        storage_fees=1234, credit=777, gas_fees=40_000, gas_used=30_111,
        gas_limit=1_000_000, exit_code=0, vm_steps=321,
        action={"tot_actions": out_count, "msgs_created": out_count,
                "total_fwd_fees": 4321},
        bounce=bounce, **descr_kw,
    )
    return encode_transaction_cell(
        int("11" * 32, 16), 123_456_789, 1_700_000_002,
        prev_trans_hash=int("22" * 32, 16), prev_trans_lt=42,
        in_msg=in_msg, out_msgs=outs, total_fees=45_678,
        state_hash_before=int("33" * 32, 16),
        state_hash_after=int("44" * 32, 16),
        descr=descr,
    )


def test_transaction_roundtrip_core_fields():
    cell = _sample_tx()
    raw = serialize_boc(cell)
    tx = parse_transaction_boc(raw, workchain=0)
    assert tx["account"] == "0:" + "11" * 32
    assert tx["lt"] == 123_456_789
    assert tx["now"] == 1_700_000_002
    assert tx["prev_trans_lt"] == 42
    assert tx["prev_trans_hash"] == base64.b64encode(b"\x22" * 32).decode()
    assert tx["orig_status"] == "active" and tx["end_status"] == "active"
    assert tx["total_fees"] == 45_678
    assert tx["account_state_hash_before"] == base64.b64encode(b"\x33" * 32).decode()
    assert tx["account_state_hash_after"] == base64.b64encode(b"\x44" * 32).decode()
    # the tx hash is the genuine cell hash of the root cell
    assert tx["hash"] == cell_hash_b64(parse_boc(raw))


def test_transaction_roundtrip_phases():
    tx = parse_transaction_boc(serialize_boc(_sample_tx(bounce="ok")))
    assert tx["descr"] == "ord"
    assert tx["credit_first"] is False
    # storage phase
    assert tx["storage_fees_collected"] == 1234
    assert tx["storage_fees_due"] is None
    assert tx["storage_status_change"] == "unchanged"
    # credit phase
    assert tx["credit"] == 777
    # compute phase (vm)
    assert tx["compute_skipped"] is False
    assert tx["compute_success"] is True
    assert tx["compute_gas_fees"] == 40_000
    assert tx["compute_gas_used"] == 30_111
    assert tx["compute_gas_limit"] == 1_000_000
    assert tx["compute_exit_code"] == 0
    assert tx["compute_vm_steps"] == 321
    # action phase
    assert tx["action_success"] is True
    assert tx["action_tot_actions"] == 2
    assert tx["action_msgs_created"] == 2
    assert tx["action_total_fwd_fees"] == 4321
    assert tx["action_result_code"] == 0
    # bounce phase
    assert tx["bounce"] == "ok"
    assert tx["bounce_msg_fees"] == 100
    assert tx["bounce_fwd_fees"] == 200
    assert tx["aborted"] is False and tx["destroyed"] is False


def test_transaction_roundtrip_messages():
    tx = parse_transaction_boc(serialize_boc(_sample_tx(out_count=3)))
    im = tx["in_msg"]
    assert im["source"] == A_SRC and im["destination"] == A_DST
    assert im["value"] == 5_000_000_000
    assert im["bounce"] is True and im["bounced"] is False
    assert im["fwd_fee"] == 666 and im["ihr_fee"] == 7
    assert im["created_lt"] == 999
    assert im["opcode"] == 0x0F8A7EA5
    outs = tx["out_msgs"]
    assert len(outs) == 3
    # hashmap order must preserve key order 0..n-1
    assert [m["value"] for m in outs] == [100, 101, 102]
    assert [m["opcode"] for m in outs] == [0x178D4519 + i for i in range(3)]
    # message hash is the genuine cell hash; body is re-serialized BOC
    body = parse_boc(outs[0]["body_boc"])
    assert body.begin_parse().load_uint(32) == 0x178D4519


def test_external_in_transaction():
    ext = encode_message_cell(None, A_DST, kind="ext_in", import_fee=17,
                              body=_comment_body(0))
    cell = encode_transaction_cell(
        int("55" * 32, 16), 7, 1_700_000_000, in_msg=ext, out_msgs=[],
        descr=encode_ord_descr(storage_fees=None, exit_code=0),
    )
    tx = parse_transaction_boc(serialize_boc(cell))
    assert tx["in_msg"]["source"] is None
    assert tx["in_msg"]["import_fee"] == 17
    assert tx["out_msgs"] == []
    # absent phase → null in the flat row
    assert flatten_transaction(tx)["storage_fees_collected"] is None


def test_aborted_skipped_compute():
    from ton_indexer_spark.functions.boc import Builder as B

    # hand-build: ord descr with skipped compute (no_gas), aborted
    b = B()
    b.store_uint(0b0000, 4).store_bit(0)  # ord, credit_first=0
    b.store_bit(0).store_bit(0)  # no storage, no credit
    b.store_bit(0)  # compute skipped
    b.store_uint(0b10, 2)  # cskip_no_gas
    b.store_bit(0)  # no action
    b.store_bit(1)  # aborted
    b.store_bit(0)  # no bounce
    b.store_bit(0)  # not destroyed
    cell = encode_transaction_cell(
        1, 2, 3, in_msg=None, out_msgs=[], descr=b.end_cell()
    )
    tx = parse_transaction_boc(serialize_boc(cell))
    assert tx["compute_skipped"] is True
    assert tx["skipped_reason"] == "no_gas"
    assert tx["aborted"] is True
    assert tx["in_msg"] is None


def test_out_msgs_hashmap_wide():
    """15-bit keyed hashmap with enough entries to force real forks."""
    tx = parse_transaction_boc(serialize_boc(_sample_tx(out_count=4)))
    assert [m["value"] for m in tx["out_msgs"]] == [100, 101, 102, 103]


def test_flatten_matches_column_inventory():
    from ton_indexer_spark.functions.tx_parse import FLAT_COLUMNS

    tx = parse_transaction_boc(serialize_boc(_sample_tx()))
    flat = flatten_transaction(tx)
    assert set(flat) == set(FLAT_COLUMNS)
    assert flat["hash"] == tx["hash"]
    assert flat["compute_gas_used"] == 30_111


def test_spark_parse_stage(spark):
    """End-to-end: a DataFrame of raw BOCs → flat txs + messages +
    contents, all relational downstream of one mapInPandas."""
    from ton_indexer_spark.sources.tx_ingest import (
        message_contents_from_parsed,
        messages_from_parsed,
        parse_raw_transactions,
    )

    bocs = [
        (base64.b64encode(serialize_boc(_sample_tx(out_count=i))).decode(), 0)
        for i in (0, 1, 2)
    ] + [("bm9wZQ==", 0)]  # garbage row must not fail the batch
    df = spark.createDataFrame(bocs, "boc string, workchain int")
    parsed = parse_raw_transactions(df)
    rows = parsed.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(good) == 3 and len(bad) == 1
    assert {r["account"] for r in good} == {"0:" + "11" * 32}
    assert all(r["compute_gas_used"] == 30_111 for r in good)

    msgs = messages_from_parsed(parsed)
    got = msgs.groupBy("direction").count().collect()
    counts = {r["direction"]: r["count"] for r in got}
    assert counts == {"in": 3, "out": 0 + 1 + 2}

    contents = message_contents_from_parsed(parsed).collect()
    # bodies are content-addressed and deduplicated
    assert len({r["hash"] for r in contents}) == len(contents)
    assert all(parse_boc(r["body"]) is not None for r in contents)


def test_core_transactions_projection(spark):
    """Raw BOC → the engine's core TRANSACTIONS schema: types match field
    for field, so parsed real-chain dumps feed the existing assembler /
    classifier pipeline directly."""
    from ton_indexer_spark.schemas import TRANSACTIONS
    from ton_indexer_spark.sources.tx_ingest import (
        core_transactions_from_parsed,
        parse_raw_transactions,
    )

    df = spark.createDataFrame(
        [(base64.b64encode(serialize_boc(_sample_tx())).decode(), 0)],
        "boc string, workchain int",
    )
    core = core_transactions_from_parsed(
        parse_raw_transactions(df),
        block_workchain=0, block_shard=-9223372036854775808,
        block_seqno=77, mc_block_seqno=77,
    )
    assert [(f.name, f.dataType) for f in core.schema.fields] == [
        (f.name, f.dataType) for f in TRANSACTIONS.fields
    ]
    row = core.collect()[0]
    assert row["account"] == "0:" + "11" * 32
    assert row["lt"] == 123_456_789
    assert row["mc_block_seqno"] == 77
    assert row["compute_gas_used"] == 30_111
    assert row["descr"] == "ord"


def test_jetton_wallet_state_decode(spark):
    """Canonical TEP-74 wallet data cells → jetton_wallets dimension rows;
    >2^63 balances stay exact (Decimal), garbage rows land in
    decode_error."""
    from ton_indexer_spark.functions.boc import encode_jetton_wallet_data
    from ton_indexer_spark.sources.tx_ingest import jetton_wallets_from_states

    OWNER = "0:" + "AB" * 32
    MASTER = "0:" + "CD" * 32
    raw = encode_jetton_wallet_data(
        balance=2**70, owner=OWNER, jetton=MASTER)
    df = spark.createDataFrame(
        [("0:w1" + "0" * 60, raw), ("0:bad" + "0" * 59, "bm9wZQ==")],
        "address string, data_boc string",
    )
    rows = {r["address"]: r for r in jetton_wallets_from_states(df).collect()}
    good = rows["0:w1" + "0" * 60]
    assert good["decode_error"] is None
    assert int(good["balance"]) == 2**70
    assert good["owner"] == OWNER and good["jetton"] == MASTER
    assert rows["0:bad" + "0" * 59]["decode_error"] is not None


def test_nft_item_and_collection_state_decode(spark):
    from ton_indexer_spark.functions.boc import (
        decode_nft_collection_data,
        encode_nft_collection_data,
        encode_nft_item_data,
    )
    from ton_indexer_spark.sources.tx_ingest import nft_items_from_states

    OWNER = "0:" + "AB" * 32
    COLL = "0:" + "CD" * 32
    df = spark.createDataFrame(
        [
            ("0:i1" + "0" * 60,
             encode_nft_item_data(index=7, collection=COLL, owner=OWNER)),
            ("0:i2" + "0" * 60,
             encode_nft_item_data(index=8, collection=COLL, init=False)),
            ("0:bad" + "0" * 59, "bm9wZQ=="),
        ],
        "address string, data_boc string",
    )
    rows = {r["address"]: r for r in nft_items_from_states(df).collect()}
    a = rows["0:i1" + "0" * 60]
    assert a["init"] and int(a["index"]) == 7
    assert a["collection_address"] == COLL and a["owner_address"] == OWNER
    b = rows["0:i2" + "0" * 60]
    assert b["init"] is False and b["owner_address"] is None
    assert rows["0:bad" + "0" * 59]["decode_error"] is not None

    c = decode_nft_collection_data(
        encode_nft_collection_data(owner=OWNER, next_item_index=42))
    assert c["owner_address"] == OWNER and c["next_item_index"] == 42


def test_raw_boc_ingest_end_to_end(spark, tmp_path):
    """Raw BOC drops → RawBocIngest → assembled traces + transactions in
    the sink, linked by the real message-hash edge (S2→T1 fusion)."""
    import base64

    from ton_indexer_spark.functions.boc import serialize_boc
    from ton_indexer_spark.functions.tx_parse import (
        encode_message_cell,
        encode_ord_descr,
        encode_transaction_cell,
        parse_transaction_boc,
    )
    from ton_indexer_spark.streaming.ingest import IngestPipeline, RawBocIngest

    A1 = "0:" + "AA" * 32
    A2 = "0:" + "BB" * 32

    # external → tx1 at A1 → internal msg → tx2 at A2 (one complete trace)
    ext_in = encode_message_cell(None, A1, kind="ext_in", created_lt=0,
                                 created_at=1_700_000_000)
    link = encode_message_cell(A1, A2, value=10**9, created_lt=1_000_001,
                               created_at=1_700_000_001)
    tx1 = encode_transaction_cell(
        int("aa" * 32, 16), 1_000_000, 1_700_000_000,
        in_msg=ext_in, out_msgs=[link], descr=encode_ord_descr(),
    )
    tx2 = encode_transaction_cell(
        int("bb" * 32, 16), 1_000_010, 1_700_000_002,
        in_msg=link, descr=encode_ord_descr(),
    )
    rows = [
        (base64.b64encode(serialize_boc(c)).decode(), 0, -1, i + 1, i + 1)
        for i, c in enumerate([tx1, tx2])
    ]
    src = str(tmp_path / "raw_drop")
    spark.createDataFrame(
        rows,
        "boc string, workchain int, block_workchain int, block_seqno int, "
        "mc_block_seqno int",
    ).coalesce(1).write.parquet(src)

    out = str(tmp_path / "db")
    pipe = IngestPipeline(spark, out_dir=out,
                          state_dir=str(tmp_path / "state"))
    RawBocIngest(pipe).run_available_now(src, str(tmp_path / "ckpt"))

    txs = spark.read.parquet(f"{out}/transactions")
    traces = spark.read.parquet(f"{out}/traces")
    assert txs.count() == 2
    t = traces.collect()
    assert len(t) == 1 and t[0]["state"] == "complete"
    assert t[0]["nodes_"] == 2 and t[0]["edges_"] == 1
    # trace_id = root tx hash convention survives the raw path
    root_hash = parse_transaction_boc(rows[0][0])["hash"]
    assert t[0]["trace_id"] == root_hash
    got = {r["hash"]: r["trace_id"] for r in txs.collect()}
    assert set(got.values()) == {root_hash}


def test_block_header_parse(spark):
    """Raw block cells (public block.tlb header layout) → blocks-table
    rows: shard-id bit math, masterchain self-reference, shard-block
    master_ref, garbage → parse_error."""
    from ton_indexer_spark.functions.tx_parse import encode_block_header
    from ton_indexer_spark.sources.tx_ingest import parse_raw_blocks

    rows = [
        (encode_block_header(workchain=-1, seqno=42, gen_utime=1_700_000_000,
                             start_lt=100, end_lt=200, key_block=True),),
        (encode_block_header(workchain=0, shard_pfx_bits=2,
                             shard_prefix=0xA000000000000000, seqno=77,
                             gen_utime=1_700_000_001, start_lt=150,
                             end_lt=250, mc_ref_seqno=42),),
        ("bm9wZQ==",),
    ]
    df = spark.createDataFrame(rows, "boc string")
    got = {r["seqno"]: r for r in parse_raw_blocks(df).collect()}
    mc = got[42]
    assert mc["workchain"] == -1 and mc["mc_block_seqno"] == 42
    assert mc["shard"] == -(1 << 63)  # the canonical masterchain shard id
    assert mc["key_block"] is True and mc["parse_error"] is None
    sh = got[77]
    assert sh["workchain"] == 0 and sh["mc_block_seqno"] == 42
    assert sh["shard"] == -6917529027641081856  # 0xA800.. signed
    assert sh["start_lt"] == 150 and sh["end_lt"] == 250
    bad = got[None]
    assert bad["parse_error"] is not None


def test_jetton_master_state_decode():
    from ton_indexer_spark.functions.boc import (
        decode_jetton_master_data,
        encode_jetton_master_data,
    )

    ADMIN = "0:" + "AB" * 32
    d = decode_jetton_master_data(
        encode_jetton_master_data(total_supply=2**80, admin=ADMIN))
    assert d["total_supply"] == 2**80 and d["admin_address"] == ADMIN


def test_parse_raw_batch_keeps_big_lt_exact_with_error_rows(spark):
    """A parse_error row sharing the Arrow batch must not demote the
    int64 columns to float64: lt past 2^53 round-trips exactly."""
    import base64

    from ton_indexer_spark.functions.boc import serialize_boc
    from ton_indexer_spark.functions.tx_parse import (
        encode_message_cell,
        encode_ord_descr,
        encode_transaction_cell,
    )
    from ton_indexer_spark.sources.tx_ingest import parse_raw_transactions

    big_lt = 56_000_000_000_000_003  # > 2^53, loses precision in float64
    tx = encode_transaction_cell(
        int("aa" * 32, 16), big_lt, 1_700_000_000,
        in_msg=encode_message_cell("0:" + "CD" * 32, "0:" + "AA" * 32,
                                   value=1, created_lt=big_lt - 1,
                                   created_at=1_700_000_000),
        descr=encode_ord_descr(),
    )
    df = spark.createDataFrame(
        [(base64.b64encode(serialize_boc(tx)).decode(),), ("bm9wZQ==",)],
        "boc string",
    ).coalesce(1)  # force both rows into ONE Arrow batch
    rows = {r["parse_error"] is None: r for r in
            parse_raw_transactions(df).collect()}
    assert rows[True]["lt"] == big_lt
    assert rows[False]["parse_error"] is not None


def test_raw_ingest_classifies_bodies_across_batches(spark, tmp_path):
    """A trace finalizing in batch 2 must classify with bodies that
    arrived in batch 1 — the content store accumulates across
    micro-batches (regression: per-batch-only contents silently degraded
    cross-batch traces to 'unknown')."""
    import base64

    from pyspark.sql import functions as F

    from ton_indexer_spark.functions.boc import (
        encode_jetton_transfer,
        parse_boc,
        serialize_boc,
    )
    from ton_indexer_spark.functions.tx_parse import (
        encode_message_cell,
        encode_ord_descr,
        encode_transaction_cell,
    )
    from ton_indexer_spark.streaming.ingest import IngestPipeline, RawBocIngest

    W1 = "0:" + "AA" * 32
    USER = "0:" + "CD" * 32
    body = parse_boc(encode_jetton_transfer(
        query_id=1, amount=777, destination=USER, response=USER))
    ext = encode_message_cell(USER, W1, value=10**8, created_lt=1,
                              created_at=1_700_000_000, body=body)
    link = encode_message_cell(W1, USER, value=5, created_lt=1_000_001,
                               created_at=1_700_000_001)
    tx1 = encode_transaction_cell(
        int("aa" * 32, 16), 1_000_000, 1_700_000_000,
        in_msg=ext, out_msgs=[link], descr=encode_ord_descr(),
    )
    tx2 = encode_transaction_cell(
        int("cd" * 32, 16), 1_000_010, 1_700_000_002,
        in_msg=link, descr=encode_ord_descr(),
    )
    src = str(tmp_path / "drop")
    for i, c in enumerate([tx1, tx2]):  # one file per tx → one per batch
        spark.createDataFrame(
            [(base64.b64encode(serialize_boc(c)).decode(), 0, -1, i + 1,
              i + 1)],
            "boc string, workchain int, block_workchain int, "
            "block_seqno int, mc_block_seqno int",
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "db")
    pipe = IngestPipeline(spark, out_dir=out,
                          state_dir=str(tmp_path / "state"), classify=True)
    RawBocIngest(pipe).run_available_now(src, str(tmp_path / "ckpt"))

    acts = spark.read.parquet(f"{out}/actions")
    got = [r["type"] for r in acts.collect()]
    assert "jetton_transfer" in got, got
    jt = acts.filter(F.col("type") == "jetton_transfer").first()
    assert int(jt["amount"]) == 777


def test_inline_state_init_message_parses_body_correctly():
    """A message carrying init:(Either StateInit ^StateInit) in the INLINE
    (left) form must still yield the right opcode/body — the StateInit
    fields are consumed, not misread as the body Either bit."""
    from ton_indexer_spark.functions.boc import Builder, parse_boc
    from ton_indexer_spark.functions.tx_parse import parse_message_cell

    code = Builder().store_uint(0xC0DE, 16).end_cell()
    data = Builder().store_uint(0xDA7A, 16).end_cell()
    b = Builder()
    # int_msg_info$0 ihr_disabled bounce bounced src dst value ...
    b.store_bit(0).store_bit(1).store_bit(0).store_bit(0)
    b.store_address("0:" + "AB" * 32).store_address("0:" + "CD" * 32)
    b.store_coins(10**9).store_bit(0)
    b.store_coins(0).store_coins(0)
    b.store_uint(777, 64).store_uint(1_700_000_000, 32)
    # init: Maybe=1, Either=0 (INLINE): no split_depth, no special,
    # code ref, data ref, no library
    b.store_bit(1).store_bit(0)
    b.store_bit(0).store_bit(0)
    b.store_bit(1).store_ref(code)
    b.store_bit(1).store_ref(data)
    b.store_bit(0)
    # body: Either=0 (inline): op + query_id
    b.store_bit(0).store_uint(0x0F8A7EA5, 32).store_uint(42, 64)
    msg = parse_message_cell(b.end_cell())
    assert msg["opcode"] == 0x0F8A7EA5
    assert msg["created_lt"] == 777
    assert msg["init_state_boc"]  # captured, not a bare marker
    init = parse_boc(msg["init_state_boc"]).begin_parse()
    assert init.load_bit() == 0 and init.load_bit() == 0  # no depth/special
    assert init.load_bit() == 1  # code present
    assert init.load_ref().begin_parse().load_uint(16) == 0xC0DE


def test_hashmap_zero_bit_length_label():
    """At a full-depth fork child (m=0) the hml_long length field is
    ZERO bits wide per (#<= m) — both the builder and the parser must
    agree with spec-compliant encoders."""
    from ton_indexer_spark.functions.boc import Builder
    from ton_indexer_spark.functions.tx_parse import (
        _build_hashmap,
        _parse_hashmap,
    )

    v0 = Builder().store_uint(1, 8).end_cell()
    v1 = Builder().store_uint(2, 8).end_cell()
    # keys 0 and 1 in a 15-bit map: fork at depth 14, children at m=0
    root = _build_hashmap([(0, v0), (1, v1)], 15)
    got = {k: s.load_ref().begin_parse().load_uint(8)
           for k, s in _parse_hashmap(root, 15)}
    assert got == {0: 1, 1: 2}

    # hand-encode the spec layout: leaf child label = hml_long '10' with a
    # 0-bit length field and nothing else before the value ref
    leaf0 = Builder().store_bit(1).store_bit(0).store_ref(v0).end_cell()
    leaf1 = Builder().store_bit(1).store_bit(0).store_ref(v1).end_cell()
    fork = Builder().store_bit(1).store_bit(0)  # hml_long
    fork.store_uint(14, 4)                      # len=14 in (#<= 15)=4 bits
    for _ in range(14):
        fork.store_bit(0)                       # label bits (all zero)
    fork.store_ref(leaf0).store_ref(leaf1)
    got2 = {k: s.load_ref().begin_parse().load_uint(8)
            for k, s in _parse_hashmap(fork.end_cell(), 15)}
    assert got2 == {0: 1, 1: 2}


def test_nft_auction_state_decode_roundtrip(spark):
    """v3r3 auction data cells decode into the auctions dimension; a
    garbage cell lands as a decode_error row instead of failing the
    batch."""
    from ton_indexer_spark.functions.boc import encode_nft_auction_data
    from ton_indexer_spark.sources.tx_ingest import nft_auctions_from_states

    MP = "0:" + "AA" * 32
    OWN = "0:" + "BB" * 32
    boc = encode_nft_auction_data(
        is_end=False, last_member=None, last_bid=0, end_time=1_700_000_000,
        nft_owner_address=OWN, mp_fee_factor=5, mp_fee_base=100,
        royalty_fee_factor=3, royalty_fee_base=100,
        marketplace_fee_address=MP, royalty_address=OWN,
        marketplace_address=MP, min_bid=10**9, max_bid=5 * 10**9,
        min_step=10**8, step_time=300,
    )
    df = spark.createDataFrame(
        [("0:" + "CC" * 32, boc), ("0:" + "DD" * 32, "not-a-boc")],
        "address string, data_boc string",
    )
    rows = {r["address"]: r for r in nft_auctions_from_states(df).collect()}
    good = rows["0:" + "CC" * 32]
    assert good["decode_error"] is None
    assert good["nft_owner_address"] == OWN
    assert int(good["min_bid"]) == 10**9
    assert int(good["max_bid"]) == 5 * 10**9
    assert good["end_time"] == 1_700_000_000
    assert good["mp_fee_factor"] == 5 and good["royalty_fee_factor"] == 3
    assert good["marketplace_address"] == MP
    assert not good["is_end"] and not good["is_canceled"]
    bad = rows["0:" + "DD" * 32]
    assert bad["decode_error"] is not None


def test_jetton_wallets_dimension_router(spark):
    """The production dimension router: canonical-code accounts take the
    layout fast path, non-canonical accounts EXECUTE get_wallet_data on
    the real TVM — both produce the same dimension fields, and the
    `path` column carries the split for hit-rate accounting."""
    import json as _json
    import os as _os

    from ton_indexer_spark.functions.boc import encode_jetton_wallet_data
    from ton_indexer_spark.functions.interfaces import (
        CANONICAL_JETTON_WALLET_HASHES,
    )
    from ton_indexer_spark.sources.tx_ingest import (
        jetton_wallets_dimension,
    )

    OWNER = "0:" + "AB" * 32
    MASTER = "0:" + "CD" * 32
    fast_raw = encode_jetton_wallet_data(
        balance=42, owner=OWNER, jetton=MASTER)
    golden = _json.load(open(_os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "ton_indexer_spark", "tvm", "golden", "get_methods.json")))
    gw = next(r for r in golden["rows"]
              if r["kind"] == "JettonWallet" and r["exit_code"] == 0
              and r["code_hash"]
              not in CANONICAL_JETTON_WALLET_HASHES)
    df = spark.createDataFrame(
        [("0:FAST" + "0" * 58, CANONICAL_JETTON_WALLET_HASHES[0],
          fast_raw, None),
         (gw["account"], gw["code_hash"], gw["data_boc"],
          gw["code_boc"])],
        "address string, code_hash string, data_boc string, "
        "code_boc string",
    )
    rows = {r["address"]: r
            for r in jetton_wallets_dimension(df).collect()}
    fast = rows["0:FAST" + "0" * 58]
    assert fast["path"] == "layout" and fast["error"] is None
    assert int(fast["balance"]) == 42
    assert fast["owner"] == OWNER and fast["jetton"] == MASTER
    slow = rows[gw["account"]]
    assert slow["path"] == "tvm" and slow["error"] is None
    assert slow["owner"] == gw["expected"]["owner"]
    assert slow["jetton"] == gw["expected"]["jetton"]
