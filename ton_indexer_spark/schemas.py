"""StructTypes for the TON data model (SURVEY.md §1, FIXTURES.md).

Minimal-faithful subset of the reference schema
(ton-index-worker/ton-index-postgres/src/migrate.cpp:114-699):
- hashes (`tonhash`) and addresses (`tonaddr`) are STRING (base64 / raw form);
- Postgres enums are STRING (validated at ingest);
- composite action payloads are nested StructTypes;
- `numeric` token amounts are DECIMAL(38,0);
- lt / unix-seconds are BIGINT (the reference's own integer-time convention).

Partitioning spec (the 100 TB layout — replaces the reference's 40 btree
indexes, create_indexes.sql:1-94):
- fact tables (transactions, messages, traces, actions) partitioned by
  ``mc_bucket = mc_seqno div 1_000_000`` (~coarse time), sorted within files
  by the ClickHouse ORDER BY keys (InsertManagerClickhouse.cpp:186,219):
  transactions (lt, account, hash), messages (msg_hash), actions
  (trace_end_lt, trace_id).  Parquet min/max + bloom on hash columns give
  point-lookup pruning; account-scoped access paths come from the derived
  `action_accounts`-style tables, not from secondary indexes.
- dimension tables are unpartitioned, compacted, last-writer-wins by
  ``last_transaction_lt`` (sources/writer.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- fact tables

BLOCKS = T.StructType(
    [
        T.StructField("workchain", T.IntegerType()),
        T.StructField("shard", T.LongType()),
        T.StructField("seqno", T.IntegerType()),
        T.StructField("mc_block_seqno", T.IntegerType()),
        T.StructField("gen_utime", T.LongType()),
        T.StructField("start_lt", T.LongType()),
        T.StructField("end_lt", T.LongType()),
        T.StructField("tx_count", T.IntegerType()),
        T.StructField("key_block", T.BooleanType()),
        T.StructField(
            "prev_blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("workchain", T.IntegerType()),
                        T.StructField("shard", T.LongType()),
                        T.StructField("seqno", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# migrate.cpp:160-233 (~70 cols in reference; faithful core subset)
TRANSACTIONS = T.StructType(
    [
        T.StructField("account", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("lt", T.LongType()),
        T.StructField("block_workchain", T.IntegerType()),
        T.StructField("block_shard", T.LongType()),
        T.StructField("block_seqno", T.IntegerType()),
        T.StructField("mc_block_seqno", T.IntegerType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("prev_trans_hash", T.StringType()),
        T.StructField("prev_trans_lt", T.LongType()),
        T.StructField("now", T.LongType()),
        T.StructField("orig_status", T.StringType()),  # uninit|frozen|active|nonexist
        T.StructField("end_status", T.StringType()),
        T.StructField("total_fees", T.LongType()),
        T.StructField("account_state_hash_before", T.StringType()),
        T.StructField("account_state_hash_after", T.StringType()),
        T.StructField("descr", T.StringType()),  # ord|storage|tick_tock|...
        T.StructField("aborted", T.BooleanType()),
        T.StructField("compute_exit_code", T.IntegerType()),
        T.StructField("compute_gas_used", T.LongType()),
        T.StructField("compute_gas_fees", T.LongType()),
    ]
)

# migrate.cpp:235-262 — each internal message appears twice (in/out)
MESSAGES = T.StructType(
    [
        T.StructField("tx_hash", T.StringType()),
        T.StructField("tx_lt", T.LongType()),
        T.StructField("tx_now", T.LongType()),
        T.StructField("mc_seqno", T.IntegerType()),
        T.StructField("msg_hash", T.StringType()),
        T.StructField("msg_hash_norm", T.StringType()),
        T.StructField("direction", T.StringType()),  # in|out
        T.StructField("trace_id", T.StringType()),
        T.StructField("source", T.StringType()),  # NULL → external-in
        T.StructField("destination", T.StringType()),  # NULL → log/external-out
        T.StructField("value", T.LongType()),
        T.StructField("fwd_fee", T.LongType()),
        T.StructField("ihr_fee", T.LongType()),
        T.StructField("created_lt", T.LongType()),
        T.StructField("created_at", T.LongType()),
        # LongType: opcodes are uint32 on the wire; a signed int32 column
        # cannot hold e.g. 0xd53276db (excesses) without sign games — the
        # reference normalizes every comparison via `opcode & 0xFFFFFFFF`
        # (tree_utils.py:47); we store unsigned-capable and normalize at
        # tree-build time (classifier/tree.py::norm_opcode)
        T.StructField("opcode", T.LongType()),
        T.StructField("bounce", T.BooleanType()),
        T.StructField("bounced", T.BooleanType()),
        T.StructField("body_hash", T.StringType()),
        T.StructField("init_state_hash", T.StringType()),
    ]
)

MESSAGE_CONTENTS = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("body", T.StringType()),  # base64 BOC
    ]
)

# ------------------------------------------------------- graph/session tables

TRACES = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("external_hash", T.StringType()),
        T.StructField("external_hash_norm", T.StringType()),
        T.StructField("mc_seqno_start", T.IntegerType()),
        T.StructField("mc_seqno_end", T.IntegerType()),
        T.StructField("start_lt", T.LongType()),
        T.StructField("end_lt", T.LongType()),
        T.StructField("start_utime", T.LongType()),
        T.StructField("end_utime", T.LongType()),
        T.StructField("state", T.StringType()),  # complete|pending|broken
        T.StructField("edges_", T.LongType()),
        T.StructField("pending_edges_", T.LongType()),
        T.StructField("nodes_", T.LongType()),
        T.StructField("classification_state", T.StringType()),
    ]
)

# Token-amount columns: the reference stores them as Postgres `numeric`
# (arbitrary precision, migrate.cpp:313-383); Spark's widest exact type
# is DecimalType(38,0) (max 10^38-1 ≈ 2^126.2).  uint256 OVERFLOW POLICY
# (SURVEY §1.2, tests/test_uint256_policy.py):
#   - TEP-74 `Coins` is VarUInteger 16, max 2^120-1 ≈ 1.3e36 — ALWAYS
#     representable here, so spec-conformant amounts are exact end-to-end
#     (decode → schema → aggregation);
#   - values outside a column's domain (genuinely uint256-typed ids,
#     adversarial bodies) keep full fidelity at the decode layer (python
#     ints) and become NULL at the serialize boundary — never a silent
#     two's-complement wrap, never saturation; full fidelity stays
#     recoverable from the raw body BOC / *_boc string twins
#     (classifier/classify.py::_bound_numeric).
DEC38 = T.DecimalType(38, 0)

JETTON_TRANSFER_DATA = T.StructType(
    [
        T.StructField("response_destination", T.StringType()),
        T.StructField("forward_amount", DEC38),
        T.StructField("query_id", DEC38),
        T.StructField("custom_payload", T.StringType()),
        T.StructField("forward_payload", T.StringType()),
        T.StructField("comment", T.StringType()),
        T.StructField("is_encrypted_comment", T.BooleanType()),
    ]
)

DEX_TRANSFER_DETAILS = T.StructType(
    [
        T.StructField("amount", DEC38),
        T.StructField("asset", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("source_jetton_wallet", T.StringType()),
        T.StructField("destination_jetton_wallet", T.StringType()),
    ]
)

JETTON_SWAP_DATA = T.StructType(
    [
        T.StructField("dex", T.StringType()),
        T.StructField("sender", T.StringType()),
        T.StructField("dex_incoming_transfer", DEX_TRANSFER_DETAILS),
        T.StructField("dex_outgoing_transfer", DEX_TRANSFER_DETAILS),
        T.StructField(
            "peer_swaps",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("asset_in", T.StringType()),
                        T.StructField("amount_in", DEC38),
                        T.StructField("asset_out", T.StringType()),
                        T.StructField("amount_out", DEC38),
                    ]
                )
            ),
        ),
        T.StructField("min_out_amount", DEC38),
    ]
)

NFT_TRANSFER_DATA = T.StructType(
    [
        T.StructField("is_purchase", T.BooleanType()),
        T.StructField("price", DEC38),
        T.StructField("query_id", DEC38),
        T.StructField("custom_payload", T.StringType()),
        T.StructField("forward_payload", T.StringType()),
        T.StructField("forward_amount", DEC38),
        T.StructField("response_destination", T.StringType()),
        T.StructField("nft_item_index", DEC38),
        T.StructField("marketplace", T.StringType()),
    ]
)

TON_TRANSFER_DATA = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("encrypted", T.BooleanType()),
    ]
)

# migrate.cpp:533-586 — composite payloads as nested structs
ACTIONS = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("action_id", T.StringType()),
        T.StructField("start_lt", T.LongType()),
        T.StructField("end_lt", T.LongType()),
        T.StructField("start_utime", T.LongType()),
        T.StructField("end_utime", T.LongType()),
        T.StructField("trace_end_lt", T.LongType()),
        T.StructField("trace_end_utime", T.LongType()),
        T.StructField("trace_mc_seqno_end", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("source_secondary", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("destination_secondary", T.StringType()),
        T.StructField("asset", T.StringType()),
        T.StructField("asset_secondary", T.StringType()),
        T.StructField("asset2", T.StringType()),
        T.StructField("asset2_secondary", T.StringType()),
        T.StructField("opcode", T.LongType()),
        T.StructField("tx_hashes", T.ArrayType(T.StringType())),
        T.StructField("type", T.StringType()),
        T.StructField("value", DEC38),
        T.StructField("amount", DEC38),
        T.StructField("success", T.BooleanType()),
        T.StructField("jetton_transfer_data", JETTON_TRANSFER_DATA),
        T.StructField("jetton_swap_data", JETTON_SWAP_DATA),
        T.StructField("nft_transfer_data", NFT_TRANSFER_DATA),
        T.StructField("ton_transfer_data", TON_TRANSFER_DATA),
        T.StructField("parent_action_id", T.StringType()),
        T.StructField("ancestor_type", T.ArrayType(T.StringType())),
        T.StructField("value_extra_currencies", T.MapType(T.StringType(), T.StringType())),
    ]
)

# migrate.cpp:588-599 — write-time exploded (action × account) access path
ACTION_ACCOUNTS = T.StructType(
    [
        T.StructField("action_id", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("account", T.StringType()),
        T.StructField("trace_end_lt", T.LongType()),
        T.StructField("action_end_lt", T.LongType()),
        T.StructField("trace_end_utime", T.LongType()),
        T.StructField("action_end_utime", T.LongType()),
    ]
)

# --------------------------------------------------- latest-state dimensions

ACCOUNT_STATES = T.StructType(
    [
        T.StructField("account", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("balance", T.LongType()),
        T.StructField("account_status", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("last_trans_hash", T.StringType()),
        T.StructField("last_trans_lt", T.LongType()),
        T.StructField("frozen_hash", T.StringType()),
        T.StructField("data_hash", T.StringType()),
        T.StructField("code_hash", T.StringType()),
    ]
)

JETTON_MASTERS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("total_supply", DEC38),
        T.StructField("mintable", T.BooleanType()),
        T.StructField("admin_address", T.StringType()),
        T.StructField("jetton_content", T.StringType()),  # JSON
        T.StructField("jetton_wallet_code_hash", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
        T.StructField("code_hash", T.StringType()),
        T.StructField("data_hash", T.StringType()),
    ]
)

JETTON_WALLETS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("balance", DEC38),
        T.StructField("owner", T.StringType()),
        T.StructField("jetton", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
        T.StructField("code_hash", T.StringType()),
        T.StructField("data_hash", T.StringType()),
        T.StructField("mintless_is_claimed", T.BooleanType()),
        T.StructField("mintless_amount", DEC38),
        T.StructField("mintless_start_from", T.LongType()),
        T.StructField("mintless_expire_at", T.LongType()),
    ]
)

JETTON_TRANSFERS = T.StructType(
    [
        T.StructField("tx_hash", T.StringType()),
        T.StructField("tx_lt", T.LongType()),
        T.StructField("tx_now", T.LongType()),
        T.StructField("tx_aborted", T.BooleanType()),
        T.StructField("mc_seqno", T.IntegerType()),
        T.StructField("query_id", DEC38),
        T.StructField("amount", DEC38),
        T.StructField("source", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("jetton_wallet_address", T.StringType()),
        T.StructField("jetton_master_address", T.StringType()),
        T.StructField("response_destination", T.StringType()),
        T.StructField("custom_payload", T.StringType()),
        T.StructField("forward_ton_amount", DEC38),
        T.StructField("forward_payload", T.StringType()),
        T.StructField("trace_id", T.StringType()),
    ]
)

NFT_COLLECTIONS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("next_item_index", DEC38),
        T.StructField("owner_address", T.StringType()),
        T.StructField("collection_content", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
        T.StructField("code_hash", T.StringType()),
        T.StructField("data_hash", T.StringType()),
    ]
)

NFT_ITEMS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("init", T.BooleanType()),
        T.StructField("index", DEC38),
        T.StructField("collection_address", T.StringType()),
        T.StructField("owner_address", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
        T.StructField("code_hash", T.StringType()),
        T.StructField("data_hash", T.StringType()),
    ]
)

GETGEMS_NFT_SALES = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("nft_address", T.StringType()),
        T.StructField("nft_owner_address", T.StringType()),
        T.StructField("full_price", DEC38),
        T.StructField("marketplace_address", T.StringType()),
        T.StructField("marketplace_fee", DEC38),
        T.StructField("royalty_amount", DEC38),
        T.StructField("is_complete", T.BooleanType()),
        T.StructField("last_transaction_lt", T.LongType()),
    ]
)

DNS_ENTRIES = T.StructType(
    [
        T.StructField("nft_item_address", T.StringType()),
        T.StructField("nft_item_owner", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("dns_wallet", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
    ]
)

CONTRACT_METHODS = T.StructType(
    [
        T.StructField("code_hash", T.StringType()),
        T.StructField("methods", T.ArrayType(T.LongType())),
    ]
)

ADDRESS_METADATA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("type", T.StringType()),  # jetton_masters|nft_items|nft_collections
        T.StructField("name", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("valid", T.BooleanType()),
    ]
)

MULTISIG_ORDERS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("multisig_address", T.StringType()),
        T.StructField("order_seqno", DEC38),
        T.StructField("threshold", T.LongType()),
        T.StructField("sent_for_execution", T.BooleanType()),
        T.StructField("approvals_num", T.LongType()),
        T.StructField("expiration_date", T.LongType()),
        T.StructField("signers", T.ArrayType(T.StringType())),
        T.StructField("last_transaction_lt", T.LongType()),
    ]
)

VESTING_CONTRACTS = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("vesting_start_time", T.LongType()),
        T.StructField("vesting_total_duration", T.LongType()),
        T.StructField("unlock_period", T.LongType()),
        T.StructField("cliff_duration", T.LongType()),
        T.StructField("vesting_total_amount", DEC38),
        T.StructField("vesting_sender_address", T.StringType()),
        T.StructField("owner_address", T.StringType()),
        T.StructField("last_transaction_lt", T.LongType()),
    ]
)

VESTING_WHITELIST = T.StructType(
    [
        T.StructField("vesting_contract_address", T.StringType()),
        T.StructField("wallet_address", T.StringType()),
    ]
)

MULTISIG = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("threshold", T.IntegerType()),
        T.StructField("signers", T.ArrayType(T.StringType())),
        T.StructField("proposers", T.ArrayType(T.StringType())),
        T.StructField("last_transaction_lt", T.LongType()),
    ]
)
