"""Endpoint-shaped query builders mirroring the reference's REST surface
(`ton-index-go/main.go:2306-2396` routes → `index/crud/*` SQL builders).

Each builder is a pure DataFrame function over a Catalog of TON-schema
tables: filters → joins → deterministic sort → page → enrichment, composed
from operators/.  Where the reference runs 4-5 sequential SQL queries per
request and stitches results in Go hash maps (crud_transactions.go:202-261),
these plans express the whole request as ONE composed Spark plan — broadcast
enrichment joins + collect_list(struct) replace the app-side loops.
"""

from ton_indexer_spark.plans.transactions import (
    adjacent_transactions,
    transactions_by_message,
    transactions_query,
)
from ton_indexer_spark.plans.messages import messages_query
from ton_indexer_spark.plans.actions import actions_by_account
from ton_indexer_spark.plans.traces import traces_query
from ton_indexer_spark.plans.dimensions import (
    address_book,
    metadata_union,
    nft_items_listing,
    top_accounts_by_balance,
    wallets_by_jetton,
)
from ton_indexer_spark.plans.blocks import (
    block_exists,
    blocks_query,
    masterchain_block_shard_state,
    masterchain_block_shards,
    masterchain_info,
)
from ton_indexer_spark.plans.pending import (
    pending_actions_query,
    pending_traces_query,
    pending_transactions_query,
)
from ton_indexer_spark.plans.listings import (
    account_states_query,
    address_information,
    dns_records_query,
    jetton_burns_query,
    jetton_masters_query,
    jetton_transfers_query,
    multisig_query,
    nft_collections_query,
    nft_sales_query,
    multisig_orders_query,
    nft_transfers_query,
    vesting_query,
    wallet_information,
    wallet_states_query,
)

__all__ = [
    "transactions_query",
    "messages_query",
    "actions_by_account",
    "traces_query",
    "address_book",
    "metadata_union",
    "nft_items_listing",
    "top_accounts_by_balance",
    "wallets_by_jetton",
    "blocks_query",
    "block_exists",
    "jetton_masters_query",
    "jetton_transfers_query",
    "nft_transfers_query",
    "multisig_query",
    "adjacent_transactions",
    "transactions_by_message",
    "masterchain_block_shards",
    "masterchain_block_shard_state",
    "pending_actions_query",
    "pending_traces_query",
    "pending_transactions_query",
    "jetton_burns_query",
    "nft_collections_query",
    "nft_sales_query",
    "account_states_query",
    "address_information",
    "dns_records_query",
    "masterchain_info",
    "multisig_orders_query",
    "vesting_query",
    "wallet_information",
    "wallet_states_query",
]
