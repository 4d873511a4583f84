"""Reference-compatible API facade.

One object, one method per `/api/v3/*` read route (ton-index-go/
main.go:2306-2396), with the reference's parameter names.  Each method
returns the DataFrame plan — a serving tier calls `.collect()` /
`.toJSON()` per request, or registers the plans as views for SQL access.

Route map (reference → here):

| /api/v3 route                 | method                         |
|-------------------------------|--------------------------------|
| /blocks, /masterchainInfo     | blocks                         |
| /transactions                 | transactions                   |
| /transactionsByMessage        | transactions(msg_opcode/…)     |
| /transactionsByMasterchainBlock | transactions_by_masterchain_block |
| /messages                     | messages                       |
| /actions (v2)                 | actions                        |
| /traces                       | traces                         |
| /events (deprecated)          | events                         |
| /account, /addressInformation | account, address_information   |
| /jetton/masters               | jetton_masters                 |
| /jetton/wallets               | jetton_wallets                 |
| /jetton/transfers             | jetton_transfers               |
| /jetton/burns                 | (jetton_transfers shape; burns table via catalog) |
| /nft/items                    | nft_items                      |
| /nft/transfers                | nft_transfers                  |
| /multisig                     | multisig                       |
| /walletStates                 | wallet_states                  |
| /walletInformation, /wallet   | wallet_information             |
| /runGetMethod, /estimateFee   | run_get_method, estimate_fee   |
| /addressBook                  | address_book                   |
| /metadata                     | metadata                       |
| /topAccountsByBalance         | top_accounts                   |
| /masterchainBlockShardState   | masterchain_block_shard_state  |
| /pendingTransactions          | pending_transactions           |
| /pendingTraces                | pending_traces                 |
| /pendingActions               | pending_actions                |
| metadata-cache /address_info  | address_info                   |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark import plans
from ton_indexer_spark.catalog import Catalog


class TonIndexerApi:
    def __init__(self, spark: SparkSession, data_dir: str):
        self.cat = Catalog(spark, data_dir)

    # -- blocks -------------------------------------------------------------
    def blocks(self, **kw) -> DataFrame:
        return plans.blocks_query(self.cat, **kw)

    def block_exists(self, workchain: int, seqno: int) -> bool:
        return plans.block_exists(self.cat, workchain, seqno)

    def masterchain_block_shards(self, seqno: int, **kw) -> DataFrame:
        return plans.masterchain_block_shards(self.cat, seqno, **kw)

    def masterchain_block_shard_state(self, seqno: int) -> DataFrame:
        """/api/v3/masterchainBlockShardState (main.go:2310): the shard
        tips a masterchain block references — per-shard arg-max over
        committed blocks (plans/blocks.py derivation of the reference's
        shard_state table)."""
        return plans.masterchain_block_shard_state(self.cat, seqno)

    def masterchain_info(self) -> DataFrame:
        return plans.masterchain_info(self.cat)

    # -- facts --------------------------------------------------------------
    def transactions(self, **kw) -> DataFrame:
        return plans.transactions_query(self.cat, **kw)

    def messages(self, **kw) -> DataFrame:
        return plans.messages_query(self.cat, **kw)

    def actions(self, **kw) -> DataFrame:
        return plans.actions_by_account(self.cat, **kw)

    def traces(self, **kw) -> DataFrame:
        return plans.traces_query(self.cat, **kw)

    def events(self, **kw) -> DataFrame:
        """/api/v3/events (main.go:2359, deprecated alias of /traces):
        the traces plan with actions always hydrated
        (main.go:1304-1306 forces IncludeActions for this path)."""
        kw["include_actions"] = True
        return plans.traces_query(self.cat, **kw)

    def account(self, address: str) -> DataFrame:
        """/api/v3/account (main.go:2371): alias of addressInformation."""
        return self.address_information(address)

    def wallet(self, address: str) -> DataFrame:
        """/api/v3/wallet (main.go:2373): alias of walletInformation."""
        return self.wallet_information(address)

    def adjacent_transactions(self, tx_hash: str, **kw) -> DataFrame:
        return plans.adjacent_transactions(self.cat, tx_hash, **kw)

    def transactions_by_masterchain_block(self, seqno: int,
                                          **kw) -> DataFrame:
        """/api/v3/transactionsByMasterchainBlock (main.go:2319): every
        transaction committed under the mc block — mc_block_seqno filter
        on the same transactions plan (partition-prunable at scale)."""
        return plans.transactions_query(self.cat, mc_seqno=seqno, **kw)

    def transactions_by_message(self, **kw) -> DataFrame:
        return plans.transactions_by_message(self.cat, **kw)

    # -- tokens -------------------------------------------------------------
    def jetton_masters(self, **kw) -> DataFrame:
        return plans.jetton_masters_query(self.cat, **kw)

    def jetton_wallets(self, **kw) -> DataFrame:
        return plans.wallets_by_jetton(self.cat, **kw)

    def jetton_transfers(self, **kw) -> DataFrame:
        return plans.jetton_transfers_query(self.cat, **kw)

    def nft_items(self, **kw) -> DataFrame:
        return plans.nft_items_listing(self.cat, **kw)

    def nft_transfers(self, **kw) -> DataFrame:
        return plans.nft_transfers_query(self.cat, **kw)

    def jetton_burns(self, **kw) -> DataFrame:
        return plans.jetton_burns_query(self.cat, **kw)

    def nft_collections(self, **kw) -> DataFrame:
        return plans.nft_collections_query(self.cat, **kw)

    def nft_sales(self, **kw) -> DataFrame:
        return plans.nft_sales_query(self.cat, **kw)

    def account_states(self, **kw) -> DataFrame:
        return plans.account_states_query(self.cat, **kw)

    def address_information(self, address: str) -> DataFrame:
        return plans.address_information(self.cat, address)

    def wallet_states(self, **kw) -> DataFrame:
        """/api/v3/walletStates (main.go:690-709): accountStates page +
        decoded wallet columns; address filter required."""
        return plans.wallet_states_query(self.cat, **kw)

    def wallet_information(self, address: str) -> DataFrame:
        """/api/v3/walletInformation and /wallet (main.go:2374-2375):
        single-account wallet info off the states dimension."""
        return plans.wallet_information(self.cat, address)

    def run_get_method(self, address: str, method: str,
                       stack: list | None = None, executor=None) -> dict:
        """/api/v3/runGetMethod (main.go:2377): latest-state lookup +
        pluggable TVM executor (functions/getmethod.py seam; standard
        wallet get-methods run builtin, no external TVM needed)."""
        from ton_indexer_spark.functions.getmethod import run_get_method

        return run_get_method(self.cat, address, method, stack, executor)

    def estimate_fee(self, address: str, body_b64: str,
                     executor=None) -> dict:
        """/api/v3/estimateFee (main.go:2378): fee quadruple through the
        same seam."""
        from ton_indexer_spark.functions.getmethod import estimate_fee

        return estimate_fee(self.cat, address, body_b64, executor)

    # -- pending overlay (main.go:2317, 2362-2363) ---------------------------
    def pending_transactions(self, pending_txs: DataFrame,
                             pending_msgs: DataFrame, **kw) -> DataFrame:
        """/api/v3/pendingTransactions: emulated/open transactions of the
        scoped pending traces, minus already-finalized ones.  The pending
        DataFrames come from streaming/emulate.py or the incremental
        assembler's open_rows() (the reference's Redis overlay tier)."""
        return plans.pending_transactions_query(
            self.cat, pending_txs, pending_msgs, **kw)

    def pending_traces(self, pending_txs: DataFrame,
                       pending_msgs: DataFrame, **kw) -> DataFrame:
        """/api/v3/pendingTraces: still-pending traces hydrated with their
        ordered member transactions, trace_state='pending'."""
        return plans.pending_traces_query(
            self.cat, pending_txs, pending_msgs, **kw)

    def pending_actions(self, pending_actions: DataFrame,
                        pending_msgs: DataFrame | None = None,
                        **kw) -> DataFrame:
        """/api/v3/pendingActions: provisional actions of pending traces
        (the incremental classifier's pending_actions overlay sink)."""
        return plans.pending_actions_query(
            self.cat, pending_actions, pending_msgs, **kw)

    def dns_records(self, **kw) -> DataFrame:
        return plans.dns_records_query(self.cat, **kw)

    def balance_changes(self) -> DataFrame:
        """/api/v3/balanceChanges over transactions+messages
        (operators/balances.py — value flow per account per tx)."""
        from ton_indexer_spark.operators.balances import ton_balance_changes

        return ton_balance_changes(self.cat.transactions, self.cat.messages)

    def multisig(self, **kw) -> DataFrame:
        return plans.multisig_query(self.cat, **kw)

    def multisig_orders(self, **kw) -> DataFrame:
        return plans.multisig_orders_query(self.cat, **kw)

    def vesting(self, **kw) -> DataFrame:
        return plans.vesting_query(self.cat, **kw)

    # -- enrichment dims ----------------------------------------------------
    def address_book(self) -> DataFrame:
        return plans.address_book(self.cat)

    def address_info(
        self,
        addresses: list[str],
        include_metadata: bool = True,
        include_address_book: bool = True,
    ) -> dict[str, DataFrame]:
        """ton-metadata-cache POST /address_info (main.go:112-150): batch
        metadata + address-book lookup for an address list.  The sidecar's
        CDC-fed Redis cache dissolves — the plans ARE the derivation,
        filtered to the requested set (request lists are page-sized, so
        the IN-filter prunes at the scan)."""
        out: dict[str, DataFrame] = {}
        if include_metadata:
            out["metadata"] = plans.metadata_union(self.cat).filter(
                F.col("address").isin(addresses)
            )
        if include_address_book:
            out["address_book"] = plans.address_book(self.cat).filter(
                F.col("account").isin(addresses)
            )
        return out

    def metadata(self) -> DataFrame:
        return plans.metadata_union(self.cat)

    def top_accounts(self, k: int = 100) -> DataFrame:
        return plans.top_accounts_by_balance(self.cat, k)

    @staticmethod
    def decode(body_b64: str) -> dict:
        """/api/v3/decode: TL-B message-body decode (functions/boc.py)."""
        from ton_indexer_spark.functions.boc import decode_message_body

        return decode_message_body(body_b64)
