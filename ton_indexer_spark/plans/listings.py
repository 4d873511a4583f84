"""Remaining listing endpoints: jetton masters / jetton transfers & burns /
NFT transfers / multisig — completing the reference's `/api/v3/*` read
families (crud_jettons.go, crud_nft.go:transfers, crud_multisig).

All share the same spine: conjunctive filters → deterministic sort with
tiebreakers → page; the event listings sort by (tx_now|tx_lt, tx_hash)
exactly like the reference's transfer endpoints.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import filter_by_array, filter_range, paginate


def jetton_masters_query(
    cat: Catalog,
    addresses: Sequence[str] | None = None,
    admin: str | None = None,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    m = filter_by_array(cat.jetton_masters, "address", addresses)
    if admin is not None:
        m = m.filter(F.col("admin_address") == admin)
    return paginate(m, sort=[("address", "asc")], limit=limit, offset=offset)


def jetton_transfers_query(
    cat: Catalog,
    account: str | None = None,
    jetton: str | None = None,
    start_utime: int | None = None,
    end_utime: int | None = None,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    t = cat.jetton_transfers
    if account is not None:
        # the reference matches either leg (source or destination)
        t = t.filter(
            (F.col("source") == account) | (F.col("destination") == account)
        )
    if jetton is not None:
        t = t.filter(F.col("jetton_master_address") == jetton)
    t = filter_range(t, "tx_now", start_utime, end_utime)
    return paginate(
        t,
        sort=[("tx_now", sort), ("tx_lt", sort), ("tx_hash", "asc")],
        limit=limit,
        offset=offset,
    )


def nft_transfers_query(
    cat: Catalog,
    owner: str | None = None,
    item: str | None = None,
    collection: str | None = None,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    t = cat.nft_transfers
    if owner is not None:
        t = t.filter(
            (F.col("old_owner") == owner) | (F.col("new_owner") == owner)
        )
    if item is not None:
        t = t.filter(F.col("nft_item_address") == item)
    if collection is not None:
        t = t.filter(F.col("nft_collection_address") == collection)
    return paginate(
        t,
        sort=[("tx_now", sort), ("tx_lt", sort), ("tx_hash", "asc")],
        limit=limit,
        offset=offset,
    )


def multisig_query(
    cat: Catalog,
    address: str | None = None,
    signer: str | None = None,
    limit: int = 100,
) -> DataFrame:
    m = cat.multisig
    if address is not None:
        m = m.filter(F.col("address") == address)
    if signer is not None:
        m = m.filter(F.array_contains(F.col("signers"), signer))
    return paginate(m, sort=[("address", "asc")], limit=limit)
