"""Dimension-table endpoints: accounts, jettons, NFTs, metadata, address book.

Mirrors:
- crud_accounts.go:223      — top accounts by balance (A4);
- crud_jettons.go:56-104    — jetton wallets by jetton, zero-balance
  exclusion with mintless coalesce (J12);
- crud_nft.go:62-64         — nft_items ⋈ nft_collections ⋈ sales (J11);
- crud.go:101-110           — 3-branch metadata UNION ALL + left joins (J5/U1);
- crud.go:228-346           — address book: latest_account_states ⋈
  contract_methods + shortest-domain DISTINCT ON (J4/A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import first_per_group, top_k


def top_accounts_by_balance(cat: Catalog, k: int = 100) -> DataFrame:
    return top_k(
        cat.latest_account_states, "balance", k, tiebreakers=["account"]
    ).select("account", "balance", "account_status", "last_trans_lt")


def wallets_by_jetton(
    cat: Catalog,
    jetton: str | None = None,
    owner: str | None = None,
    exclude_zero_balance: bool = True,
    limit: int = 100,
) -> DataFrame:
    w = cat.jetton_wallets
    if jetton is not None:
        w = w.filter(F.col("jetton") == jetton)
    if owner is not None:
        w = w.filter(F.col("owner") == owner)
    if exclude_zero_balance:
        # balance + coalesce(mintless_amount, 0) > 0 (crud_jettons.go:102-104)
        w = w.filter(
            F.col("balance")
            + F.coalesce(F.col("mintless_amount"), F.lit(0).cast("decimal(38,0)"))
            > 0
        )
    return (
        w.orderBy(F.col("balance").desc(), F.col("address").asc())
        .limit(limit)
        .select("address", "balance", "owner", "jetton", "mintless_amount",
                "last_transaction_lt")
    )


def nft_items_listing(
    cat: Catalog,
    collection: str | None = None,
    owner: str | None = None,
    limit: int = 100,
) -> DataFrame:
    items = cat.nft_items
    if collection is not None:
        items = items.filter(F.col("collection_address") == collection)
    if owner is not None:
        items = items.filter(F.col("owner_address") == owner)
    cols = cat.nft_collections.select(
        F.col("address").alias("collection_address"),
        F.col("owner_address").alias("collection_owner"),
        F.col("collection_content"),
    )
    sales = cat.getgems_nft_sales.filter(~F.col("is_complete")).select(
        F.col("nft_address").alias("address"),
        F.col("address").alias("sale_address"),
        F.col("full_price").alias("sale_price"),
    )
    # no forced broadcast on the dimension sides: real-chain cardinalities
    # (millions of active sales, metadata for every address) can exceed the
    # broadcast budget — AQE picks broadcast from RUNTIME size when the dim
    # is actually small, and falls back to shuffle join when it is not
    return (
        items.join(cols, "collection_address", "left")
        .join(sales, "address", "left")
        .orderBy(F.col("index").asc(), F.col("address").asc())
        .limit(limit)
    )


def metadata_union(cat: Catalog) -> DataFrame:
    """UNION ALL of (nft_items, nft_collections, jetton_masters) each left-
    joined to address_metadata (crud.go:101-110)."""
    md = cat.address_metadata

    def branch(df: DataFrame, addr_col: str, typ: str) -> DataFrame:
        m = md.filter(F.col("type") == typ).select(
            F.col("address"), F.col("name"), F.col("symbol"), F.col("valid")
        )
        return (
            df.select(F.col(addr_col).alias("address"))
            .join(m, "address", "left")
            .select(
                "address",
                F.lit(typ).alias("entity_type"),
                "name",
                "symbol",
                F.coalesce(F.col("valid"), F.lit(False)).alias("valid"),
            )
        )

    return (
        branch(cat.nft_items, "address", "nft_items")
        .unionByName(branch(cat.nft_collections, "address", "nft_collections"))
        .unionByName(branch(cat.jetton_masters, "address", "jetton_masters"))
    )


def address_book(cat: Catalog) -> DataFrame:
    """address → (code_hash, get-methods, shortest domain) — crud.go:228-346.

    Shortest-domain rule: DISTINCT ON (nft_item_owner) ORDER BY
    length(domain), i.e. first_per_group (crud.go:297-300); dns_wallet must
    match the owner for the domain to count.
    """
    states = cat.latest_account_states.select("account", "balance", "code_hash")
    methods = cat.contract_methods
    d = cat.dns_entries.filter(F.col("dns_wallet") == F.col("nft_item_owner"))
    d = d.withColumn("_len", F.length("domain"))
    domains = first_per_group(
        d, ["nft_item_owner"], [("_len", "asc"), ("domain", "asc")]
    ).select(F.col("nft_item_owner").alias("account"), F.col("domain"))

    return (
        states.join(methods, "code_hash", "left")
        .join(domains, "account", "left")
        .select("account", "balance", "code_hash", "methods", "domain")
    )
