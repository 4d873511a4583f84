"""Address-book / address-info end-to-end driver gate (SURVEY §2 J4+A3+U1).

The reference's /api/v3/addressBook (ton-index-go/index/crud.go:228-346)
joins latest account states to contract get-methods by code hash, picks
each owner's SHORTEST verified domain (DISTINCT ON ... ORDER BY
length(domain)), and the metadata sidecar unions NFT/collection/jetton
entity flags on top (crud.go:101-110).  The engine's composed plan
(plans/dimensions.py::address_book + metadata_union, api.py address_info)
had every piece individually green but no end-to-end oracle until this
gate: the DuckDB side RECOMPUTES the same joins, window and union from
the same fixture rows."""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.queries import register

_A1, _A2, _A3, _A4 = "0:A1", "0:A2", "0:A3", "0:A4"
_C1, _OTHER = "0:C1", "0:OTHER"

# latest_account_states(account, balance, code_hash)
_STATES = [
    (_A1, 1_000, "W"),
    (_A2, 2_000, "N"),
    (_A3, 3_000, "J"),
    (_A4, 4_000, "X"),   # code hash with no known get-methods
]
# contract_methods(code_hash, methods array<int>)
_METHODS = [
    ("W", [85143, 78748]),   # seqno, get_public_key
    ("N", [102351]),         # get_nft_data
    ("J", [106029]),         # get_jetton_data
]
# dns_entries(domain, dns_wallet, nft_item_owner) — A1 owns two verified
# domains (shortest wins); A2's row is unverified (wallet != owner) and
# must not count (crud.go:297-300)
_DNS = [
    ("alice.ton", _A1, _A1),
    ("a.ton", _A1, _A1),
    ("bob.ton", _OTHER, _A2),
]
# entity tables for the metadata union
_NFT_ITEMS = [(_A2,)]
_NFT_COLLECTIONS = [(_C1,)]
_JETTON_MASTERS = [(_A3,)]
# address_metadata(address, type, name, symbol, valid)
_META = [
    (_A2, "nft_items", "Pixel #1", None, True),
    (_A3, "jetton_masters", "Token", "TKN", True),
    (_C1, "nft_collections", "Pixels", None, None),  # valid -> false
]


def _sql_rows(rows) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return f"'{v}'"
        if isinstance(v, list):
            return "[" + ", ".join(str(x) for x in v) + "]"
        return str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


_ORACLE = f"""
WITH states(account, balance, code_hash) AS (VALUES {_sql_rows(_STATES)}),
methods(code_hash, methods) AS (VALUES {_sql_rows(_METHODS)}),
dns(domain, dns_wallet, nft_item_owner) AS (VALUES {_sql_rows(_DNS)}),
ni(address) AS (VALUES {_sql_rows(_NFT_ITEMS)}),
nc(address) AS (VALUES {_sql_rows(_NFT_COLLECTIONS)}),
jm(address) AS (VALUES {_sql_rows(_JETTON_MASTERS)}),
meta(address, type, name, symbol, valid) AS (VALUES {_sql_rows(_META)}),
domains AS (
    SELECT nft_item_owner AS account, domain
    FROM (
        SELECT nft_item_owner, domain,
               ROW_NUMBER() OVER (
                   PARTITION BY nft_item_owner
                   ORDER BY LENGTH(domain) ASC, domain ASC) AS rn
        FROM dns WHERE dns_wallet = nft_item_owner
    ) WHERE rn = 1
),
entities AS (
    SELECT address, 'nft_items' AS entity_type FROM ni
    UNION ALL SELECT address, 'nft_collections' FROM nc
    UNION ALL SELECT address, 'jetton_masters' FROM jm
),
metadata AS (
    SELECT e.address, e.entity_type, m.name, m.symbol,
           COALESCE(m.valid, FALSE) AS valid
    FROM entities e
    LEFT JOIN meta m ON m.address = e.address AND m.type = e.entity_type
)
SELECT s.account, CAST(s.balance AS BIGINT) AS balance, s.code_hash,
       array_to_string(mt.methods, ',') AS methods,
       d.domain,
       md.entity_type, md.name, md.symbol,
       COALESCE(md.valid, FALSE) AS valid
FROM states s
LEFT JOIN methods mt ON mt.code_hash = s.code_hash
LEFT JOIN domains d ON d.account = s.account
LEFT JOIN metadata md ON md.address = s.account
ORDER BY s.account
"""


@register(
    "address_book",
    oracle=_ORACLE,
    survey_ops=("J4", "A3", "U1", "J5"),
    description="composed /addressBook + metadata flags: states ⋈ "
    "get-methods by code hash, shortest VERIFIED domain per owner "
    "(DISTINCT ON), 3-way entity union with metadata left-joins — the "
    "oracle recomputes every join/window/union (crud.go:228-346,101-110)",
)
def address_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.plans.dimensions import (
        address_book as book_plan,
        metadata_union,
    )

    cat = SimpleNamespace(
        latest_account_states=spark.createDataFrame(
            _STATES, "account string, balance long, code_hash string"
        ),
        contract_methods=spark.createDataFrame(
            _METHODS, "code_hash string, methods array<int>"
        ),
        dns_entries=spark.createDataFrame(
            _DNS, "domain string, dns_wallet string, nft_item_owner string"
        ),
        nft_items=spark.createDataFrame(_NFT_ITEMS, "address string"),
        nft_collections=spark.createDataFrame(
            _NFT_COLLECTIONS, "address string"
        ),
        jetton_masters=spark.createDataFrame(
            _JETTON_MASTERS, "address string"
        ),
        address_metadata=spark.createDataFrame(
            _META,
            "address string, type string, name string, symbol string, "
            "valid boolean",
        ),
    )
    book = book_plan(cat)
    md = metadata_union(cat).select(
        F.col("address").alias("account"), "entity_type",
        "name", "symbol", F.col("valid").alias("_valid"),
    )
    return (
        book.join(md, "account", "left")
        .select(
            "account", F.col("balance").cast("long").alias("balance"),
            "code_hash",
            F.array_join(F.transform("methods",
                                     lambda x: x.cast("string")), ",")
            .alias("methods"),
            "domain", "entity_type", "name", "symbol",
            F.coalesce(F.col("_valid"), F.lit(False)).alias("valid"),
        )
        .orderBy("account")
    )
