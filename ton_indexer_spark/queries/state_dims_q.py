"""Dimension-bootstrap driver gates over REAL state-data BOCs (S7/F2/C6).

The reference bootstraps its listing/collection dimensions by
TVM-executing get-methods against every matching account state
(tondb-scanner smc-interfaces/NftSale.cpp get_sale_data /
get_auction_data_v4, Tokens.cpp:497-527 get_collection_data,
Telemint.cpp:129-133 royalty_params).  The engine derives the same rows
with data-cell decoders inside Arrow-batched ``mapInPandas``
(sources/tx_ingest.py) — these gates run that path over genuine encoded
BOCs (round-tripped through the real cell codec, including a corrupt
cell that must surface decode_error instead of failing the batch) with
literal VALUES oracles."""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.queries import register

# uppercase hex: the cell codec's load_address renders addresses upper
_MP = "0:" + "A1" * 32
_NFT = "0:" + "B2" * 32
_OWN = "0:" + "C3" * 32
_FEE = "0:" + "D4" * 32
_ROY = "0:" + "E5" * 32
_BIDDER = "0:" + "F6" * 32

# the published getgems code hashes (SALE_VERSION_MAPPING, boc.py)
_SALE_V3_HASH = "MgUN+sRPZIZrzIbyzZ4TBf6dyts5WcACI3z7CQLUQyM="
_SALE_V1_HASH = "2pufziLofEllctIDZSWVebzO+RpyA1fMvowFLvyb4I8="
_AUC_V3R3_HASH = "u29ireD+stefqzuK6/CTCvmFU99gCTsgJ/Covxab/Ow="


def _sale_states(spark: SparkSession) -> DataFrame:
    from ton_indexer_spark.functions.boc import encode_nft_sale_data

    ok = encode_nft_sale_data(
        is_complete=False, created_at=1_700_000_100,
        marketplace_address=_MP, nft_address=_NFT, nft_owner_address=_OWN,
        full_price=5_000_000_000, marketplace_fee_address=_FEE,
        marketplace_fee=250_000_000, royalty_address=_ROY,
        royalty_amount=100_000_000,
    )
    done = encode_nft_sale_data(
        is_complete=True, created_at=1_700_000_200,
        marketplace_address=_MP, nft_address=_NFT, nft_owner_address=None,
        full_price=7_000_000_000, marketplace_fee_address=_FEE,
        marketplace_fee=350_000_000, royalty_address=_ROY,
        royalty_amount=140_000_000,
    )
    bad = base64.b64encode(b"\x00\x01notaboc").decode()
    return spark.createDataFrame(
        [("0:SALE1", ok, _SALE_V3_HASH),
         ("0:SALE2", done, _SALE_V3_HASH),
         ("0:SALE3", bad, _SALE_V3_HASH)],
        "address string, data_boc string, code_hash string",
    )


_SALE_ORACLE = f"""
SELECT * FROM (VALUES
  ('0:SALE1', FALSE, CAST(1700000100 AS BIGINT), '{_MP}', '{_NFT}',
   '{_OWN}', CAST(5000000000 AS BIGINT), '{_FEE}',
   CAST(250000000 AS BIGINT), '{_ROY}', CAST(100000000 AS BIGINT), FALSE),
  ('0:SALE2', TRUE, CAST(1700000200 AS BIGINT), '{_MP}', '{_NFT}',
   CAST(NULL AS VARCHAR), CAST(7000000000 AS BIGINT), '{_FEE}',
   CAST(350000000 AS BIGINT), '{_ROY}', CAST(140000000 AS BIGINT), FALSE),
  ('0:SALE3', CAST(NULL AS BOOLEAN), CAST(NULL AS BIGINT),
   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
   CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
   CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), TRUE)
) AS t(address, is_complete, created_at, marketplace_address, nft_address,
       nft_owner_address, full_price, marketplace_fee_address,
       marketplace_fee, royalty_address, royalty_amount, has_error)
ORDER BY address
"""


@register(
    "nft_sale_state_dims",
    oracle=_SALE_ORACLE,
    survey_ops=("S7", "F2", "C6"),
    description="getgems fix-price sale dimension rows derived from real "
    "state-data BOCs through the cell codec (the reference TVM-executes "
    "get_sale_data per account, NftSale.cpp:22-95); a corrupt cell "
    "surfaces decode_error instead of failing the batch",
)
def nft_sale_state_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.sources.tx_ingest import nft_sales_from_states

    out = nft_sales_from_states(_sale_states(spark))
    return out.select(
        "address", "is_complete", "created_at", "marketplace_address",
        "nft_address", "nft_owner_address",
        F.col("full_price").cast("long").alias("full_price"),
        "marketplace_fee_address",
        F.col("marketplace_fee").cast("long").alias("marketplace_fee"),
        "royalty_address",
        F.col("royalty_amount").cast("long").alias("royalty_amount"),
        F.col("decode_error").isNotNull().alias("has_error"),
    ).orderBy("address")


def _auction_states(spark: SparkSession) -> DataFrame:
    from ton_indexer_spark.functions.boc import encode_nft_auction_data

    live = encode_nft_auction_data(
        is_end=False, is_canceled=False, last_member=_BIDDER,
        last_bid=2_000_000_000, last_bid_at=1_700_000_300,
        end_time=1_700_086_400, nft_owner_address=_OWN,
        mp_fee_factor=5, mp_fee_base=100,
        royalty_fee_factor=3, royalty_fee_base=100,
        marketplace_fee_address=_FEE, royalty_address=_ROY,
        marketplace_address=_MP, min_bid=1_000_000_000,
        max_bid=10_000_000_000, min_step=100_000_000, step_time=300,
    )
    ended = encode_nft_auction_data(
        is_end=True, is_canceled=True, last_member=None,
        last_bid=0, last_bid_at=0, end_time=1_700_000_400,
        nft_owner_address=_OWN, mp_fee_factor=5, mp_fee_base=100,
        royalty_fee_factor=3, royalty_fee_base=100,
        marketplace_fee_address=_FEE, royalty_address=_ROY,
        marketplace_address=_MP, min_bid=500_000_000, max_bid=0,
        min_step=50_000_000, step_time=600,
    )
    return spark.createDataFrame(
        [("0:AUC1", live, _AUC_V3R3_HASH), ("0:AUC2", ended, _AUC_V3R3_HASH)],
        "address string, data_boc string, code_hash string",
    )


_AUCTION_ORACLE = f"""
SELECT * FROM (VALUES
  ('0:AUC1', FALSE, FALSE, '{_BIDDER}', CAST(2000000000 AS BIGINT),
   CAST(1700000300 AS BIGINT), CAST(1700086400 AS BIGINT), '{_OWN}',
   CAST(5 AS BIGINT), CAST(100 AS BIGINT), CAST(3 AS BIGINT),
   CAST(100 AS BIGINT), '{_FEE}', '{_ROY}', '{_MP}',
   CAST(1000000000 AS BIGINT), CAST(10000000000 AS BIGINT),
   CAST(100000000 AS BIGINT), CAST(300 AS BIGINT)),
  ('0:AUC2', TRUE, TRUE, CAST(NULL AS VARCHAR), CAST(0 AS BIGINT),
   CAST(0 AS BIGINT), CAST(1700000400 AS BIGINT), '{_OWN}',
   CAST(5 AS BIGINT), CAST(100 AS BIGINT), CAST(3 AS BIGINT),
   CAST(100 AS BIGINT), '{_FEE}', '{_ROY}', '{_MP}',
   CAST(500000000 AS BIGINT), CAST(0 AS BIGINT),
   CAST(50000000 AS BIGINT), CAST(600 AS BIGINT))
) AS t(address, is_end, is_canceled, last_member, last_bid, last_bid_at,
       end_time, nft_owner_address, mp_fee_factor, mp_fee_base,
       royalty_fee_factor, royalty_fee_base, marketplace_fee_address,
       royalty_address, marketplace_address, min_bid, max_bid, min_step,
       step_time)
ORDER BY address
"""


@register(
    "nft_auction_state_dims",
    oracle=_AUCTION_ORACLE,
    survey_ops=("S7", "F2", "C6"),
    description="getgems auction dimension rows (v3r3 layout selected by "
    "code hash) derived from real state BOCs — the reference's "
    "get_sale_data/get_auction_data_v4 TVM pass (NftSale.cpp:110-340) "
    "as a data-cell decode in mapInPandas",
)
def nft_auction_state_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.sources.tx_ingest import (
        nft_auctions_from_states,
    )

    out = nft_auctions_from_states(_auction_states(spark))
    return out.select(
        "address", "is_end", "is_canceled", "last_member",
        F.col("last_bid").cast("long").alias("last_bid"),
        "last_bid_at", "end_time", "nft_owner_address",
        "mp_fee_factor", "mp_fee_base", "royalty_fee_factor",
        "royalty_fee_base", "marketplace_fee_address", "royalty_address",
        "marketplace_address",
        F.col("min_bid").cast("long").alias("min_bid"),
        F.col("max_bid").cast("long").alias("max_bid"),
        F.col("min_step").cast("long").alias("min_step"),
        "step_time",
    ).orderBy("address")


def _collection_states(spark: SparkSession) -> DataFrame:
    from ton_indexer_spark.functions.boc import encode_nft_collection_data

    full = encode_nft_collection_data(
        owner=_OWN, next_item_index=42,
        content_uri="https://example.com/col.json",
        royalty=(5, 100, _ROY),
    )
    bare = encode_nft_collection_data(owner=_MP, next_item_index=0)
    return spark.createDataFrame(
        [("0:COL1", full), ("0:COL2", bare)],
        "address string, data_boc string",
    )


_COLLECTION_ORACLE = f"""
SELECT * FROM (VALUES
  ('0:COL1', '{_OWN}', CAST(42 AS BIGINT),
   'https://example.com/col.json', CAST(5 AS BIGINT),
   CAST(100 AS BIGINT), '{_ROY}'),
  ('0:COL2', '{_MP}', CAST(0 AS BIGINT), CAST(NULL AS VARCHAR),
   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR))
) AS t(address, owner_address, next_item_index, content_uri,
       royalty_numerator, royalty_denominator, royalty_destination)
ORDER BY address
"""


@register(
    "nft_collection_state_dims",
    oracle=_COLLECTION_ORACLE,
    survey_ops=("S7", "F2", "C6"),
    description="nft_collections dimension rows with TEP-64 content and "
    "TEP-66 royalty params off real collection state cells — the no-TVM "
    "get_collection_data + royalty_params (Tokens.cpp:497-527, "
    "Telemint.cpp:129-133); a refs-less collection degrades to NULLs",
)
def nft_collection_state_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ton_indexer_spark.sources.tx_ingest import (
        nft_collections_from_states,
    )

    out = nft_collections_from_states(_collection_states(spark))
    return out.select(
        "address", "owner_address",
        F.col("next_item_index").cast("long").alias("next_item_index"),
        F.col("collection_content")["uri"].alias("content_uri"),
        "royalty_numerator", "royalty_denominator", "royalty_destination",
    ).orderBy("address")
