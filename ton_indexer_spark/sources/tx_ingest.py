"""Raw-BOC transaction ingest projection (S2 — the ingest-side flatten).

The reference's worker parses every transaction cell of a block into the
flat transactions row + its (tx, message, direction) rows before insert
(`tondb-scanner/src/DataParser.cpp:29-82,429-516`).  This stage is the
Spark analog: a DataFrame of raw BOC-encoded transaction cells →

    parse_raw_transactions(df)         → the flat ~70-col tx DataFrame
    messages_from_parsed(df)           → MESSAGES-shaped rows (in + out,
                                          an internal message will appear
                                          once per side, like the
                                          reference's double-entry)
    message_contents_from_parsed(df)   → content-addressed body store

Execution shape: the TL-B decode is pure Python (functions/tx_parse.py)
and runs ONLY inside Arrow-batched ``mapInPandas`` — constant memory per
batch, no driver loop, parallel across partitions; downstream everything
is relational.  Partition count carries over from the source scan, so a
100 TB backfill parallelizes by input file exactly like any parquet read.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ton_indexer_spark.functions.tx_parse import (
    FLAT_COLUMNS,
    flatten_transaction,
    parse_transaction_boc,
)

_LONG_COLS = {
    "lt", "prev_trans_lt", "now", "total_fees",
    "storage_fees_collected", "storage_fees_due",
    "credit_due_fees_collected", "credit",
    "compute_gas_fees", "compute_gas_used", "compute_gas_limit",
    "compute_gas_credit", "compute_vm_steps",
    "action_total_fwd_fees", "action_total_action_fees",
    "bounce_msg_size_cells", "bounce_msg_size_bits",
    "bounce_msg_fees", "bounce_req_fwd_fees", "bounce_fwd_fees",
    "action_tot_msg_size_cells", "action_tot_msg_size_bits",
}
_INT_COLS = {
    "compute_mode", "compute_exit_code", "compute_exit_arg",
    "action_result_code", "action_result_arg", "action_tot_actions",
    "action_spec_actions", "action_skipped_actions", "action_msgs_created",
}
_BOOL_COLS = {
    "aborted", "destroyed", "credit_first", "is_tock", "compute_skipped",
    "compute_success", "compute_msg_state_used",
    "compute_account_activated", "action_success", "action_valid",
    "action_no_funds",
}

TRANSACTIONS_FLAT = T.StructType(
    [
        T.StructField(
            c,
            T.LongType() if c in _LONG_COLS
            else T.IntegerType() if c in _INT_COLS
            else T.BooleanType() if c in _BOOL_COLS
            else T.StringType(),
        )
        for c in FLAT_COLUMNS
    ]
)

_MSG_FIELDS = [
    ("hash", T.StringType()),
    ("source", T.StringType()),
    ("destination", T.StringType()),
    ("value", T.LongType()),
    ("ihr_disabled", T.BooleanType()),
    ("bounce", T.BooleanType()),
    ("bounced", T.BooleanType()),
    ("ihr_fee", T.LongType()),
    ("fwd_fee", T.LongType()),
    ("import_fee", T.LongType()),
    ("created_lt", T.LongType()),
    ("created_at", T.LongType()),
    ("opcode", T.LongType()),
    ("body_boc", T.StringType()),
    ("body_hash", T.StringType()),
    ("init_state_boc", T.StringType()),
]
_MSG_STRUCT = T.StructType([T.StructField(n, t) for n, t in _MSG_FIELDS])

PARSED_SCHEMA = T.StructType(
    [
        *TRANSACTIONS_FLAT.fields,
        T.StructField("in_msg", _MSG_STRUCT),
        T.StructField("out_msgs", T.ArrayType(_MSG_STRUCT)),
        T.StructField("parse_error", T.StringType()),
    ]
)


def _msg_tuple(m: dict | None) -> dict | None:
    if m is None:
        return None
    return {n: m.get(n) for n, _ in _MSG_FIELDS}


# block-envelope columns carried from the raw drop through the parse stage
# (the reference gets them from the enclosing block record,
# DataParser.cpp:29-82 — per-row here so one drop can span blocks)
_ENVELOPE_COLS = (
    "block_workchain", "block_shard", "block_seqno", "mc_block_seqno",
)


def parse_raw_transactions(
    df: DataFrame, boc_col: str = "boc", workchain_col: str | None = "workchain"
) -> DataFrame:
    """(base64-BOC, workchain?, block envelope?) rows → flat tx rows +
    nested msg structs.  Block-envelope columns present on the input
    (``block_workchain/block_shard/block_seqno/mc_block_seqno``) pass
    through untouched so downstream projections keep per-row block
    coordinates.

    Undecodable rows surface in ``parse_error`` instead of failing the
    batch (the reference logs-and-skips, IndexScheduler discipline).
    """
    cols = df.columns
    envelope = [c for c in _ENVELOPE_COLS if c in cols]
    out_schema = T.StructType(
        list(PARSED_SCHEMA.fields)
        + [df.schema[c] for c in envelope]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                wc = int(rec[workchain_col]) if (
                    workchain_col and workchain_col in cols
                    and rec.get(workchain_col) is not None
                ) else 0
                try:
                    tx = parse_transaction_boc(rec[boc_col], workchain=wc)
                    row = flatten_transaction(tx)
                    row["in_msg"] = _msg_tuple(tx.get("in_msg"))
                    row["out_msgs"] = [
                        _msg_tuple(m) for m in tx.get("out_msgs", [])
                    ]
                    row["parse_error"] = None
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row = dict.fromkeys(FLAT_COLUMNS)
                    row["in_msg"] = None
                    row["out_msgs"] = None
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                for c in envelope:
                    row[c] = rec.get(c)
                rows.append(row)
            out = pd.DataFrame(rows, columns=[f.name for f in out_schema])
            # int64 columns must stay exact python ints: with any None in
            # the batch (a parse_error row, a Maybe-absent phase field)
            # pd.DataFrame coerces the column to float64, which silently
            # loses precision past 2^53 — real-chain lt already exceeds
            # that, corrupting join keys batch-wide.  Same discipline as
            # the decimal rebuilds in the *_from_states stages.
            for c in _LONG_COLS | _INT_COLS:
                out[c] = pd.Series([r.get(c) for r in rows], dtype=object)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def messages_from_parsed(parsed: DataFrame) -> DataFrame:
    """Flat parsed txs → per-(tx, message, direction) rows, the
    double-entry discipline of the reference's messages table
    (migrate.cpp:235-262): one ``in`` row for the consumed message, one
    ``out`` row per emitted message."""
    base = parsed.filter(F.col("parse_error").isNull()).select(
        F.col("hash").alias("tx_hash"),
        F.col("lt").alias("tx_lt"),
        F.col("now").alias("tx_now"),
        "in_msg", "out_msgs",
    )
    in_rows = base.filter(F.col("in_msg").isNotNull()).select(
        "tx_hash", "tx_lt", "tx_now",
        F.lit("in").alias("direction"),
        F.col("in_msg").alias("m"),
    )
    out_rows = base.select(
        "tx_hash", "tx_lt", "tx_now",
        F.lit("out").alias("direction"),
        F.explode("out_msgs").alias("m"),
    )
    return in_rows.unionByName(out_rows).select(
        "tx_hash", "tx_lt", "tx_now", "direction",
        F.col("m.hash").alias("msg_hash"),
        F.col("m.source").alias("source"),
        F.col("m.destination").alias("destination"),
        F.col("m.value").alias("value"),
        F.col("m.fwd_fee").alias("fwd_fee"),
        F.col("m.ihr_fee").alias("ihr_fee"),
        F.col("m.created_lt").alias("created_lt"),
        F.col("m.created_at").alias("created_at"),
        F.col("m.opcode").alias("opcode"),
        F.col("m.bounce").alias("bounce"),
        F.col("m.bounced").alias("bounced"),
        F.col("m.body_hash").alias("body_hash"),
    )


def core_transactions_from_parsed(
    parsed: DataFrame,
    block_workchain: int | None = None,
    block_shard: int | None = None,
    block_seqno: int | None = None,
    mc_block_seqno: int | None = None,
) -> DataFrame:
    """Flat parsed txs → the engine's core TRANSACTIONS schema
    (schemas.py), ready for the existing assembler/classifier pipeline.
    Block coordinates come from the enclosing block record (pass them per
    ingest bundle); trace_id is assigned later by trace assembly."""
    from ton_indexer_spark.schemas import TRANSACTIONS

    good = parsed.filter(F.col("parse_error").isNull())
    blk = {
        "block_workchain": block_workchain,
        "block_shard": block_shard,
        "block_seqno": block_seqno,
        "mc_block_seqno": mc_block_seqno,
    }
    cols = []
    for f in TRANSACTIONS.fields:
        if f.name in blk:
            if blk[f.name] is None and f.name in good.columns:
                # per-row envelope carried through parse_raw_transactions
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(
                    F.lit(blk[f.name]).cast(f.dataType).alias(f.name))
        elif f.name == "trace_id":
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif f.name in good.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return good.select(*cols)


NFT_SALE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("is_complete", T.BooleanType()),
        T.StructField("created_at", T.LongType()),
        T.StructField("marketplace_address", T.StringType()),
        T.StructField("nft_address", T.StringType()),
        T.StructField("nft_owner_address", T.StringType()),
        T.StructField("full_price", T.DecimalType(38, 0)),
        T.StructField("marketplace_fee_address", T.StringType()),
        T.StructField("marketplace_fee", T.DecimalType(38, 0)),
        T.StructField("royalty_address", T.StringType()),
        T.StructField("royalty_amount", T.DecimalType(38, 0)),
        T.StructField("decode_error", T.StringType()),
    ]
)


def nft_sales_from_states(
    df: DataFrame,
    boc_col: str = "data_boc",
    address_col: str = "address",
    code_hash_col: str | None = "code_hash",
) -> DataFrame:
    """Sale-contract state-data BOCs → getgems_nft_sales dimension rows
    (the reference decodes sale data off account states to maintain the
    listings dimension — messages/getgems.py:64-113 via the smc scanner).
    The layout version is selected from the account's code hash exactly
    like the reference's SALE_VERSION_MAPPING, defaulting to the latest
    (v4r1) for unknown hashes — so a mismatched layout errors instead of
    silently mis-decoding.  Decode failures surface in ``decode_error``
    rather than failing the batch."""
    from ton_indexer_spark.functions.boc import (
        SALE_LATEST,
        SALE_VERSION_MAPPING,
        decode_nft_sale_data,
    )

    has_hash = code_hash_col is not None and code_hash_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in NFT_SALE_STATE_SCHEMA}
                row["address"] = rec.get(address_col)
                version = (
                    SALE_VERSION_MAPPING.get(rec.get(code_hash_col), SALE_LATEST)
                    if has_hash
                    else "v3"
                )
                try:
                    row.update(decode_nft_sale_data(rec[boc_col], version))
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in NFT_SALE_STATE_SCHEMA]
            )
            for c in ("full_price", "marketplace_fee", "royalty_amount"):
                out[c] = pd.Series(
                    [r.get(c) for r in rows], dtype=object
                )
            yield out

    return df.mapInPandas(run, schema=NFT_SALE_STATE_SCHEMA)


def message_contents_from_parsed(parsed: DataFrame) -> DataFrame:
    """Content-addressed body store (hash → base64 BOC), deduplicated —
    migrate.cpp:264-268."""
    base = parsed.filter(F.col("parse_error").isNull())
    bodies = base.select(
        F.col("in_msg.body_hash").alias("hash"),
        F.col("in_msg.body_boc").alias("body"),
    ).unionByName(
        base.select(F.explode("out_msgs").alias("m")).select(
            F.col("m.body_hash").alias("hash"),
            F.col("m.body_boc").alias("body"),
        )
    )
    return bodies.filter(F.col("hash").isNotNull()).dropDuplicates(["hash"])


JETTON_WALLET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("balance", T.DecimalType(38, 0)),
        T.StructField("owner", T.StringType()),
        T.StructField("jetton", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def jetton_wallets_from_states(
    df: DataFrame, boc_col: str = "data_boc", address_col: str = "address"
) -> DataFrame:
    """Jetton-wallet state-data BOCs → jetton_wallets dimension rows.

    The reference executes ``get_wallet_data`` in a TVM per account
    (tondb-scanner smc-interfaces/Tokens.cpp:43-57); this decodes the
    canonical TEP-74 data layout directly — same log-and-skip discipline
    as nft_sales_from_states, and callers should pre-filter by the
    canonical wallet code_hash (functions/interfaces.py) so non-standard
    wallets land in ``decode_error`` rather than misdecoding.
    """
    from ton_indexer_spark.functions.boc import decode_jetton_wallet_data

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in JETTON_WALLET_STATE_SCHEMA}
                row["address"] = rec.get(address_col)
                try:
                    row.update(decode_jetton_wallet_data(rec[boc_col]))
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in JETTON_WALLET_STATE_SCHEMA]
            )
            # exact python ints for the decimal column (Arrow decimal128)
            out["balance"] = pd.Series(
                [r.get("balance") for r in rows], dtype=object
            )
            yield out

    return df.mapInPandas(run, schema=JETTON_WALLET_STATE_SCHEMA)


NFT_ITEM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("init", T.BooleanType()),
        T.StructField("index", T.DecimalType(38, 0)),
        T.StructField("collection_address", T.StringType()),
        T.StructField("owner_address", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def nft_items_from_states(
    df: DataFrame, boc_col: str = "data_boc", address_col: str = "address"
) -> DataFrame:
    """Canonical TEP-62 item state cells → nft_items dimension rows
    (same discipline as jetton_wallets_from_states)."""
    from ton_indexer_spark.functions.boc import decode_nft_item_data

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in NFT_ITEM_STATE_SCHEMA}
                row["address"] = rec.get(address_col)
                try:
                    row.update(decode_nft_item_data(rec[boc_col]))
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in NFT_ITEM_STATE_SCHEMA]
            )
            out["index"] = pd.Series(
                [r.get("index") for r in rows], dtype=object
            )
            yield out

    return df.mapInPandas(run, schema=NFT_ITEM_STATE_SCHEMA)


NFT_COLLECTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("owner_address", T.StringType()),
        T.StructField("next_item_index", T.DecimalType(38, 0)),
        T.StructField(
            "collection_content", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField("royalty_numerator", T.LongType()),
        T.StructField("royalty_denominator", T.LongType()),
        T.StructField("royalty_destination", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def nft_collections_from_states(
    df: DataFrame, boc_col: str = "data_boc", address_col: str = "address"
) -> DataFrame:
    """Canonical TEP-62 collection state cells → nft_collections dimension
    rows with TEP-64 content AND TEP-66 royalty params — the no-TVM
    equivalent of the reference executing ``get_collection_data`` +
    ``royalty_params`` per collection account (Tokens.cpp:497-527,
    Telemint.cpp:129-133) to bootstrap the dimension."""
    from ton_indexer_spark.functions.boc import decode_nft_collection_data

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in NFT_COLLECTION_STATE_SCHEMA}
                row["address"] = rec.get(address_col)
                try:
                    row.update(decode_nft_collection_data(rec[boc_col]))
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in NFT_COLLECTION_STATE_SCHEMA]
            )
            out["next_item_index"] = pd.Series(
                [r.get("next_item_index") for r in rows], dtype=object
            )
            yield out

    return df.mapInPandas(run, schema=NFT_COLLECTION_STATE_SCHEMA)


BLOCK_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("workchain", T.IntegerType()),
        T.StructField("shard", T.LongType()),
        T.StructField("seqno", T.IntegerType()),
        T.StructField("mc_block_seqno", T.IntegerType()),
        T.StructField("gen_utime", T.LongType()),
        T.StructField("start_lt", T.LongType()),
        T.StructField("end_lt", T.LongType()),
        T.StructField("key_block", T.BooleanType()),
        T.StructField("global_id", T.IntegerType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("root_hash", T.StringType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


def parse_raw_blocks(df: DataFrame, boc_col: str = "boc") -> DataFrame:
    """Raw BOC-encoded block cells → blocks-table header rows
    (DataParser.cpp:429-516 block arm; masterchain blocks self-reference
    mc_block_seqno, shard blocks carry it via master_ref)."""
    from ton_indexer_spark.functions.tx_parse import parse_block_header

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in BLOCK_HEADER_SCHEMA}
                try:
                    row.update({
                        k: v for k, v in
                        parse_block_header(rec[boc_col]).items()
                        if k in row
                    })
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in BLOCK_HEADER_SCHEMA]
            )

    return df.mapInPandas(run, schema=BLOCK_HEADER_SCHEMA)


NFT_AUCTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("is_end", T.BooleanType()),
        T.StructField("is_canceled", T.BooleanType()),
        T.StructField("last_member", T.StringType()),
        T.StructField("last_bid", T.DecimalType(38, 0)),
        T.StructField("last_bid_at", T.LongType()),
        T.StructField("end_time", T.LongType()),
        T.StructField("nft_owner_address", T.StringType()),
        T.StructField("mp_fee_factor", T.LongType()),
        T.StructField("mp_fee_base", T.LongType()),
        T.StructField("royalty_fee_factor", T.LongType()),
        T.StructField("royalty_fee_base", T.LongType()),
        T.StructField("marketplace_fee_address", T.StringType()),
        T.StructField("royalty_address", T.StringType()),
        T.StructField("marketplace_address", T.StringType()),
        T.StructField("min_bid", T.DecimalType(38, 0)),
        T.StructField("max_bid", T.DecimalType(38, 0)),
        T.StructField("min_step", T.DecimalType(38, 0)),
        T.StructField("step_time", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def nft_auctions_from_states(
    df: DataFrame,
    boc_col: str = "data_boc",
    address_col: str = "address",
    code_hash_col: str | None = "code_hash",
) -> DataFrame:
    """Auction-contract state-data BOCs → getgems_nft_auctions dimension
    rows (reference getgems.py:123-247 via the smc scanner).  The layout
    version comes from the account's code hash per the reference's
    AUCTION_VERSION_MAPPING (latest = v3r3 for unknown hashes).  Same
    log-and-skip discipline as ``nft_sales_from_states``."""
    from ton_indexer_spark.functions.boc import (
        AUCTION_LATEST,
        AUCTION_VERSION_MAPPING,
        decode_nft_auction_data,
    )

    has_hash = code_hash_col is not None and code_hash_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in NFT_AUCTION_STATE_SCHEMA}
                row["address"] = rec.get(address_col)
                version = (
                    AUCTION_VERSION_MAPPING.get(
                        rec.get(code_hash_col), AUCTION_LATEST
                    )
                    if has_hash
                    else AUCTION_LATEST
                )
                try:
                    row.update(decode_nft_auction_data(rec[boc_col], version))
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in NFT_AUCTION_STATE_SCHEMA]
            )
            for c in ("last_bid", "min_bid", "max_bid", "min_step"):
                out[c] = pd.Series([r.get(c) for r in rows], dtype=object)
            yield out

    return df.mapInPandas(run, schema=NFT_AUCTION_STATE_SCHEMA)


JETTON_WALLET_TVM_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("exit_code", T.IntegerType()),
        T.StructField("balance", T.DecimalType(38, 0)),
        T.StructField("owner", T.StringType()),
        T.StructField("jetton", T.StringType()),
        T.StructField("exec_error", T.StringType()),
    ]
)


def jetton_wallets_via_tvm(
    df: DataFrame,
    code_col: str = "code_boc",
    data_col: str = "data_boc",
    address_col: str = "address",
) -> DataFrame:
    """Jetton-wallet dimension rows by EXECUTING ``get_wallet_data``.

    Where :func:`jetton_wallets_from_states` assumes the canonical
    TEP-74 data layout, this runs the account's real code cell on the
    in-engine TVM (ton_indexer_spark/tvm) — the same execution the
    reference performs per account through the C++ TVM (tondb-scanner
    smc-interfaces/Tokens.cpp:43-57), so NON-standard wallets (globals-
    style codegen, wrapped layouts) derive correctly too.  Same narrow
    Arrow-batched map + per-row quarantine discipline; a contract-level
    failure surfaces as its TVM exit code, a codec-level failure as
    ``exec_error`` — neither fails the stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ton_indexer_spark.tvm import (
            run_get_method,
            stack_address,
            stack_int,
        )

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in JETTON_WALLET_TVM_SCHEMA}
                row["address"] = rec.get(address_col)
                try:
                    res = run_get_method(
                        rec[code_col], rec.get(data_col),
                        "get_wallet_data",
                        my_address=rec.get(address_col))
                    row["exit_code"] = res.exit_code
                    if res.success and len(res.stack) >= 4:
                        row["balance"] = stack_int(res.stack[-4])
                        row["owner"] = stack_address(res.stack[-3])
                        row["jetton"] = stack_address(res.stack[-2])
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["exec_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in JETTON_WALLET_TVM_SCHEMA])
            out["balance"] = pd.Series(
                [r.get("balance") for r in rows], dtype=object)
            yield out

    return df.mapInPandas(run, schema=JETTON_WALLET_TVM_SCHEMA)


NFT_ITEM_TVM_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("exit_code", T.IntegerType()),
        T.StructField("init", T.BooleanType()),
        T.StructField("index", T.DecimalType(38, 0)),
        T.StructField("collection_address", T.StringType()),
        T.StructField("owner_address", T.StringType()),
        T.StructField("exec_error", T.StringType()),
    ]
)


def nft_items_via_tvm(
    df: DataFrame,
    code_col: str = "code_boc",
    data_col: str = "data_boc",
    address_col: str = "address",
) -> DataFrame:
    """NFT-item dimension rows by executing ``get_nft_data`` on the
    in-engine TVM (reference: Tokens.cpp get_nft_data per account) —
    the TEP-62 counterpart of :func:`jetton_wallets_via_tvm`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ton_indexer_spark.tvm import (
            run_get_method,
            stack_address,
            stack_int,
        )

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                row = {f.name: None for f in NFT_ITEM_TVM_SCHEMA}
                row["address"] = rec.get(address_col)
                try:
                    res = run_get_method(
                        rec[code_col], rec.get(data_col), "get_nft_data",
                        my_address=rec.get(address_col))
                    row["exit_code"] = res.exit_code
                    if res.success and len(res.stack) >= 5:
                        row["init"] = bool(stack_int(res.stack[-5]))
                        row["index"] = stack_int(res.stack[-4])
                        row["collection_address"] = stack_address(
                            res.stack[-3])
                        row["owner_address"] = stack_address(res.stack[-2])
                except Exception as e:  # noqa: BLE001 — log-and-skip seam
                    row["exec_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
            out = pd.DataFrame(
                rows, columns=[f.name for f in NFT_ITEM_TVM_SCHEMA])
            out["index"] = pd.Series(
                [r.get("index") for r in rows], dtype=object)
            yield out

    return df.mapInPandas(run, schema=NFT_ITEM_TVM_SCHEMA)


JETTON_WALLET_DIM_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("balance", T.DecimalType(38, 0)),
        T.StructField("owner", T.StringType()),
        T.StructField("jetton", T.StringType()),
        T.StructField("path", T.StringType()),     # layout | tvm
        T.StructField("error", T.StringType()),
    ]
)


def jetton_wallets_dimension(
    df: DataFrame,
    canonical_hashes: list[str] | None = None,
) -> DataFrame:
    """PRODUCTION jetton-wallet dimension build: route each account by
    code hash — canonical TEP-74 wallets take the layout FAST PATH
    (direct data-cell decode, no execution), everything else takes the
    real-TVM path (``jetton_wallets_via_tvm`` executes
    ``get_wallet_data`` on the account's actual code).  The reference
    TVM-executes every account (tondb-scanner smc-interfaces/
    Tokens.cpp); the split reproduces identical rows at a fraction of
    the cost because the canonical code's data layout is published
    (TEP-74) — correctness of the fast path against execution is
    pinned by the tvm_get_method golden population.

    Both branches are narrow Arrow-batched maps over the same
    partitioning — the filter splits, the union re-interleaves, no
    shuffle is introduced (the union is a plan-level concatenation of
    two column-pruned scans of the same source).

    Columns needed: address, code_hash, data_boc, code_boc.
    Output adds ``path`` = layout|tvm for hit-rate accounting.
    """
    if canonical_hashes is None:
        from ton_indexer_spark.functions.interfaces import (
            CANONICAL_JETTON_WALLET_HASHES,
        )

        canonical_hashes = list(CANONICAL_JETTON_WALLET_HASHES)
    # NULL-safe split: a row with no code_hash must take the TVM path
    # (isin yields NULL for NULL input, which would drop the row from
    # BOTH branches)
    is_fast = F.coalesce(
        F.col("code_hash").isin(canonical_hashes), F.lit(False))
    fast = jetton_wallets_from_states(df.filter(is_fast)).select(
        "address",
        F.col("balance").cast("decimal(38,0)").alias("balance"),
        "owner", "jetton",
        F.lit("layout").alias("path"),
        F.col("decode_error").alias("error"),
    )
    slow = jetton_wallets_via_tvm(df.filter(~is_fast)).select(
        "address",
        F.col("balance").cast("decimal(38,0)").alias("balance"),
        "owner", "jetton",
        F.lit("tvm").alias("path"),
        F.coalesce(
            F.col("exec_error"),
            F.when(~F.col("exit_code").isin(0, 1),  # 0 AND 1 = success
                   F.concat(F.lit("exit:"),
                            F.col("exit_code").cast("string"))),
        ).alias("error"),
    )
    return fast.unionByName(slow)
