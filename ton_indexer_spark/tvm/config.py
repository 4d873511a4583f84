"""A minimal synthesized chain-config for TVM runs (CONFIGROOT, c7[9]).

Contracts read chain parameters through CONFIGPARAM/CONFIGDICT (fee
math, forward-price checks).  A real node supplies the masterchain
config dictionary; get-method and replay runs here synthesize the
subset real token/DeFi contracts actually read — storage (18), gas
(20/21) and message-forward (24/25) prices — encoded per the published
block.tlb schemas with the published mainnet values (the same constants
the engine's fee words use, engine._FEE_CFG).

Honesty note: these are the CURRENT published values; a transaction
captured when prices differed can legitimately diverge when its logic
branches on them — replay comparisons surface that visibly (PERF.md
documents the residual class).  Keys are int32 param indices in a
32-bit HashmapE; each value is stored as the param cell in a ref,
matching ConfigParams {config:^(Hashmap 32 ^Cell)}.
"""

from __future__ import annotations

from ton_indexer_spark.functions.boc import Builder, Cell
from ton_indexer_spark.tvm.hashmap import dict_set, int_key_bits


def _storage_prices() -> Cell:
    # _#cc utime_since:uint32 bit_price_ps:uint64 cell_price_ps:uint64
    #      mc_bit_price_ps:uint64 mc_cell_price_ps:uint64
    inner = (Builder().store_uint(0xCC, 8).store_uint(0, 32)
             .store_uint(1, 64).store_uint(500, 64)
             .store_uint(1000, 64).store_uint(500_000, 64).end_cell())
    # p18 is a Hashmap 32 of price epochs; one epoch at utime 0, the
    # epoch record in the value's ref (vector-of-cells layout)
    return dict_set(None, int_key_bits(0, 32, signed=False),
                    Builder().store_ref(inner).end_cell().begin_parse())


def _gas_prices(mc: bool) -> Cell:
    # gas_flat_pfx#d1 flat_gas_limit:uint64 flat_gas_price:uint64 then
    # gas_prices_ext#de gas_price:uint64 gas_limit:uint64
    #   special_gas_limit:uint64 gas_credit:uint64 block_gas_limit:uint64
    #   freeze_due_limit:uint64 delete_due_limit:uint64
    flat_limit, flat_price, price = (
        (100, 1_000_000, 655_360_000) if mc else
        (100, 40_000, 26_214_400))
    b = Builder().store_uint(0xD1, 8)
    b.store_uint(flat_limit, 64).store_uint(flat_price, 64)
    b.store_uint(0xDE, 8)
    b.store_uint(price, 64)
    b.store_uint(1_000_000, 64)          # gas_limit
    b.store_uint(35_000_000, 64)         # special_gas_limit
    b.store_uint(10_000, 64)             # gas_credit
    b.store_uint(11_000_000, 64)         # block_gas_limit
    b.store_uint(100_000_000, 64)        # freeze_due_limit
    b.store_uint(1_000_000_000, 64)      # delete_due_limit
    return b.end_cell()


def _fwd_prices(mc: bool) -> Cell:
    # msg_forward_prices#ea lump_price:uint64 bit_price:uint64
    #   cell_price:uint64 ihr_price_factor:uint32 first_frac:uint16
    #   next_frac:uint16
    lump, bit, cell = ((10_000_000, 655_360_000, 65_536_000_000) if mc
                       else (400_000, 26_214_400, 2_621_440_000))
    b = Builder().store_uint(0xEA, 8)
    b.store_uint(lump, 64).store_uint(bit, 64).store_uint(cell, 64)
    b.store_uint(98_304, 32)             # ihr_price_factor (3/2 << 16)
    b.store_uint(21_845, 16)             # first_frac (1/3)
    b.store_uint(21_845, 16)             # next_frac
    return b.end_cell()


def default_config_root() -> Cell:
    """HashmapE 32 ^Cell with params 18, 20, 21, 24, 25."""
    params = {
        18: _storage_prices(),
        20: _gas_prices(mc=True),
        21: _gas_prices(mc=False),
        24: _fwd_prices(mc=True),
        25: _fwd_prices(mc=False),
    }
    root: Cell | None = None
    for idx, cell in params.items():
        val = Builder().store_ref(cell).end_cell().begin_parse()
        root = dict_set(root, int_key_bits(idx, 32, signed=True), val)
    return root
