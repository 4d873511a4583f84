"""Get-method execution harness over the TVM engine.

Mirrors what the reference's executor does around the real C++ TVM
(ton-index-worker/tondb-scanner/src/execute-smc.cpp — build the initial
stack ``[args..., method_id]``, c4 := account data, c7 :=
SmartContractInfo, run, read the result stack), expressed over
:mod:`ton_indexer_spark.tvm.engine`.

Method ids follow the published convention: for a get-method name,
``(crc16_xmodem(name) & 0xffff) | 0x10000``.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

from ton_indexer_spark.functions.boc import (
    Builder,
    Cell,
    Slice,
    parse_boc,
)
from ton_indexer_spark.tvm.engine import (
    NAN,
    VM,
    VmError,
    VmTuple,
    clone_slice,
    slice_as_cell,
)

# ------------------------------------------------------------- method ids


def crc16_xmodem(data: bytes) -> int:
    """CRC-16/XMODEM (poly 0x1021, init 0) — the TVM method-id hash."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


def method_id(name: str) -> int:
    return (crc16_xmodem(name.encode()) & 0xFFFF) | 0x10000


# --------------------------------------------------------------- c7 setup


def smart_contract_info(
    *,
    my_address: str | None = None,
    balance: int = 1_000_000_000,
    unixtime: int = 1_700_000_000,
    block_lt: int = 0,
    trans_lt: int = 0,
    rand_seed: int = 0,
    config_root: Cell | None = None,
    my_code: Cell | None = None,
) -> VmTuple:
    """c7 := [SmartContractInfo] — the whitepaper's 10-component tuple
    (A.11.4) plus the post-2023 TVM extensions (docs.ton.org TVM
    upgrade list): [10] MYCODE, [11] incoming-value, [12] storage fees,
    [13] prev-blocks info, [14] unpacked config, [15] due payment —
    real mainnet contracts (globals-style jetton wallets) read MYCODE
    from c7 instead of re-parsing their own state."""
    addr_cell = Builder().store_address(my_address).end_cell()
    info = VmTuple([
        0x076EF1EA,                      # magic
        0,                               # actions
        0,                               # msgs_sent
        unixtime,                        # NOW
        block_lt,                        # BLOCKLT
        trans_lt,                        # LTIME
        rand_seed,                       # RANDSEED
        VmTuple([balance, None]),        # BALANCE [grams, extra]
        Slice(addr_cell),                # MYADDR
        config_root,                     # CONFIGROOT
        my_code,                         # MYCODE
        VmTuple([0, None]),              # INCOMINGVALUE
        0,                               # STORAGEFEES
        VmTuple(),                       # PREVBLOCKSINFO
        None,                            # UNPACKEDCONFIG
        0,                               # DUEPAYMENT
    ])
    return VmTuple([info])


# ------------------------------------------------------------ result shape


@dataclass
class GetMethodResult:
    exit_code: int
    stack: list            # raw VM values (int / Cell / Slice / ...)
    gas_used: int

    @property
    def success(self) -> bool:
        return self.exit_code in (0, 1)


def run_get_method(
    code: Cell | bytes | str,
    data: Cell | bytes | str | None,
    method: str | int,
    args: list | None = None,
    *,
    my_address: str | None = None,
    balance: int = 1_000_000_000,
    unixtime: int = 1_700_000_000,
    config_root: Cell | None = None,
    gas_limit: int = 1_000_000,
) -> GetMethodResult:
    """Execute a contract get-method against its code + data cells."""
    if not isinstance(code, Cell):
        code = parse_boc(code)
    if data is not None and not isinstance(data, Cell):
        data = parse_boc(data)
    mid = method if isinstance(method, int) else method_id(method)
    stack = list(args or []) + [mid]
    vm = VM(
        code,
        stack,
        c4=data,
        c7=smart_contract_info(
            my_address=my_address, balance=balance, unixtime=unixtime,
            config_root=config_root, my_code=code),
        gas_limit=gas_limit,
    )
    exit_code = vm.run()
    return GetMethodResult(exit_code=exit_code, stack=vm.stack,
                           gas_used=vm.gas_used)


# ----------------------------------------------- stack value conversions


def stack_address(v) -> str | None:
    """A stack slice holding a MsgAddress → "wc:HEX" | None."""
    if v is None:
        return None
    if not isinstance(v, Slice):
        raise VmError(7, f"expected address slice, got {type(v)}")
    return clone_slice(v).load_address()


def stack_cell(v) -> Cell | None:
    if v is None:
        return None
    if isinstance(v, Cell):
        return v
    if isinstance(v, Slice):
        return slice_as_cell(v)
    raise VmError(7, f"expected cell, got {type(v)}")


def stack_int(v) -> int | None:
    if v is None or v is NAN:
        return None
    if not isinstance(v, int):
        raise VmError(7, f"expected int, got {type(v)}")
    return v


def to_v2_stack(values: list) -> list:
    """VM values → the ton-http-api v2 wire stack shape
    ``[[type, value], ...]`` the reference's proxy decodes
    (ton-index-go/index/proxy.go:319-350)."""
    from ton_indexer_spark.functions.boc import serialize_boc

    out = []
    for v in values:
        if v is None:
            out.append(["null", None])
        elif v is NAN:
            out.append(["num", "NaN"])
        elif isinstance(v, bool):
            out.append(["num", hex(int(v))])
        elif isinstance(v, int):
            out.append(["num", hex(v)])
        elif isinstance(v, Cell):
            out.append(
                ["cell", base64.b64encode(serialize_boc(v)).decode()])
        elif isinstance(v, Slice):
            out.append(
                ["slice",
                 base64.b64encode(serialize_boc(slice_as_cell(v))).decode()])
        elif isinstance(v, VmTuple):
            out.append(["tuple", to_v2_stack(list(v))])
        else:
            out.append(["unknown", repr(v)])
    return out
