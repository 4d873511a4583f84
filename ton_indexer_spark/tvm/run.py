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

# one CRC implementation in the codebase: the interface-detection module
# already ships it (functions/interfaces.py, validated against the
# published registry's method ids)
from ton_indexer_spark.functions.interfaces import (  # noqa: E402
    crc16_xmodem,
    method_name_hash as method_id,
)


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
    msg_value: int = 0,
    storage_fees: int = 0,
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
        VmTuple([msg_value, None]),      # INCOMINGVALUE
        storage_fees,                    # STORAGEFEES
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
    """Execute a contract get-method against its code + data cells.

    ``config_root`` defaults to the synthesized published-params config
    (tvm/config.py), the same default as :func:`run_compute_phase`, so
    CONFIGPARAM-reading get-methods behave consistently across both
    surfaces."""
    if not isinstance(code, Cell):
        code = parse_boc(code)
    if data is not None and not isinstance(data, Cell):
        data = parse_boc(data)
    if config_root is None:
        from ton_indexer_spark.tvm.config import default_config_root

        config_root = default_config_root()
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


# ------------------------------------------------- compute-phase replay


def build_internal_message(
    *,
    src: str | None,
    dest: str | None,
    value: int,
    body: Cell | None = None,
    init: Cell | None = None,
    ihr_disabled: bool = True,
    bounce: bool = True,
    bounced: bool = False,
    ihr_fee: int = 0,
    fwd_fee: int = 0,
    created_lt: int = 0,
    created_at: int = 0,
) -> Cell:
    """Assemble a full inbound internal message cell (block.tlb
    int_msg_info$0 ... + Maybe init + Either body) — what the compute
    phase hands the contract as ``in_msg_full``."""
    b = Builder()
    b.store_uint(0, 1)                      # int_msg_info$0
    b.store_bit(1 if ihr_disabled else 0)
    b.store_bit(1 if bounce else 0)
    b.store_bit(1 if bounced else 0)
    b.store_address(src)
    b.store_address(dest)
    b.store_coins(value)
    b.store_bit(0)                          # no extra currencies
    b.store_coins(ihr_fee)
    b.store_coins(fwd_fee)
    b.store_uint(created_lt, 64)
    b.store_uint(created_at, 32)
    if init is None:
        b.store_bit(0)                      # init: nothing
    else:
        b.store_bit(1).store_bit(1)         # just (right ^StateInit)
        b.store_ref(init)
    if body is None:
        body = Cell()
    b.store_bit(1)                          # body: right ^X (always ref)
    b.store_ref(body)
    return b.end_cell()


def build_external_message(
    *,
    dest: str | None,
    body: Cell | None = None,
    init: Cell | None = None,
    import_fee: int = 0,
) -> Cell:
    """Assemble an inbound EXTERNAL message cell (block.tlb
    ext_in_msg_info$10 src:MsgAddressExt dest:MsgAddressInt
    import_fee:Grams) + Maybe init + Either body — what recv_external
    sees as ``in_msg_full`` when a signed wallet message is replayed."""
    b = Builder()
    b.store_uint(2, 2)                      # ext_in_msg_info$10
    b.store_address(None)                   # src: addr_none
    b.store_address(dest)
    b.store_coins(import_fee)
    if init is None:
        b.store_bit(0)
    else:
        b.store_bit(1).store_bit(1)         # just (right ^StateInit)
        b.store_ref(init)
    if body is None:
        body = Cell()
    b.store_bit(1)                          # body: right ^X
    b.store_ref(body)
    return b.end_cell()


@dataclass
class ComputePhaseResult:
    exit_code: int
    gas_used: int
    stack: list
    c4: Cell | None        # the (possibly updated) persistent data
    c5: Cell | None        # raw action list
    actions: list          # decoded actions (see parse_actions)

    @property
    def success(self) -> bool:
        return self.exit_code in (0, 1)


def parse_actions(c5: Cell | None) -> list[dict]:
    """Decode the c5 out-list: newest action is the OUTERMOST node.
    Returns actions oldest-first.  send_msg actions carry the decoded
    MessageRelaxed header fields for comparison against captured
    transactions."""
    out: list[dict] = []
    node = c5
    while node is not None and (node.bits or node.refs):
        s = node.begin_parse()
        prev = s.load_ref()
        tag = s.load_uint(32)
        if tag == 0x0EC3C86D:  # action_send_msg
            mode = s.load_uint(8)
            msg = s.load_ref()
            out.append({"type": "send_msg", "mode": mode,
                        "message": msg, **_parse_message_relaxed(msg)})
        elif tag == 0x36E6B809:  # action_reserve_currency
            mode = s.load_uint(8)
            amount = s.load_coins()
            out.append({"type": "reserve", "mode": mode,
                        "amount": amount})
        elif tag == 0xAD4DE08E:  # action_set_code
            out.append({"type": "set_code", "code": s.load_ref()})
        else:
            out.append({"type": f"unknown_{tag:08x}"})
        node = prev
    out.reverse()
    return out


def _parse_message_relaxed(msg: Cell) -> dict:
    """dest / value / opcode / body of a MessageRelaxed (send_msg arm).

    value is the cell's literal grams field — the action phase may
    rewrite it for carry modes (+64/+128), so callers comparing against
    captured chain messages should match on dest/opcode/body."""
    s = msg.begin_parse()
    info: dict = {}
    if s.load_bit() == 0:  # int_msg_info$0
        s.load_bit()                       # ihr_disabled
        info["bounce"] = bool(s.load_bit())
        s.load_bit()                       # bounced
        s.load_address()                   # src (often addr_none here)
        info["dest"] = s.load_address()
        info["value"] = s.load_coins()
        if s.load_bit():
            s.load_ref()                   # extra currencies
        s.load_coins()                     # ihr_fee
        s.load_coins()                     # fwd_fee
        s.load_uint(64)
        s.load_uint(32)
    else:  # ext_out_msg_info$11 (external-out: logs/events)
        s.load_bit()
        s.load_address()
        info["dest"] = s.load_address()    # addr_extern/none -> None
        info["value"] = None
        s.load_uint(64)
        s.load_uint(32)
        info["external"] = True
    if s.load_bit():                       # init: Maybe (Either SI ^SI)
        if s.load_bit():
            s.load_ref()                   # right: ^StateInit
        else:
            # left: inline StateInit — skip every field so the body
            # Either bit is read from the right position
            if s.load_bit():
                s.load_uint(5)             # split_depth
            if s.load_bit():
                s.load_uint(2)             # special: TickTock
            if s.load_bit():
                s.load_ref()               # code
            if s.load_bit():
                s.load_ref()               # data
            if s.load_bit():
                s.load_ref()               # library (HashmapE root)
    if s.load_bit():
        body = s.load_ref()
    else:
        from ton_indexer_spark.tvm.engine import slice_as_cell

        body = slice_as_cell(s)
    info["body"] = body
    bs = body.begin_parse()
    info["opcode"] = bs.load_uint(32) if body.bits >= 32 else None
    return info


def run_compute_phase(
    code: Cell | bytes | str,
    data: Cell | bytes | str | None,
    *,
    my_address: str | None,
    in_msg: Cell,
    body: Cell,
    msg_value: int,
    balance: int,
    unixtime: int = 1_700_000_000,
    block_lt: int = 0,
    config_root: Cell | None = None,
    gas_limit: int = 10_000_000,
    selector: int = 0,
    storage_fees: int = 0,
    sig_verifier=None,
) -> ComputePhaseResult:
    """Replay an ordinary transaction's compute phase: run the account
    code with the standard internal-message stack
    ``[balance, msg_value, in_msg_full, body_slice, selector=0]``
    (whitepaper 4.4; reference analog: the trace emulator's per-tx TVM
    invocation, ton-index-worker/ton-trace-emulator).  ``balance`` is
    the account balance AFTER crediting the message value, as the real
    compute phase sees it.  Returns exit code, gas, the updated c4 and
    the decoded c5 action list — the storage/action phases (fees,
    actual sends, bounces) are NOT applied here.

    ``config_root`` defaults to the synthesized published-params config
    (tvm/config.py) so CONFIGPARAM-reading contracts see real price
    records instead of null; pass an explicit cell to override."""
    if not isinstance(code, Cell):
        code = parse_boc(code)
    if data is not None and not isinstance(data, Cell):
        data = parse_boc(data)
    if config_root is None:
        from ton_indexer_spark.tvm.config import default_config_root

        config_root = default_config_root()
    stack = [balance, msg_value, in_msg, Slice(body), selector]
    vm = VM(
        code,
        stack,
        c4=data,
        c7=smart_contract_info(
            my_address=my_address, balance=balance, unixtime=unixtime,
            block_lt=block_lt, trans_lt=block_lt,
            config_root=config_root, my_code=code,
            msg_value=msg_value, storage_fees=storage_fees),
        gas_limit=gas_limit,
        sig_verifier=sig_verifier,
    )
    exit_code = vm.run()
    c5 = vm.regs.get("c5")
    try:
        actions = parse_actions(c5) if exit_code in (0, 1) else []
    except Exception:
        actions = [{"type": "parse_error"}]
    return ComputePhaseResult(
        exit_code=exit_code, gas_used=vm.gas_used, stack=vm.stack,
        c4=vm.regs.get("c4"), c5=c5, actions=actions)


def run_compute_phase_external(
    code: Cell | bytes | str,
    data: Cell | bytes | str | None,
    *,
    my_address: str | None,
    in_msg: Cell,
    body: Cell,
    balance: int,
    unixtime: int = 1_700_000_000,
    block_lt: int = 0,
    config_root: Cell | None = None,
    gas_limit: int = 10_000_000,
    sig_verifier=None,
) -> ComputePhaseResult:
    """Replay the compute phase of an EXTERNAL-in transaction: selector
    -1 (recv_external), message value 0 — the path a signed wallet
    message takes.  With the in-engine RFC 8032 verifier behind
    CHKSIGNU/CHKSIGNS this executes the wallet's real signature check
    against the real captured signature (see
    tests/test_tvm.py::test_signed_external_replay)."""
    return run_compute_phase(
        code, data, my_address=my_address, in_msg=in_msg, body=body,
        msg_value=0, balance=balance, unixtime=unixtime,
        block_lt=block_lt, config_root=config_root,
        gas_limit=gas_limit, selector=-1, sig_verifier=sig_verifier)
