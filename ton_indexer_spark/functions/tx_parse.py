"""TL-B transaction/message flatten from raw cells (S2 completion).

The reference parses every transaction cell of a block into a flat
~70-column record — compute/action/bounce/storage phases included —
before insertion (`ton-index-worker/tondb-scanner/src/DataParser.cpp:
29-82` drives it; phase parsers at `:304,319,334,383,415`; the flat
struct is `IndexData.h:211-233` / `migrate.cpp:160-233`).  This module
is a clean-room decoder of the PUBLIC TL-B schema (`block.tlb` of
github.com/ton-blockchain/ton) over the engine's pure-Python cell codec
(`functions/boc.py`):

    transaction$0111 account_addr:bits256 lt:uint64
      prev_trans_hash:bits256 prev_trans_lt:uint64 now:uint32
      outmsg_cnt:uint15 orig_status:AccountStatus end_status:AccountStatus
      ^[ in_msg:(Maybe ^(Message Any)) out_msgs:(HashmapE 15 ^(Message Any)) ]
      total_fees:CurrencyCollection state_update:^(HASH_UPDATE Account)
      description:^TransactionDescr

Phases (TransactionDescr trans_ord$0000 / trans_storage$0001 /
trans_tick_tock$001): TrStoragePhase, TrCreditPhase, TrComputePhase
(skipped$0 | vm$1 with a gas-detail child cell), ^TrActionPhase,
TrBouncePhase (negfunds$00 | nofunds$01 | ok$1).

``parse_transaction_boc`` → nested dict; ``flatten_transaction`` → the
flat row; encoders build REAL BOC-encoded fixtures so tests round-trip
through the wire format, not through python conveniences.  Hashes are
genuine cell hashes (sha256 of the standard representation), so tx and
message hashes match what any TON tool would compute for the same cells.

Everything here is plain Python over bytes — Spark-side it runs ONLY
inside Arrow-batched ``mapInPandas`` (sources/tx_ingest.py), never
row-at-a-time in a relational plan.
"""

from __future__ import annotations

import base64
from typing import Any

from ton_indexer_spark.functions.boc import (
    BocError,
    Builder,
    Cell,
    Slice,
    cell_hash_b64,
    parse_boc,
    serialize_boc,
)

ACCOUNT_STATUS = ("uninit", "frozen", "active", "nonexist")
ACC_STATUS_CHANGE = ("unchanged", "frozen", "deleted")
SKIP_REASONS = ("no_state", "bad_state", "no_gas", "suspended")


# ----------------------------------------------------------- hashmap (HmLabel)


def _parse_hashmap(cell: Cell, n: int, prefix: int = 0,
                   out: list[tuple[int, Slice]] | None = None,
                   plen: int = 0) -> list[tuple[int, Slice]]:
    """Hashmap n X → [(key, value-slice)] — labels hml_short$0 (unary
    length), hml_long$10, hml_same$11 per the public hashmap TL-B."""
    if out is None:
        out = []
    s = cell.begin_parse()
    # label
    if s.load_bit() == 0:  # hml_short: unary len then bits
        ln = 0
        while s.load_bit():
            ln += 1
        label = s.load_uint(ln) if ln else 0
    else:
        m = n - plen
        # (#<= m) is len(bin(m)) bits — ZERO bits when m == 0 (the spec's
        # degenerate leaf label); max(1,...) here misread spec-compliant
        # encoders at full-depth forks
        lbits = m.bit_length()
        if s.load_bit() == 0:  # hml_long
            ln = s.load_uint(lbits)
            label = s.load_uint(ln) if ln else 0
        else:  # hml_same: one repeated bit
            v = s.load_bit()
            ln = s.load_uint(lbits)
            label = ((1 << ln) - 1) if v else 0
    plen += ln
    prefix = (prefix << ln) | label
    if plen == n:  # leaf
        out.append((prefix, s))
        return out
    # fork: two refs, left appends 0, right appends 1
    left, right = s.load_ref(), s.load_ref()
    _parse_hashmap(left, n, (prefix << 1) | 0, out, plen + 1)
    _parse_hashmap(right, n, (prefix << 1) | 1, out, plen + 1)
    return out


def _build_hashmap(items: list[tuple[int, Cell]], n: int) -> Cell | None:
    """Build a Hashmap n ^X cell from (key, ref-cell) items (for fixture
    encoding; values stored as single refs — the out_msgs shape)."""
    if not items:
        return None

    def node(entries: list[tuple[str, Cell]], m: int) -> Cell:
        # entries: (remaining key bits as '0'/'1' string, value cell)
        first = entries[0][0]
        common = first
        for k, _ in entries[1:]:
            i = 0
            while i < len(common) and i < len(k) and common[i] == k[i]:
                i += 1
            common = common[:i]
        b = Builder()
        lbits = m.bit_length()  # 0 bits when m == 0, per (#<= m)
        # always emit hml_long: simplest valid label encoding
        b.store_bit(1).store_bit(0)
        if lbits:
            b.store_uint(len(common), lbits)
        for ch in common:
            b.store_bit(ch == "1")
        rest = m - len(common)
        if rest == 0:
            b.store_ref(entries[0][1])
            return b.end_cell()
        zeros = [(k[len(common) + 1:], v) for k, v in entries
                 if k[len(common)] == "0"]
        ones = [(k[len(common) + 1:], v) for k, v in entries
                if k[len(common)] == "1"]
        b.store_ref(node(zeros, rest - 1))
        b.store_ref(node(ones, rest - 1))
        return b.end_cell()

    return node([(format(k, f"0{n}b"), v) for k, v in sorted(items)], n)


# ------------------------------------------------------------------- messages


def parse_message_cell(cell: Cell) -> dict[str, Any]:
    """Message Any → dict (CommonMsgInfo variants int/ext-in/ext-out)."""
    s = cell.begin_parse()
    msg: dict[str, Any] = {
        "hash": cell_hash_b64(cell),
        "source": None, "destination": None, "value": None,
        "ihr_disabled": None, "bounce": None, "bounced": None,
        "ihr_fee": None, "fwd_fee": None, "import_fee": None,
        "created_lt": None, "created_at": None,
        "opcode": None, "body_boc": None, "body_hash": None,
        "init_state_boc": None,
    }
    if s.load_bit() == 0:  # int_msg_info$0
        msg["direction_kind"] = "int"
        msg["ihr_disabled"] = bool(s.load_bit())
        msg["bounce"] = bool(s.load_bit())
        msg["bounced"] = bool(s.load_bit())
        msg["source"] = s.load_address()
        msg["destination"] = s.load_address()
        msg["value"] = s.load_coins()
        if s.load_bit():  # extra currencies present — skip dict ref
            s.load_ref()
        msg["ihr_fee"] = s.load_coins()
        msg["fwd_fee"] = s.load_coins()
        msg["created_lt"] = s.load_uint(64)
        msg["created_at"] = s.load_uint(32)
    elif s.load_bit() == 0:  # ext_in_msg_info$10
        msg["direction_kind"] = "ext_in"
        msg["source"] = s.load_address()  # MsgAddressExt → None
        msg["destination"] = s.load_address()
        msg["import_fee"] = s.load_coins()
    else:  # ext_out_msg_info$11
        msg["direction_kind"] = "ext_out"
        msg["source"] = s.load_address()
        msg["destination"] = s.load_address()  # ext → None
        msg["created_lt"] = s.load_uint(64)
        msg["created_at"] = s.load_uint(32)
    # init:(Maybe (Either StateInit ^StateInit))
    if s.load_bit():
        if s.load_bit():
            msg["init_state_boc"] = base64.b64encode(
                serialize_boc(s.load_ref())
            ).decode()
        else:
            # inline StateInit — consume its fields so the body Either bit
            # that FOLLOWS is read from the right position (real wallet
            # deploys do use the inline form):
            #   _ split_depth:(Maybe (## 5)) special:(Maybe TickTock)
            #     code:(Maybe ^Cell) data:(Maybe ^Cell)
            #     library:(HashmapE 256 SimpleLib)
            init = Builder()
            if s.load_bit():  # split_depth
                init.store_bit(1).store_uint(s.load_uint(5), 5)
            else:
                init.store_bit(0)
            if s.load_bit():  # special:TickTock = tick:Bool tock:Bool
                init.store_bit(1).store_uint(s.load_uint(2), 2)
            else:
                init.store_bit(0)
            for _ in range(2):  # code / data Maybe ^Cell
                if s.load_bit():
                    init.store_bit(1).store_ref(s.load_ref())
                else:
                    init.store_bit(0)
            if s.load_bit():  # library HashmapE root
                init.store_bit(1).store_ref(s.load_ref())
            else:
                init.store_bit(0)
            msg["init_state_boc"] = base64.b64encode(
                serialize_boc(init.end_cell())
            ).decode()
    # body:(Either X ^X)
    if s.load_bit():
        body = s.load_ref()
    else:
        rest = Builder()
        while s.remaining_bits:
            rest.store_bit(s.load_bit())
        while s.remaining_refs:
            rest.store_ref(s.load_ref())
        body = rest.end_cell()
    msg["body_boc"] = base64.b64encode(serialize_boc(body)).decode()
    msg["body_hash"] = cell_hash_b64(body)
    bs = body.begin_parse()
    if bs.remaining_bits >= 32:
        msg["opcode"] = bs.load_uint(32)
    return msg


def encode_message_cell(
    source: str | None,
    destination: str | None,
    value: int | None = None,
    *,
    kind: str = "int",
    bounce: bool = False,
    bounced: bool = False,
    ihr_fee: int = 0,
    fwd_fee: int = 0,
    import_fee: int = 0,
    created_lt: int = 0,
    created_at: int = 0,
    body: Cell | None = None,
) -> Cell:
    b = Builder()
    if kind == "int":
        b.store_bit(0)
        b.store_bit(1)  # ihr_disabled
        b.store_bit(bounce).store_bit(bounced)
        b.store_address(source).store_address(destination)
        b.store_coins(value or 0)
        b.store_bit(0)  # no extra currencies
        b.store_coins(ihr_fee).store_coins(fwd_fee)
        b.store_uint(created_lt, 64).store_uint(created_at, 32)
    elif kind == "ext_in":
        b.store_uint(0b10, 2)
        b.store_address(None).store_address(destination)
        b.store_coins(import_fee)
    else:  # ext_out
        b.store_uint(0b11, 2)
        b.store_address(source).store_address(None)
        b.store_uint(created_lt, 64).store_uint(created_at, 32)
    b.store_bit(0)  # no init
    if body is not None:
        b.store_bit(1).store_ref(body)  # body as ref
    else:
        b.store_bit(0)
    return b.end_cell()


# --------------------------------------------------------------------- phases


def _parse_storage_phase(s: Slice) -> dict[str, Any]:
    # storage_ph$_ fees_collected:Grams fees_due:(Maybe Grams)
    #   status_change:AccStatusChange  (DataParser.cpp:304)
    ph = {"storage_fees_collected": s.load_coins(),
          "storage_fees_due": s.load_coins() if s.load_bit() else None}
    ph["storage_status_change"] = _parse_status_change(s)
    return ph


def _parse_status_change(s: Slice) -> str:
    if s.load_bit() == 0:
        return "unchanged"
    return "deleted" if s.load_bit() else "frozen"


def _parse_credit_phase(s: Slice) -> dict[str, Any]:
    # tr_phase_credit$_ due_fees_collected:(Maybe Grams)
    #   credit:CurrencyCollection  (DataParser.cpp:319)
    ph = {"credit_due_fees_collected":
          s.load_coins() if s.load_bit() else None,
          "credit": s.load_coins()}
    if s.load_bit():  # extra currencies
        s.load_ref()
    return ph


def _parse_compute_phase(s: Slice) -> dict[str, Any]:
    # tr_phase_compute_skipped$0 | tr_phase_compute_vm$1 (DataParser.cpp:334)
    if s.load_bit() == 0:
        return {"compute_skipped": True,
                "skipped_reason": _parse_skip_reason(s)}
    ph: dict[str, Any] = {"compute_skipped": False}
    ph["compute_success"] = bool(s.load_bit())
    ph["compute_msg_state_used"] = bool(s.load_bit())
    ph["compute_account_activated"] = bool(s.load_bit())
    ph["compute_gas_fees"] = s.load_coins()
    d = s.load_ref().begin_parse()
    ph["compute_gas_used"] = d.load_var_uint(3)
    ph["compute_gas_limit"] = d.load_var_uint(3)
    ph["compute_gas_credit"] = d.load_var_uint(2) if d.load_bit() else None
    ph["compute_mode"] = d.load_int(8)
    ph["compute_exit_code"] = d.load_int(32)
    ph["compute_exit_arg"] = d.load_int(32) if d.load_bit() else None
    ph["compute_vm_steps"] = d.load_uint(32)
    ph["compute_vm_init_state_hash"] = base64.b64encode(
        d.load_uint(256).to_bytes(32, "big")).decode()
    ph["compute_vm_final_state_hash"] = base64.b64encode(
        d.load_uint(256).to_bytes(32, "big")).decode()
    return ph


def _parse_skip_reason(s: Slice) -> str:
    tag = s.load_uint(2)
    if tag == 0b11:  # cskip_suspended$110
        s.load_bit()
        return "suspended"
    return SKIP_REASONS[tag]


def _parse_action_phase(s: Slice) -> dict[str, Any]:
    # tr_phase_action$_ … (DataParser.cpp:383)
    ph: dict[str, Any] = {}
    ph["action_success"] = bool(s.load_bit())
    ph["action_valid"] = bool(s.load_bit())
    ph["action_no_funds"] = bool(s.load_bit())
    ph["action_status_change"] = _parse_status_change(s)
    ph["action_total_fwd_fees"] = s.load_coins() if s.load_bit() else None
    ph["action_total_action_fees"] = s.load_coins() if s.load_bit() else None
    ph["action_result_code"] = s.load_int(32)
    ph["action_result_arg"] = s.load_int(32) if s.load_bit() else None
    ph["action_tot_actions"] = s.load_uint(16)
    ph["action_spec_actions"] = s.load_uint(16)
    ph["action_skipped_actions"] = s.load_uint(16)
    ph["action_msgs_created"] = s.load_uint(16)
    ph["action_action_list_hash"] = base64.b64encode(
        s.load_uint(256).to_bytes(32, "big")).decode()
    ph["action_tot_msg_size_cells"] = s.load_var_uint(3)
    ph["action_tot_msg_size_bits"] = s.load_var_uint(3)
    return ph


def _parse_bounce_phase(s: Slice) -> dict[str, Any]:
    # tr_phase_bounce_negfunds$00 | nofunds$01 | ok$1 (DataParser.cpp:415)
    if s.load_bit():
        ph = {"bounce": "ok"}
        ph["bounce_msg_size_cells"] = s.load_var_uint(3)
        ph["bounce_msg_size_bits"] = s.load_var_uint(3)
        ph["bounce_msg_fees"] = s.load_coins()
        ph["bounce_fwd_fees"] = s.load_coins()
        return ph
    if s.load_bit():
        ph = {"bounce": "nofunds"}
        ph["bounce_msg_size_cells"] = s.load_var_uint(3)
        ph["bounce_msg_size_bits"] = s.load_var_uint(3)
        ph["bounce_req_fwd_fees"] = s.load_coins()
        return ph
    return {"bounce": "negfunds"}


def _parse_descr(cell: Cell) -> dict[str, Any]:
    s = cell.begin_parse()
    tag4 = s.load_uint(4)
    d: dict[str, Any] = {}
    if tag4 == 0b0000:  # trans_ord
        d["descr"] = "ord"
        d["credit_first"] = bool(s.load_bit())
        if s.load_bit():
            d.update(_parse_storage_phase(s))
        if s.load_bit():
            d.update(_parse_credit_phase(s))
        d.update(_parse_compute_phase(s))
        if s.load_bit():
            d.update(_parse_action_phase(s.load_ref().begin_parse()))
        d["aborted"] = bool(s.load_bit())
        if s.load_bit():
            d.update(_parse_bounce_phase(s))
        d["destroyed"] = bool(s.load_bit())
    elif tag4 == 0b0001:  # trans_storage
        d["descr"] = "storage"
        d.update(_parse_storage_phase(s))
        d["aborted"] = False
        d["destroyed"] = False
    elif tag4 in (0b0010, 0b0011):  # trans_tick_tock$001 is_tock:Bool
        d["descr"] = "tick_tock"
        d["is_tock"] = bool(tag4 & 1)
        d.update(_parse_storage_phase(s))
        d.update(_parse_compute_phase(s))
        if s.load_bit():
            d.update(_parse_action_phase(s.load_ref().begin_parse()))
        d["aborted"] = bool(s.load_bit())
        d["destroyed"] = bool(s.load_bit())
    else:
        # split/merge descrs are masterchain-rare; record the tag and stop
        d["descr"] = f"other_{tag4:04b}"
        d["aborted"] = False
        d["destroyed"] = False
    return d


# --------------------------------------------------------------- transactions


def parse_transaction_cell(cell: Cell) -> dict[str, Any]:
    """Transaction cell → nested dict (tx fields + in_msg + out_msgs +
    description phases) — the analog of the reference's
    ``parse_transaction`` (DataParser.cpp:429-516)."""
    s = cell.begin_parse()
    if s.load_uint(4) != 0b0111:
        raise BocError("not a transaction cell")
    tx: dict[str, Any] = {"hash": cell_hash_b64(cell)}
    acc = s.load_uint(256)
    tx["lt"] = s.load_uint(64)
    tx["prev_trans_hash"] = base64.b64encode(
        s.load_uint(256).to_bytes(32, "big")).decode()
    tx["prev_trans_lt"] = s.load_uint(64)
    tx["now"] = s.load_uint(32)
    outmsg_cnt = s.load_uint(15)
    tx["orig_status"] = ACCOUNT_STATUS[s.load_uint(2)]
    tx["end_status"] = ACCOUNT_STATUS[s.load_uint(2)]
    # msgs child cell: in_msg:(Maybe ^Message) out_msgs:(HashmapE 15 ^Message)
    ms = s.load_ref().begin_parse()
    tx["in_msg"] = (
        parse_message_cell(ms.load_ref()) if ms.load_bit() else None
    )
    out_msgs: list[dict[str, Any]] = []
    if ms.load_bit():
        for key, leaf in sorted(_parse_hashmap(ms.load_ref(), 15)):
            out_msgs.append(parse_message_cell(leaf.load_ref()))
    if len(out_msgs) != outmsg_cnt:
        raise BocError(
            f"outmsg_cnt {outmsg_cnt} != hashmap size {len(out_msgs)}"
        )
    tx["out_msgs"] = out_msgs
    tx["total_fees"] = s.load_coins()
    if s.load_bit():  # total_fees extra currencies
        s.load_ref()
    # state_update:^(HASH_UPDATE Account) — update_hashes#72
    u = s.load_ref().begin_parse()
    if u.load_uint(8) != 0x72:
        raise BocError("bad HASH_UPDATE tag")
    tx["account_state_hash_before"] = base64.b64encode(
        u.load_uint(256).to_bytes(32, "big")).decode()
    tx["account_state_hash_after"] = base64.b64encode(
        u.load_uint(256).to_bytes(32, "big")).decode()
    tx.update(_parse_descr(s.load_ref()))
    # account address: the cell stores only the 256-bit account id; the
    # workchain comes from the enclosing block (parse_transaction_boc's
    # ``workchain`` argument fills it)
    tx["account_id"] = f"{acc:064x}"
    return tx


def parse_transaction_boc(raw: bytes | str, workchain: int = 0) -> dict[str, Any]:
    tx = parse_transaction_cell(parse_boc(raw))
    tx["account"] = f"{workchain}:{tx.pop('account_id')}"
    return tx


# ------------------------------------------------------------------- encoders


def encode_transaction_cell(
    account_id: int,
    lt: int,
    now: int,
    *,
    prev_trans_hash: int = 0,
    prev_trans_lt: int = 0,
    orig_status: str = "active",
    end_status: str = "active",
    in_msg: Cell | None = None,
    out_msgs: list[Cell] | None = None,
    total_fees: int = 0,
    state_hash_before: int = 0,
    state_hash_after: int = 0,
    descr: Cell | None = None,
) -> Cell:
    """Build a REAL transaction cell (fixture side of the round-trip)."""
    b = Builder()
    b.store_uint(0b0111, 4)
    b.store_uint(account_id, 256)
    b.store_uint(lt, 64)
    b.store_uint(prev_trans_hash, 256).store_uint(prev_trans_lt, 64)
    b.store_uint(now, 32)
    b.store_uint(len(out_msgs or []), 15)
    b.store_uint(ACCOUNT_STATUS.index(orig_status), 2)
    b.store_uint(ACCOUNT_STATUS.index(end_status), 2)
    ms = Builder()
    if in_msg is not None:
        ms.store_bit(1).store_ref(in_msg)
    else:
        ms.store_bit(0)
    # value X = ^(Message Any): the leaf edge stores the message cell as
    # its single ref, so items carry the message cells directly
    hm = _build_hashmap(list(enumerate(out_msgs or [])), 15)
    if hm is not None:
        ms.store_bit(1).store_ref(hm)
    else:
        ms.store_bit(0)
    b.store_ref(ms.end_cell())
    b.store_coins(total_fees).store_bit(0)  # no extra currencies
    upd = Builder().store_uint(0x72, 8)
    upd.store_uint(state_hash_before, 256).store_uint(state_hash_after, 256)
    b.store_ref(upd.end_cell())
    b.store_ref(descr if descr is not None else encode_ord_descr())
    return b.end_cell()


def encode_ord_descr(
    *,
    storage_fees: int | None = 1000,
    credit: int | None = None,
    compute_success: bool = True,
    gas_fees: int = 4000,
    gas_used: int = 3000,
    gas_limit: int = 100000,
    exit_code: int = 0,
    vm_steps: int = 55,
    action: dict[str, Any] | None = None,
    aborted: bool = False,
    bounce: str | None = None,
    destroyed: bool = False,
) -> Cell:
    """trans_ord descr with storage + vm-compute (+ optional action/bounce)."""
    b = Builder()
    b.store_uint(0b0000, 4)
    b.store_bit(0)  # credit_first
    if storage_fees is not None:
        b.store_bit(1)
        b.store_coins(storage_fees).store_bit(0)  # no fees_due
        b.store_bit(0)  # status unchanged
    else:
        b.store_bit(0)
    if credit is not None:
        b.store_bit(1)
        b.store_bit(0)  # no due_fees_collected
        b.store_coins(credit).store_bit(0)  # no extra currencies
    else:
        b.store_bit(0)
    # compute vm
    b.store_bit(1)
    b.store_bit(compute_success)
    b.store_bit(0).store_bit(0)  # msg_state_used, account_activated
    b.store_coins(gas_fees)
    d = Builder()
    d.store_var_uint(gas_used, 3).store_var_uint(gas_limit, 3)
    d.store_bit(0)  # no gas_credit
    d.store_int(0, 8)  # mode
    d.store_int(exit_code, 32)
    d.store_bit(0)  # no exit_arg
    d.store_uint(vm_steps, 32)
    d.store_uint(0, 256).store_uint(0, 256)  # vm state hashes
    b.store_ref(d.end_cell())
    if action is not None:
        a = Builder()
        a.store_bit(action.get("success", True))
        a.store_bit(action.get("valid", True))
        a.store_bit(action.get("no_funds", False))
        a.store_bit(0)  # status unchanged
        fwd = action.get("total_fwd_fees")
        if fwd is not None:
            a.store_bit(1).store_coins(fwd)
        else:
            a.store_bit(0)
        act_fees = action.get("total_action_fees")
        if act_fees is not None:
            a.store_bit(1).store_coins(act_fees)
        else:
            a.store_bit(0)
        a.store_int(action.get("result_code", 0), 32)
        a.store_bit(0)  # no result_arg
        a.store_uint(action.get("tot_actions", 1), 16)
        a.store_uint(action.get("spec_actions", 0), 16)
        a.store_uint(action.get("skipped_actions", 0), 16)
        a.store_uint(action.get("msgs_created", 1), 16)
        a.store_uint(0, 256)  # action_list_hash
        a.store_var_uint(action.get("tot_msg_size_cells", 1), 3)
        a.store_var_uint(action.get("tot_msg_size_bits", 256), 3)
        b.store_bit(1).store_ref(a.end_cell())
    else:
        b.store_bit(0)
    b.store_bit(aborted)
    if bounce is not None:
        b.store_bit(1)
        if bounce == "ok":
            b.store_bit(1)
            b.store_var_uint(1, 3).store_var_uint(256, 3)
            b.store_coins(100).store_coins(200)
        elif bounce == "nofunds":
            b.store_uint(0b01, 2)
            b.store_var_uint(1, 3).store_var_uint(256, 3)
            b.store_coins(300)
        else:
            b.store_uint(0b00, 2)
    else:
        b.store_bit(0)
    b.store_bit(destroyed)
    return b.end_cell()


# ------------------------------------------------------------------ flatten

# every column of the flat row, in schema order (nullable where a phase or
# field is absent) — mirrors migrate.cpp:160-233
FLAT_COLUMNS: tuple[str, ...] = (
    "account", "hash", "lt", "prev_trans_hash", "prev_trans_lt", "now",
    "orig_status", "end_status", "total_fees",
    "account_state_hash_before", "account_state_hash_after",
    "descr", "aborted", "destroyed", "credit_first", "is_tock",
    "storage_fees_collected", "storage_fees_due", "storage_status_change",
    "credit_due_fees_collected", "credit",
    "compute_skipped", "skipped_reason", "compute_success",
    "compute_msg_state_used", "compute_account_activated",
    "compute_gas_fees", "compute_gas_used", "compute_gas_limit",
    "compute_gas_credit", "compute_mode", "compute_exit_code",
    "compute_exit_arg", "compute_vm_steps",
    "compute_vm_init_state_hash", "compute_vm_final_state_hash",
    "action_success", "action_valid", "action_no_funds",
    "action_status_change", "action_total_fwd_fees",
    "action_total_action_fees", "action_result_code", "action_result_arg",
    "action_tot_actions", "action_spec_actions", "action_skipped_actions",
    "action_msgs_created", "action_action_list_hash",
    "action_tot_msg_size_cells", "action_tot_msg_size_bits",
    "bounce", "bounce_msg_size_cells", "bounce_msg_size_bits",
    "bounce_msg_fees", "bounce_req_fwd_fees", "bounce_fwd_fees",
)


def flatten_transaction(tx: dict[str, Any]) -> dict[str, Any]:
    """Nested parse → the flat ~70-col row (messages reported separately
    via ``tx['in_msg']`` / ``tx['out_msgs']``)."""
    return {c: tx.get(c) for c in FLAT_COLUMNS}


# ------------------------------------------------------- block header parse


def parse_block_header(raw: bytes | str) -> dict[str, Any]:
    """Block root cell → the blocks-table header subset the reference
    extracts per block row (DataParser.cpp:429-516 block arm).

    TL-B (public block.tlb):
      block#11ef55aa global_id:int32 info:^BlockInfo value_flow:^ValueFlow
        state_update:^(MERKLE_UPDATE ShardState) extra:^BlockExtra
      block_info#9bc7a987 version:uint32 not_master:(## 1)
        after_merge:(## 1) before_split:(## 1) after_split:(## 1)
        want_split:Bool want_merge:Bool key_block:Bool
        vert_seqno_incr:(## 1) flags:(## 8) seq_no:# vert_seq_no:#
        shard:ShardIdent gen_utime:uint32 start_lt:uint64 end_lt:uint64
        gen_validator_list_hash_short:uint32 gen_catchain_seqno:uint32
        min_ref_mc_seqno:uint32 prev_key_block_seqno:uint32 …
        master_ref:not_master?^BlkMasterInfo …
      shard_ident$00 shard_pfx_bits:(#<= 60) workchain_id:int32
        shard_prefix:uint64
    """
    root = parse_boc(raw)
    s = root.begin_parse()
    magic = s.load_uint(32)
    if magic != 0x11EF55AA:
        raise BocError(f"not a block cell (magic {magic:#x})")
    d: dict[str, Any] = {"global_id": s.load_int(32)}
    info = s.load_ref().begin_parse()
    if info.load_uint(32) != 0x9BC7A987:
        raise BocError("bad block_info magic")
    d["version"] = info.load_uint(32)
    not_master = info.load_bit()
    d["after_merge"] = bool(info.load_bit())
    d["before_split"] = bool(info.load_bit())
    d["after_split"] = bool(info.load_bit())
    d["want_split"] = bool(info.load_bit())
    d["want_merge"] = bool(info.load_bit())
    d["key_block"] = bool(info.load_bit())
    vert_seqno_incr = info.load_bit()
    flags = info.load_uint(8)
    d["seqno"] = info.load_uint(32)
    d["vert_seqno"] = info.load_uint(32)
    if info.load_uint(2) != 0:
        raise BocError("bad shard_ident tag")
    pfx_bits = info.load_uint(6)
    d["workchain"] = info.load_int(32)
    prefix = info.load_uint(64)
    # the int64 shard id: prefix with the marker bit below the used prefix
    shard = (prefix | (1 << (63 - pfx_bits))) & ((1 << 64) - 1)
    d["shard"] = shard - (1 << 64) if shard >= (1 << 63) else shard
    d["gen_utime"] = info.load_uint(32)
    d["start_lt"] = info.load_uint(64)
    d["end_lt"] = info.load_uint(64)
    d["validator_list_hash_short"] = info.load_uint(32)
    d["catchain_seqno"] = info.load_uint(32)
    d["min_ref_mc_seqno"] = info.load_uint(32)
    d["prev_key_block_seqno"] = info.load_uint(32)
    if flags & 1:  # gen_software:flags.0?GlobalVersion
        info.load_uint(32)  # version
        info.load_uint(64)  # capabilities
    if not_master and info.remaining_refs >= 1:
        # master_ref:^BlkMasterInfo → ExtBlkRef{end_lt seq_no …}
        mref = info.load_ref().begin_parse()
        mref.load_uint(64)  # end_lt
        d["mc_block_seqno"] = mref.load_uint(32)
    else:
        d["mc_block_seqno"] = d["seqno"] if d["workchain"] == -1 else None
    d["root_hash"] = cell_hash_b64(root)
    return d


def encode_block_header(
    *,
    workchain: int = 0,
    shard_pfx_bits: int = 0,
    shard_prefix: int = 0,
    seqno: int = 1,
    gen_utime: int = 0,
    start_lt: int = 0,
    end_lt: int = 0,
    mc_ref_seqno: int | None = None,
    key_block: bool = False,
    global_id: int = -239,
) -> str:
    """Fixture encoder for the block-header subset (base64 BOC)."""
    not_master = workchain != -1
    info = Builder().store_uint(0x9BC7A987, 32).store_uint(1, 32)
    info.store_bit(1 if not_master else 0)
    for _ in range(4):  # after_merge/before_split/after_split/want_split
        info.store_bit(0)
    info.store_bit(0).store_bit(1 if key_block else 0)
    info.store_bit(0)          # vert_seqno_incr
    info.store_uint(0, 8)      # flags (no gen_software)
    info.store_uint(seqno, 32).store_uint(0, 32)
    info.store_uint(0, 2).store_uint(shard_pfx_bits, 6)
    info.store_int(workchain, 32).store_uint(shard_prefix, 64)
    info.store_uint(gen_utime, 32)
    info.store_uint(start_lt, 64).store_uint(end_lt, 64)
    info.store_uint(7, 32).store_uint(8, 32)      # val-list hash, catchain
    info.store_uint(mc_ref_seqno or 0, 32)        # min_ref_mc_seqno
    info.store_uint(0, 32)                        # prev_key_block_seqno
    if not_master:
        mref = (
            Builder().store_uint(end_lt, 64)
            .store_uint(mc_ref_seqno or 0, 32)
            .store_uint(0, 256).store_uint(0, 256).end_cell()
        )
        info.store_ref(mref)
    b = (
        Builder().store_uint(0x11EF55AA, 32).store_int(global_id, 32)
        .store_ref(info.end_cell())
    )
    return base64.b64encode(serialize_boc(b.end_cell())).decode()
