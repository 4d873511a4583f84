"""Transaction phases around the compute phase: storage, compute-fee
and ACTION phase bookkeeping with the published fee formulas.

The reference applies full transaction phases through the real emulator
(ton-index-worker/ton-trace-emulator; the fee fields it parses back out
of chain data: tondb-scanner/src/DataParser.cpp:334+).  This module
re-expresses the same accounting from the PUBLISHED formulas (docs.ton
"transaction fees" + the block.tlb price records p18/p20/p21/p24/p25)
so chained compute-phase replay can propagate the value/fee-derived
numbers contracts persist into c4 between hops:

* storage fee   = ceil((bits * bit_price_ps + cells * cell_price_ps)
                       * dt / 2^16)     over the account state's cells
* gas fee       = flat_gas_price                       (first 100 gas)
                + (gas_used - flat_gas_limit) * gas_price / 2^16
* fwd fee       = lump_price + ceil((bits * bit_price + cells
                  * cell_price) / 2^16) over the message EXCLUDING its
                  root cell, distinct cells counted once
* action phase  : RAWRESERVE modes 0-15 and send modes (+1 sender pays
                  fee, +2 ignore errors, +64 carry remaining inbound
                  value, +128 carry whole balance), applied in c5
                  order; the message's recorded fwd_fee keeps
                  (1 - first_frac) of the total, the rest is the
                  action fee (block.tlb msg_forward_prices semantics).

Calibration: the +64/+128 value arithmetic below reproduces the
CAPTURED out-message values of the chain's own transactions for the
golden replay population (tests/test_tvm.py::test_action_phase_values)
— the chain itself, not any reference code, is the oracle that fixed
the formula details (notably: +64 carries the inbound remainder minus
the compute phase's gas fee, and fees round UP).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ton_indexer_spark.functions.boc import Cell, cell_hash

# published mainnet prices (same constants as engine._FEE_CFG and the
# synthesized config cells in tvm/config.py)
GAS_PRICES = {0: (100, 40_000, 26_214_400),
              -1: (100, 1_000_000, 655_360_000)}
FWD_PRICES = {0: (400_000, 26_214_400, 2_621_440_000),
              -1: (10_000_000, 655_360_000, 65_536_000_000)}
STORAGE_PRICES = {0: (1, 500), -1: (1_000, 500_000)}
FIRST_FRAC = 21_845  # of 2^16


def cell_stats(root: Cell | None, *, skip_root: bool = False,
               limit: int = 1 << 16) -> tuple[int, int]:
    """(cells, bits) over the DAG, distinct cells counted once —
    the storage-stat convention fee formulas use."""
    if root is None:
        return 0, 0
    seen: set[bytes] = set()
    stack = list(root.refs) if skip_root else [root]
    bits = root.bits if skip_root else 0
    # NB: with skip_root the root's own bits are charged but the root
    # cell itself is not counted (block.tlb: "cells of the message not
    # counting the root"); its bits ARE part of the message.
    cells = 0
    while stack:
        c = stack.pop()
        h = cell_hash(c)
        if h in seen:
            continue
        seen.add(h)
        cells += 1
        bits += c.bits
        if cells > limit:
            break
        stack.extend(c.refs)
    if skip_root:
        bits -= root.bits  # root bits excluded too (validated vs chain)
    return cells, bits


def storage_fee(code: Cell | None, data: Cell | None, dt: int,
                *, mc: bool = False) -> int:
    """Storage fee for dt seconds on an account holding code+data."""
    if dt <= 0:
        return 0
    bp, cp = STORAGE_PRICES[-1 if mc else 0]
    cc, cb = cell_stats(code)
    dc, db = cell_stats(data)
    bits, cells = cb + db, cc + dc
    return ((bits * bp + cells * cp) * dt + (1 << 16) - 1) >> 16


def gas_fee(gas_used: int, *, mc: bool = False) -> int:
    flat_limit, flat_price, price = GAS_PRICES[-1 if mc else 0]
    if gas_used <= flat_limit:
        return flat_price
    return flat_price + (
        (gas_used - flat_limit) * price + (1 << 16) - 1) // (1 << 16)


def fwd_fee_total(msg: Cell, *, mc: bool = False) -> int:
    """Total forward fee for a message cell (root excluded)."""
    lump, bitp, cellp = FWD_PRICES[-1 if mc else 0]
    cells, bits = cell_stats(msg, skip_root=True)
    return lump + (bits * bitp + cells * cellp + (1 << 16) - 1) \
        // (1 << 16)


def fwd_fee_carried(total: int) -> int:
    """The fwd_fee FIELD recorded in the sent message: the total minus
    the first-transit fraction the action phase keeps."""
    return total - (total * FIRST_FRAC >> 16)


@dataclass
class ActionPhaseResult:
    success: bool
    result_code: int               # 0 ok; 37 = not enough grams, ...
    out_msgs: list = field(default_factory=list)
    balance_after: int = 0
    total_action_fees: int = 0
    total_fwd_fees: int = 0


def apply_action_phase(
    actions: list[dict],
    *,
    balance: int,
    msg_balance_remaining: int,
    original_balance: int | None = None,
    mc: bool = False,
) -> ActionPhaseResult:
    """Execute the c5 action list's balance/value accounting.

    ``balance``: account balance after credit, storage and compute-fee
    deduction.  ``msg_balance_remaining``: what is left of the inbound
    message's value after the compute phase's gas fee (the +64 carry
    source).  ``original_balance``: balance before the inbound message
    was credited (the RAWRESERVE +4 base); defaults to
    ``balance - msg_balance_remaining``.

    Out rows: {dest, opcode, value, fwd_fee, mode, body, message} with
    ``value`` the amount the CHILD is credited (fees already deducted
    when the sender did not pay them separately) and ``fwd_fee`` the
    message-field remainder after the first-transit cut.
    """
    if original_balance is None:
        original_balance = max(0, balance - msg_balance_remaining)
    avail = balance
    reserved = 0
    out: list[dict] = []
    act_fees = 0
    fwd_total_sum = 0
    for a in actions:
        typ = a.get("type")
        if typ == "reserve":
            mode = int(a.get("mode") or 0)
            amount = int(a.get("amount") or 0)
            if mode & 4:
                amount += original_balance
            if mode & 8:
                amount = -amount
            target = amount
            if mode & 1:
                target = avail - amount  # reserve all but `amount`
            if target < 0 or target > avail:
                if mode & 2:
                    target = max(0, min(target, avail))
                else:
                    return ActionPhaseResult(
                        False, 37, [], balance, act_fees, fwd_total_sum)
            avail -= target
            reserved += target
        elif typ == "send_msg":
            mode = int(a.get("mode") or 0)
            msg = a.get("message")
            if a.get("dest") is None or a.get("external"):
                # external-out (log) message: charge its forward fee
                # (all of it is an action fee — there is no next hop),
                # skip unless the balance cannot cover it
                fee = fwd_fee_total(msg, mc=mc) if msg is not None else 0
                if fee > avail:
                    if mode & 2:
                        continue
                    return ActionPhaseResult(
                        False, 37, [], balance, act_fees, fwd_total_sum)
                avail -= fee
                act_fees += fee
                continue
            fee = fwd_fee_total(msg, mc=mc) if msg is not None else 0
            v = int(a.get("value") or 0)
            if mode & 128:
                v = avail - (fee if mode & 1 else 0)
            elif mode & 64:
                v += msg_balance_remaining
            if mode & 1:
                child_value = v
                deduct = v + fee
            else:
                child_value = v - fee
                deduct = v
            if child_value < 0 or deduct > avail:
                if mode & 2:
                    continue  # ignore-errors: skip the send
                return ActionPhaseResult(
                    False, 37, [], balance, act_fees, fwd_total_sum)
            avail -= deduct
            if mode & 64:
                msg_balance_remaining = 0
            first_cut = fee * FIRST_FRAC >> 16
            act_fees += first_cut
            fwd_total_sum += fee
            op = a.get("opcode")
            if op is not None and op >= (1 << 31):
                op -= 1 << 32
            out.append({
                "dest": a.get("dest"),
                "opcode": op,
                "value": child_value,
                "fwd_fee": fee - first_cut,
                "mode": mode,
                "body": a.get("body"),
                "message": msg,
                "bounce": a.get("bounce"),
            })
        # set_code and unknown actions have no balance effect here
    return ActionPhaseResult(True, 0, out, avail + reserved,
                             act_fees, fwd_total_sum)


def build_bounce(
    *,
    src: str | None,
    dest: str | None,
    msg_value: int,
    gas_fee_paid: int,
    body: Cell | None,
    mc: bool = False,
) -> dict | None:
    """The bounce-phase message for a FAILED compute on a bounceable
    inbound message (block.tlb: bounced:1, body = 0xFFFFFFFF ++ first
    256 bits of the original body; value = inbound remainder minus the
    compute gas and the bounce's own forward fee).  Returns an
    action-phase-shaped out row ({dest, opcode, value, fwd_fee,
    bounced}) or None when the remainder cannot cover the fee (the
    real transaction then just drops the message)."""
    from ton_indexer_spark.functions.boc import Builder

    b = Builder().store_uint(0xFFFFFFFF, 32)
    if body is not None:
        s = body.begin_parse()
        n = min(256, s.remaining_bits)
        for _ in range(n):
            b.store_bit(s.load_bit())
    bounce_body = b.end_cell()
    # fee over a root header + the body as a ref (how the bounce is
    # actually packed when the body exceeds the root's spare bits)
    fee_cell = Builder().store_ref(bounce_body).end_cell()
    fee = fwd_fee_total(fee_cell, mc=mc)
    value = msg_value - gas_fee_paid - fee
    if value < 0:
        return None
    return {
        "dest": src,
        "opcode": -1,  # 0xFFFFFFFF as signed int32
        "value": value,
        "fwd_fee": fwd_fee_carried(fee),
        "fwd_fee_total": fee,
        "mode": 0,
        "body": bounce_body,
        "message": fee_cell,
        "bounce": False,
        "bounced": True,
    }
