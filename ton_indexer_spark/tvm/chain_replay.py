"""Chained transaction replay: re-execute an account's whole captured
transaction SEQUENCE, propagating state (c4), CODE (set_code actions)
and balance (full fee phases) between hops — the chain's own captured
outcomes are the oracle for every hop.

Round-10 measured this frontier at 13/34 exact out-sets and diagnosed
"fee-derived c4 values".  Rebuilding the harness as a first-class
module (round 11) falsified that diagnosis; the real causes were:

1. **SETCODE was not propagated between hops.**  Lazy-deployment
   contracts (the DeDust liquidity depositary pattern) install their
   REAL code from the first message's handler; replaying every later
   hop on the bootstrap code takes its refuse/refund branch.
2. **Population construction**: when an init_state is retransmitted on
   several messages (both DeDust vault legs attach it), taking the
   LAST init-carrying tx as the deployment silently drops the earlier
   hops' state accumulation.  The deployment is the FIRST.
3. **Unknowable pre-state**: chains whose first init-carrying tx has
   ``orig_status='active'`` ran on real prior state the fixtures do
   not contain — the chain ignored the init_state.  These are
   reported as ``pre_state_known=False``, not counted as engine
   failures (same doctrine as the stale-seqno signed external).
4. Two opcodes real post-setcode code uses (CDEPTH, LDZEROES family)
   were unimplemented.

With those fixed — and the published storage/gas/forward fee formulas
of :mod:`ton_indexer_spark.tvm.phases` applied between hops — the
known-pre-state population replays at 31/31 exit codes and 18/18
exact out-message sets (pinned in tests/test_tvm.py).  Residual
out-message VALUE deltas are bounded by the declared gas-schedule
approximation (the engine's whitepaper-base gas vs the C++ table) and
are reported per-row, never hidden.

Reference analog: the trace emulator applies full transaction phases
through the real emulator (ton-index-worker/ton-trace-emulator;
fee-field parsing tondb-scanner/src/DataParser.cpp:334+).
"""

from __future__ import annotations

import glob as _glob
import os
from collections import defaultdict

from ton_indexer_spark.functions.boc import Cell, parse_boc
from ton_indexer_spark.tvm.phases import (
    apply_action_phase,
    gas_fee,
    storage_fee,
)
from ton_indexer_spark.tvm.run import (
    build_internal_message,
    run_compute_phase,
)

TRACES = "/root/reference/indexer/tests/traces"


def _state_init(b64: str) -> tuple[Cell | None, Cell | None]:
    s = parse_boc(b64).begin_parse()
    if s.load_bit():
        s.load_uint(5)
    if s.load_bit():
        s.load_uint(2)
    return s.load_maybe_ref(), s.load_maybe_ref()


def _in_msg(tx: dict) -> dict | None:
    return next((m for m in tx["messages"] if m["direction"] == "in"),
                None)


def extract_chains(trace_dir: str = TRACES) -> list[dict]:
    """One chain per account deployed (init_state on an internal
    message) with at least one follow-up transaction in the same
    trace.  The deployment is the FIRST init-carrying tx by lt."""
    chains = []
    for f in sorted(_glob.glob(os.path.join(trace_dir, "*.lz4"))):
        from ton_indexer_spark.functions.fixture_codec import (
            load_lz4_msgpack,
        )

        d = load_lz4_msgpack(f)
        deployed: dict[str, dict] = {}
        by_acct = defaultdict(list)
        for tx in d["transactions"]:
            by_acct[tx["account"]].append(tx)
            inm = _in_msg(tx)
            if (inm and (inm.get("init_state") or {}).get("body")
                    and inm.get("source") is not None):
                cur = deployed.get(tx["account"])
                if cur is None or tx["lt"] < cur["lt"]:
                    deployed[tx["account"]] = tx
        for acct, dep in deployed.items():
            subs = sorted(
                (t for t in by_acct[acct] if t["lt"] > dep["lt"]),
                key=lambda t: t["lt"])
            if not subs:
                continue
            chains.append({
                "trace": os.path.basename(f),
                "account": acct,
                "deploy": dep,
                "followups": subs,
                "pre_state_known":
                    dep.get("orig_status") in ("nonexist", "uninit"),
            })
    return chains


def msg_fields_of_tx(tx: dict) -> dict:
    """Trace-shaped transaction → the flat msg-field dict the replay
    core and the golden fixtures share (one replay code path for both
    shapes)."""
    inm = _in_msg(tx)
    mcc = inm.get("message_content") or {}
    return {
        "tx_hash": tx.get("hash"),
        "dest": tx["account"],
        "src": inm.get("source"),
        "value": int(inm.get("value") or 0),
        "body_boc": mcc.get("body"),
        "init_state_boc": (inm.get("init_state") or {}).get("body"),
        "bounce": bool(inm.get("bounce")),
        "bounced": bool(inm.get("bounced")),
        "fwd_fee": int(inm.get("fwd_fee") or 0),
        "ihr_fee": int(inm.get("ihr_fee") or 0),
        "created_lt": int(inm.get("created_lt") or 0),
        "created_at": int(inm.get("created_at") or 0),
        "now": tx["now"],
        "lt": tx["lt"],
        "credit_first": bool(tx.get("credit_first")),
        "descr": tx.get("descr"),
    }


def _replay_one(code, data, tx, bal_before, prev_now):
    """Full-phase replay of one trace-shaped tx (storage fee → credit
    → compute → gas fee → action/bounce phase) — delegates to the
    msg-field core."""
    return _replay_msg_fields(code, data, msg_fields_of_tx(tx),
                              bal_before, prev_now, 10_000_000)


def _is_mc(account: str | None) -> bool:
    """Masterchain accounts price with the -1 workchain fee tuples."""
    return bool(account) and str(account).startswith("-1:")


def _bounce_phase(m, res, value, bal, *, mc: bool = False):
    """Bounce phase for a failed compute: emit the 0xFFFFFFFF bounce
    back to the sender when the inbound message was bounceable and not
    itself bounced (block.tlb bounce semantics; SHAPE matched against
    the one captured bounce in the traces — dest = sender, opcode
    0xFFFFFFFF, body = 0xFFFFFFFF ++ first 256 bits of the original
    body — whose own replay is excluded because its code is a
    masterchain library stub).  ``m`` is the flat msg-field dict.
    Returns an ActionPhaseResult carrying the bounce as its only out
    message, or None when no bounce applies."""
    from ton_indexer_spark.tvm.phases import (
        ActionPhaseResult,
        build_bounce,
    )

    if not m.get("bounce") or m.get("bounced"):
        return None
    body = parse_boc(m["body_boc"]) if m.get("body_boc") else None
    gf = gas_fee(res.gas_used, mc=mc)
    out = build_bounce(src=m.get("src"), dest=m.get("dest"),
                       msg_value=value, gas_fee_paid=gf, body=body,
                       mc=mc)
    if out is None:
        return None
    # balance after: gas paid, then the bounce carries value + its
    # full (exact, not field-reconstructed) forward fee out
    return ActionPhaseResult(
        True, 0, [out],
        max(0, bal - gf - out["value"] - out["fwd_fee_total"]), 0, 0)


def _captured_out(tx: dict) -> list[tuple[str, str]]:
    return sorted((str(m["destination"]), str(m.get("opcode")))
                  for m in tx["messages"] if m["direction"] == "out")


def _got_out(ap) -> list[tuple[str, str]]:
    if ap is None or not ap.success:
        return []
    return sorted((str(o["dest"]), str(o["opcode"]))
                  for o in ap.out_msgs)


def replay_chain(chain: dict) -> list[dict]:
    """Replay a chain's follow-up transactions; one audit row each.

    Row: trace, account, hop, tx_hash, pre_state_known, exit_code,
    expected_exit_code, exit_match, out_msgs, expected_out, out_match,
    value_delta_max (largest |got-want| over matched messages, None if
    nothing matched).
    """
    dep = chain["deploy"]
    inm = _in_msg(dep)
    code, data = _state_init(inm["init_state"]["body"])
    rows: list[dict] = []
    if (code is None or data is None or code.exotic
            or code.bits == 264):
        return rows
    res, ap, bal, prev_now = _replay_one(code, data, dep, 0, None)
    c4 = res.c4 if res.c4 is not None else data
    if res.success:
        for a in res.actions:
            if a["type"] == "set_code":
                code = a["code"]
    for hop, tx in enumerate(chain["followups"]):
        inm2 = _in_msg(tx)
        if (inm2 is None or tx.get("descr") != "ord"
                or not (inm2.get("message_content") or {}).get("body")):
            continue
        res2, ap2, bal, prev_now = _replay_one(
            code, c4, tx, bal, prev_now)
        want_e = tx.get("compute_exit_code")
        want_o = _captured_out(tx)
        got_o = _got_out(ap2)
        vmax = None
        if ap2 is not None and ap2.success:
            cap = {(str(m["destination"]), str(m.get("opcode"))):
                   int(m.get("value") or 0)
                   for m in tx["messages"] if m["direction"] == "out"}
            deltas = [abs(o["value"] - cap[k]) for o in ap2.out_msgs
                      if (k := (str(o["dest"]), str(o["opcode"])))
                      in cap]
            vmax = max(deltas) if deltas else None
        rows.append({
            "trace": chain["trace"],
            "account": chain["account"],
            "hop": hop,
            "tx_hash": tx["hash"],
            "pre_state_known": chain["pre_state_known"],
            "exit_code": res2.exit_code,
            "expected_exit_code": want_e,
            "exit_match": res2.exit_code == want_e,
            "out_msgs": [f"{d}:{o}" for d, o in got_o],
            "expected_out": [f"{d}:{o}" for d, o in want_o],
            "out_match": got_o == want_o,
            "value_delta_max": vmax,
        })
        if res2.c4 is not None:
            c4 = res2.c4
        if res2.success:
            for a in res2.actions:
                if a["type"] == "set_code":
                    code = a["code"]
    return rows


def replay_all(trace_dir: str = TRACES) -> list[dict]:
    rows: list[dict] = []
    for chain in extract_chains(trace_dir):
        rows.extend(replay_chain(chain))
    return rows


def _replay_msg_fields(code, data, m: dict, bal_before: int,
                       prev_now: int | None, gas_limit: int):
    """Like _replay_one but over the flat msg-field dict shape the
    golden fixture serializes (tvm/golden/chained_replay.json)."""
    body = parse_boc(m["body_boc"]) if m.get("body_boc") else Cell()
    value = int(m.get("value") or 0)
    dt = max(0, int(m["now"]) - prev_now) if prev_now else 0
    sf = storage_fee(code, data, dt, mc=_is_mc(m.get("dest")))
    bal = max(0, bal_before - sf) + value
    if m.get("credit_first"):
        bal = max(0, bal_before + value - sf)
    init_b = m.get("init_state_boc")
    msg = build_internal_message(
        src=m.get("src"), dest=m.get("dest"), value=value, body=body,
        init=parse_boc(init_b) if init_b else None,
        bounce=bool(m.get("bounce")), bounced=bool(m.get("bounced")),
        fwd_fee=int(m.get("fwd_fee") or 0),
        ihr_fee=int(m.get("ihr_fee") or 0),
        created_lt=int(m.get("created_lt") or 0),
        created_at=int(m.get("created_at") or 0))
    res = run_compute_phase(
        code, data, my_address=m.get("dest"), in_msg=msg, body=body,
        msg_value=value, balance=bal, unixtime=int(m["now"]),
        block_lt=int(m["lt"]), gas_limit=gas_limit)
    mc = _is_mc(m.get("dest"))
    gf = gas_fee(res.gas_used, mc=mc)
    if not res.success:
        # gas is charged on a FAILED compute too; the bounce phase (if
        # any) accounts for it itself
        ap = _bounce_phase(m, res, value, bal, mc=mc)
        return res, ap, \
            (ap.balance_after if ap else max(0, bal - gf)), int(m["now"])
    bal_pc = max(0, bal - gf)
    ap = apply_action_phase(
        res.actions, balance=bal_pc,
        msg_balance_remaining=max(0, min(value - gf, bal_pc)),
        original_balance=max(0, bal - value), mc=mc)
    return res, ap, (ap.balance_after if ap.success else bal_pc), \
        int(m["now"])


def replay_chain_msgs(account: str, deploy: dict, followups: list[dict],
                      *, gas_limit: int = 10_000_000) -> list[dict]:
    """Replay a serialized chain (the golden-fixture shape): deploy
    first, then each follow-up, propagating c4 / set_code / balance.
    Returns one row per follow-up: tx_hash, hop, exit_code, out_msgs
    (sorted "dest:opcode" strings), value_delta_max vs expected_out
    values when the fixture carries them."""
    code, data = _state_init(deploy["init_state_boc"])
    if code is None or data is None or code.exotic or code.bits == 264:
        return []
    dep = dict(deploy)
    dep["dest"] = account
    res, ap, bal, prev_now = _replay_msg_fields(
        code, data, dep, 0, None, gas_limit)
    c4 = res.c4 if res.c4 is not None else data
    if res.success:
        for a in res.actions:
            if a["type"] == "set_code":
                code = a["code"]
    rows = []
    for hop, fu in enumerate(followups):
        if fu.get("descr") not in (None, "ord") or not fu.get("body_boc"):
            continue
        m = dict(fu)
        m["dest"] = account
        res2, ap2, bal, prev_now = _replay_msg_fields(
            code, c4, m, bal, prev_now, gas_limit)
        got = []
        vmax = None
        if ap2 is not None and ap2.success:
            got = sorted((str(o["dest"]), str(o["opcode"]))
                         for o in ap2.out_msgs)
            want_vals = fu.get("expected_out_values") or {}
            deltas = [
                abs(int(o["value"]) - want_vals[k])
                for o in ap2.out_msgs
                if (k := f"{o['dest']}:{o['opcode']}") in want_vals
                and o.get("value") is not None
            ]
            vmax = max(deltas) if deltas else None
        rows.append({
            "tx_hash": fu.get("tx_hash"),
            "hop": hop,
            "exit_code": res2.exit_code,
            "out_msgs": [f"{d}:{o}" for d, o in got],
            "value_delta_max": vmax,
        })
        if res2.c4 is not None:
            c4 = res2.c4
        if res2.success:
            for a in res2.actions:
                if a["type"] == "set_code":
                    code = a["code"]
    return rows
