"""TVM get-method / fee-estimate surface — /runGetMethod, /estimateFee.

The reference serves both by PROXYING to an external executor: a
ton-http-api v2 node runs the TVM (`ton-index-go/index/proxy.go:257-360
PostRunGetMethod` / `:363-420 estimateFee`; routed at
`main.go:2377-2378`).  As of round 10 this engine runs get-methods
IN-ENGINE: :func:`tvm_executor` executes the account's actual code cell
on the clean-room interpreter (ton_indexer_spark/tvm, codepage-0
get-method subset, validated against real mainnet contracts from the
reference's golden traces).  The layered executor order is:

1. ``builtin_executor`` data-cell fast paths for the canonical token /
   wallet layouts (no code cell needed, no VM cost);
2. ``tvm_executor`` for any other method when ``code_boc`` is present;
3. exit 11 ("unknown method") when neither can serve, matching what a
   real executor returns for an absent method.

What was already in scope, and stays, is everything around execution:

* state resolution — the target account's latest code hash + data cell
  come off the ``latest_account_states`` dimension (one partition-pruned
  point lookup, the same table the wallet endpoints read);
* the executor CONTRACT — any ``Callable[[dict, str, list], dict]``
  taking (account state row, method name, stack) and returning
  ``{"gas_used": int, "exit_code": int, "stack": [[type, value], ...]}``
  (the v2 wire shape the reference decodes, proxy.go:319-350); results
  are schema-enforced so a mis-behaving executor fails loudly at the
  seam, not downstream;
* a BUILTIN pure-python executor for the standard wallet get-methods
  (``seqno``, ``get_subwallet_id``) — these decode directly off the data
  cell via the published wallet layouts (functions/wallets.py), so the
  most-polled get-methods work with no external TVM at all.  Anything
  else returns TVM exit code 11 ("unknown method") unless a real
  executor is plugged in.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import functions as F

GetMethodExecutor = Callable[[dict, str, list], dict]

_RESULT_KEYS = {"gas_used", "exit_code", "stack"}
_STACK_TYPES = {"num", "cell", "slice", "list", "tuple", "null"}


class GetMethodContractError(ValueError):
    """The plugged executor violated the result contract."""


def _validate_result(res: dict) -> dict:
    if not isinstance(res, dict) or set(res) - _RESULT_KEYS:
        raise GetMethodContractError(
            f"executor result keys must be {_RESULT_KEYS}, got {res!r}"
        )
    if not isinstance(res.get("gas_used"), int):
        raise GetMethodContractError("gas_used must be an int")
    if not isinstance(res.get("exit_code"), int):
        raise GetMethodContractError("exit_code must be an int")
    stack = res.get("stack")
    if not isinstance(stack, list) or any(
        not (isinstance(e, (list, tuple)) and len(e) == 2
             and e[0] in _STACK_TYPES)
        for e in stack
    ):
        raise GetMethodContractError(
            "stack must be [[type, value], ...] with v2 stack types"
        )
    return {"gas_used": res["gas_used"], "exit_code": res["exit_code"],
            "stack": [list(e) for e in stack]}


def _addr_slice(addr: str | None) -> list:
    """MsgAddress → v2 "slice" stack entry (base64 single-cell BOC)."""
    import base64

    from ton_indexer_spark.functions.boc import Builder, serialize_boc

    cell = Builder().store_address(addr).end_cell()
    return ["slice", base64.b64encode(serialize_boc(cell)).decode("ascii")]


def builtin_executor(state: dict, method: str, stack: list) -> dict:
    """Token-standard get-methods straight off the data cell — no TVM.

    Covers ``seqno`` / ``get_subwallet_id`` for the published wallet
    code hashes (wallet_parse.go layouts), plus ``get_wallet_data``
    (TEP-74 jetton wallet) and ``get_nft_data`` (TEP-62 item) via the
    same canonical data-cell decoders the ingest dimension builders use
    — exactly the methods the reference worker runs in a TVM to build
    its dimensions (smc-interfaces/Tokens.cpp).  Code CELLS are not in
    the state snapshot (only code_hash), so the trailing code-cell stack
    entry comes back as ["null", None]; a deployment wanting the cell
    resolves it from a code store or plugs in the real TVM.  Exit code
    11 = TVM "unknown method" for everything else, matching what a real
    executor returns when the contract lacks the method; a malformed or
    non-canonical data cell for a KNOWN method returns exit 9 (cell
    underflow) instead — the method exists and fails, it is not
    absent."""
    from ton_indexer_spark.functions.wallets import decode_wallet_data

    if method in ("seqno", "get_subwallet_id"):
        try:
            w = decode_wallet_data(
                state.get("data_boc"), state.get("code_hash")
            )
        except Exception:
            w = {"is_wallet": False}
        if w.get("is_wallet"):
            value = (
                w.get("seqno") if method == "seqno" else w.get("wallet_id")
            )
            if value is not None:
                return {
                    "gas_used": 0,
                    "exit_code": 0,
                    "stack": [["num", hex(value)]],
                }
    if method == "get_wallet_data":
        from ton_indexer_spark.functions.boc import (
            decode_jetton_wallet_data,
        )

        try:
            d = decode_jetton_wallet_data(state.get("data_boc"))
        except Exception:
            # the method EXISTS for this code_hash but its data cell is
            # malformed/non-canonical — a real TVM would run it and fail,
            # not report 'method absent'.  Exit 9 = cell underflow, the
            # code a data-cell short-read raises in the VM, so callers
            # can distinguish 'failed' from 'unknown method' (11).
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        # TEP-74: (balance, owner, jetton, jetton_wallet_code)
        return {
            "gas_used": 0,
            "exit_code": 0,
            "stack": [
                ["num", hex(d["balance"])],
                _addr_slice(d["owner"]),
                _addr_slice(d["jetton"]),
                ["null", None],
            ],
        }
    if method == "get_nft_data":
        from ton_indexer_spark.functions.boc import decode_nft_item_data

        try:
            d = decode_nft_item_data(state.get("data_boc"))
        except Exception:
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        # TEP-62: (init, index, collection, owner, individual_content)
        return {
            "gas_used": 0,
            "exit_code": 0,
            "stack": [
                ["num", "-0x1" if d["init"] else "0x0"],
                ["num", hex(d["index"])],
                _addr_slice(d["collection_address"]),
                _addr_slice(d["owner_address"]),
                ["null", None],
            ],
        }
    if method == "get_collection_data":
        from ton_indexer_spark.functions.boc import (
            decode_nft_collection_data,
        )

        try:
            d = decode_nft_collection_data(state.get("data_boc"))
        except Exception:
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        # Tokens.cpp:497-509 <3>: (next_item_index, collection_content
        # cell, owner slice) — the content comes back as the raw cell,
        # exactly what the reference's stack slot 1 carries
        cc = d.get("collection_content_boc")
        return {
            "gas_used": 0,
            "exit_code": 0,
            "stack": [
                ["num", hex(d["next_item_index"])],
                ["cell", cc] if cc is not None else ["null", None],
                _addr_slice(d["owner_address"]),
            ],
        }
    if method == "royalty_params":
        from ton_indexer_spark.functions.boc import (
            decode_nft_collection_data,
        )

        try:
            d = decode_nft_collection_data(state.get("data_boc"))
        except Exception:
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        if d.get("royalty_numerator") is None:
            # collection stores no TEP-66 royalty cell — the method would
            # fail in a real TVM, not be absent
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        # Telemint.cpp:129-133 <3>: (numerator, denominator, destination)
        return {
            "gas_used": 0,
            "exit_code": 0,
            "stack": [
                ["num", hex(d["royalty_numerator"])],
                ["num", hex(d["royalty_denominator"])],
                _addr_slice(d["royalty_destination"]),
            ],
        }
    if method == "get_sale_data":
        from ton_indexer_spark.functions.boc import (
            SALE_LATEST,
            SALE_VERSION_MAPPING,
            decode_nft_sale_data,
        )

        version = SALE_VERSION_MAPPING.get(
            state.get("code_hash") or "", SALE_LATEST
        )
        try:
            d = decode_nft_sale_data(state.get("data_boc"), version)
        except Exception:
            return {"gas_used": 0, "exit_code": 9, "stack": []}
        # NftSale.cpp:22-26 <11>: FIXP magic, is_complete, created_at,
        # marketplace, nft, owner, full_price, fee_addr, fee,
        # royalty_addr, royalty.  (Auction code hashes keep exit 11 —
        # their dimension rows come off the state scan,
        # sources/tx_ingest.py::nft_auctions_from_states.)
        def num(v):
            return ["num", hex(v)] if v is not None else ["null", None]

        return {
            "gas_used": 0,
            "exit_code": 0,
            "stack": [
                ["num", hex(0x46495850)],
                ["num", "-0x1" if d.get("is_complete") else "0x0"],
                num(d.get("created_at") or 0),
                _addr_slice(d.get("marketplace_address")),
                _addr_slice(d.get("nft_address")),
                _addr_slice(d.get("nft_owner_address")),
                num(d.get("full_price")),
                _addr_slice(d.get("marketplace_fee_address")),
                num(d.get("marketplace_fee")),
                _addr_slice(d.get("royalty_address")),
                num(d.get("royalty_amount")),
            ],
        }
    return {"gas_used": 0, "exit_code": 11, "stack": []}


def tvm_executor(state: dict, method: str, stack: list) -> dict:
    """Execute the get-method on the in-engine TVM interpreter.

    Runs the account's REAL code cell (``code_boc``) against its data
    cell — the same execution the reference performs through the C++
    TVM (tondb-scanner/src/execute-smc.cpp).  Incoming v2-shaped stack
    entries are converted to VM values; results come back in the v2
    wire shape.  Raises ``GetMethodContractError`` upward only for seam
    misuse; contract-level failures surface as nonzero exit codes,
    exactly like the proxied executor's responses."""
    import base64 as _b64
    import binascii

    from ton_indexer_spark.functions.boc import parse_boc
    from ton_indexer_spark.tvm import run_get_method as _tvm_run
    from ton_indexer_spark.tvm import to_v2_stack

    code_boc = state.get("code_boc")
    if not code_boc:
        return {"gas_used": 0, "exit_code": 11, "stack": []}
    args = []
    for entry in stack or []:
        typ, val = entry
        if typ == "num":
            args.append(int(val, 0) if isinstance(val, str) else int(val))
        elif typ == "null":
            args.append(None)
        elif typ in ("cell", "slice"):
            cell = parse_boc(_b64.b64decode(val))
            args.append(cell if typ == "cell" else cell.begin_parse())
        else:
            raise GetMethodContractError(f"unsupported stack arg {typ}")
    from ton_indexer_spark.functions.boc import BocError
    from ton_indexer_spark.tvm.engine import VmError
    from ton_indexer_spark.tvm.hashmap import DictError

    try:
        res = _tvm_run(
            code_boc,
            state.get("data_boc"),
            method,
            args,
            my_address=state.get("account"),
            balance=int(state.get("balance") or 0),
        )
    except (BocError, VmError, DictError, ValueError, binascii.Error):
        # undecodable code/data cell — the executor cannot even start;
        # matches the proxy surfacing an executor-side failure.  Only
        # the EXPECTED decode/VM error types map to exit 9; anything
        # else (RecursionError, OverflowError, ...) is an interpreter
        # defect and is surfaced distinctly instead of being laundered
        # as the contract's own failure.
        return {"gas_used": 0, "exit_code": 9, "stack": []}
    except Exception as exc:  # noqa: BLE001 — deliberate diagnostic surface
        return {
            "gas_used": 0,
            "exit_code": 9,
            "stack": [],
            "exec_error": f"{type(exc).__name__}: {exc}",
        }
    return {
        "gas_used": res.gas_used,
        "exit_code": res.exit_code,
        "stack": to_v2_stack(res.stack) if res.success else [],
    }


def layered_executor(state: dict, method: str, stack: list) -> dict:
    """Default executor: builtin data-cell fast paths, then the real
    in-engine TVM.  A clean builtin success (exit 0) is returned as-is
    (no VM cost); anything else — unknown method (11) or the layout
    heuristics' failure guesses (9) — defers to actually EXECUTING the
    account's code when the state carries it, so the reported exit code
    is the contract's own, not an inference."""
    res = builtin_executor(state, method, stack)
    if res["exit_code"] != 0 and state.get("code_boc"):
        return tvm_executor(state, method, stack)
    return res


def run_get_method(
    cat,
    address: str,
    method: str,
    stack: list | None = None,
    executor: GetMethodExecutor | None = None,
) -> dict:
    """/api/v3/runGetMethod: resolve the account's latest state and run
    the get-method through the (pluggable) executor.

    Raises ``KeyError`` for an unknown account (the reference's v2 proxy
    errors the same way) and ``GetMethodContractError`` when the
    executor's response doesn't match the v2 result shape."""
    rows = (
        cat.latest_account_states
        .filter(F.col("account") == address)
        .limit(1)
        .collect()
    )
    if not rows:
        raise KeyError(f"unknown account {address}")
    state = rows[0].asDict()
    res = (executor or layered_executor)(state, method, stack or [])
    return _validate_result(res)


# deterministic fee model for the estimate seam: the real executor prices
# gas/fwd fees through config params the TVM holds; this stand-in is
# proportional to body size so the PLUMBING (state lookup, response
# shape, api surface) is testable without one (proxy.go:363-420 shape)
_FEE_PER_BYTE = 1000
_FEE_BASE = 10_000_000


def tvm_fee_estimator(state: dict, body_b64: str,
                      *, ignore_chksig: bool = True,
                      now: int | None = None) -> dict:
    """REAL fee estimate: execute recv_external on the account's actual
    code (in-engine TVM) and price every component with the published
    formulas (tvm/phases.py) — the same accounting the reference's
    emulator performs (ton-index-go main.go:363-420 estimateFee through
    the real emulator):

    * in_fwd_fee — forward/import fee of the inbound external message;
    * gas_fee    — from the gas the contract ACTUALLY consumes;
    * fwd_fee    — sum of forward fees of the c5 out-messages;
    * storage_fee — accrued since the state's own timestamp when the
      row carries one (else 0).

    ``ignore_chksig`` mirrors the v2 flag: the what-if body is usually
    not signed yet, so CHKSIGN is stubbed to accept; pass False to
    verify a real signature.  Raises GetMethodContractError when the
    state has no code (the caller falls back to the size heuristic).
    """
    import base64 as _b64

    from ton_indexer_spark.functions.boc import Cell, parse_boc
    from ton_indexer_spark.tvm.phases import (
        fwd_fee_total,
        gas_fee,
        storage_fee,
    )
    from ton_indexer_spark.tvm.run import (
        build_external_message,
        run_compute_phase_external,
    )

    code_boc = state.get("code_boc")
    if not code_boc:
        raise GetMethodContractError("no code for fee estimation")
    code = parse_boc(code_boc)
    data = parse_boc(state["data_boc"]) if state.get("data_boc") else None
    body = parse_boc(_b64.b64decode(body_b64)) if body_b64 else Cell()
    msg = build_external_message(dest=state.get("account"), body=body)
    if now is None:
        # wall-clock of the what-if: wallet validity windows reject a
        # stale NOW, so prefer the state's own capture time
        now = int(state.get("now") or state.get("timestamp")
                  or 1_700_000_000)
    res = run_compute_phase_external(
        code, data, my_address=state.get("account"), in_msg=msg,
        body=body, balance=int(state.get("balance") or 10**9),
        unixtime=now,
        sig_verifier=(lambda *_a: True) if ignore_chksig else None)
    out_fwd = 0
    for a in res.actions:
        if a.get("type") == "send_msg" and a.get("message") is not None \
                and not a.get("external"):
            out_fwd += fwd_fee_total(a["message"])
    dt = 0
    ts = state.get("timestamp")
    if isinstance(ts, int) and ts > 0:
        dt = max(0, now - ts)
    return {
        "in_fwd_fee": fwd_fee_total(msg),
        "storage_fee": storage_fee(code, data, dt),
        "gas_fee": gas_fee(res.gas_used),
        "fwd_fee": out_fwd,
    }


def estimate_fee(
    cat,
    address: str,
    body_b64: str,
    executor: Callable[[dict, str], dict] | None = None,
) -> dict:
    """/api/v3/estimateFee: fee quadruple for sending `body` to the
    account (v2 shape: in_fwd_fee / storage_fee / gas_fee / fwd_fee).

    Layered like runGetMethod: when the state carries code, the
    quadruple comes from ACTUALLY EXECUTING the message on the
    in-engine TVM with the published fee formulas
    (:func:`tvm_fee_estimator`); the size heuristic remains only as
    the no-code fallback."""
    rows = (
        cat.latest_account_states
        .filter(F.col("account") == address)
        .limit(1)
        .collect()
    )
    if not rows:
        raise KeyError(f"unknown account {address}")
    if executor is not None:
        res = executor(rows[0].asDict(), body_b64)
    else:
        try:
            res = tvm_fee_estimator(rows[0].asDict(), body_b64)
        except Exception:
            size = len(body_b64 or "")
            res = {
                "in_fwd_fee": _FEE_BASE + size * _FEE_PER_BYTE,
                "storage_fee": 0,
                "gas_fee": _FEE_BASE,
                "fwd_fee": size * _FEE_PER_BYTE,
            }
    missing = {"in_fwd_fee", "storage_fee", "gas_fee", "fwd_fee"} - set(res)
    if missing or any(not isinstance(v, int) for v in res.values()):
        raise GetMethodContractError(f"bad fee estimate shape: {res!r}")
    return res
