"""What-if trace emulation seam (SURVEY.md §2.10 C8).

The reference emulates unconfirmed external messages through a real TVM
(`ton-emulate-go/main.go:189-490` driving `ton-index-worker/
ton-trace-emulator`), stores the resulting "pending" trace in Redis with
a TTL, and overlays it over finalized data at query time.  The plumbing
here is the same either way:

    emulate_externals(msgs) → (transactions, messages) DataFrames in the
    engine's fact schemas, trace_id = sha256 of the external msg hash,
    finality = 'pending' → rows flow through the same classifier and
    ``plans/traces.pending_overlay`` as finalized data, and are evicted
    by the assembler's TTL when the real trace finalizes (T6).

Two emulator backends satisfy the seam contract below:

* ``FAKE_EMULATOR`` — the original clearly-marked deterministic
  stand-in (external message → 2-hop message chain), still the default
  where tests only exercise the plumbing;
* ``make_tvm_emulator`` (round 10) — REAL execution: every internal hop
  whose account state resolves runs through the in-engine TVM
  (ton_indexer_spark/tvm, validated against captured mainnet
  transactions), with c4 state propagation across hops within a trace.
  The external root hop and action-phase fee routing remain modeled —
  see its docstring for the precise boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMU_TX_SCHEMA = T.StructType(
    [
        T.StructField("account", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("lt", T.LongType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("now", T.LongType()),
        T.StructField("orig_status", T.StringType()),
        T.StructField("end_status", T.StringType()),
        T.StructField("aborted", T.BooleanType()),
        T.StructField("finality", T.StringType()),
    ]
)

EMU_MSG_SCHEMA = T.StructType(
    [
        T.StructField("tx_hash", T.StringType()),
        T.StructField("tx_lt", T.LongType()),
        T.StructField("tx_now", T.LongType()),
        T.StructField("msg_hash", T.StringType()),
        T.StructField("direction", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("created_lt", T.LongType()),
        T.StructField("opcode", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("finality", T.StringType()),
    ]
)


def _h(*parts: str) -> str:
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


# ------------------------------------------------------------ seam contract
#
# An emulator is any Callable[[dict], list[dict]]: it receives ONE external
# message as a dict with the caller-supplied columns (at minimum
# ``msg_hash`` and ``destination``) and returns the simulated trace as a
# list of ROOT hop nodes, each node shaped:
#
#     {
#       "account":    str   (required) — the account the hop executes on
#       "in_source":  str | None       — sender of the consumed message
#                                        (None for the external root)
#       "opcode":     int | None       — opcode of the consumed message
#       "value":      int | None       — nanoton value carried
#       "body":       str | None       — base64 body (BOC or fixture JSON)
#       "out":        list[dict]       — child hops, same shape, in
#                                        emission order (child index is
#                                        part of the tx-hash derivation)
#     }
#
# Extra keys are ignored; a missing "account" or non-list "out" is a
# contract violation and fails the batch with a clear error rather than
# producing corrupt rows.  tx hashes derive from (trace_id, account,
# child-index path) and lts from walk preorder, so ANY tree shape a real
# TVM emits — including branches touching the same account at the same
# depth — maps to unique (hash, lt) pairs.

_NODE_KEYS = ("account", "in_source", "opcode", "value", "body", "out")


def validate_emulator_node(node: dict, path: str = "0") -> None:
    """Schema-validate one emulator hop node (recursively) — the drop-in
    contract for a real TVM sidecar (ton-emulate-go/main.go:189-490)."""
    if not isinstance(node, dict):
        raise TypeError(f"emulator node at {path} is not a dict: {node!r}")
    acct = node.get("account")
    if not isinstance(acct, str) or not acct:
        raise ValueError(
            f"emulator node at {path} missing required 'account': {node!r}"
        )
    out = node.get("out", [])
    if not isinstance(out, (list, tuple)):
        raise ValueError(
            f"emulator node at {path} has non-list 'out': {type(out).__name__}"
        )
    for k in ("opcode", "value"):
        v = node.get(k)
        if v is not None and not isinstance(v, int):
            raise ValueError(
                f"emulator node at {path} field {k!r} must be int|None, "
                f"got {type(v).__name__}"
            )
    for j, child in enumerate(out):
        validate_emulator_node(child, f"{path}.{j}")


def _fake_emulate(ext: dict) -> list[dict]:
    """FAKE TVM: the destination wallet accepts the external and forwards
    one internal message carrying the value/opcode/body.  A real emulator
    returns the full simulated hop list; the dict shape is the contract:
    {account, in_source, opcode, value, body, out: [same...]}."""
    op = ext.get("opcode")
    # the one protocol rule the fake knows: a jetton wallet forwards a
    # transfer request (0x0f8a7ea5) as internal_transfer (0x178d4519)
    fwd_op = 0x178D4519 if op == 0x0F8A7EA5 else op
    hop2 = {
        "account": ext.get("forward_to") or ext["destination"],
        "in_source": ext["destination"],
        "opcode": fwd_op,
        "value": ext.get("value"),
        "body": None if fwd_op != op else ext.get("body"),
        "out": [],
    }
    hop1 = {
        "account": ext["destination"],
        "in_source": None,
        "opcode": ext.get("opcode"),
        "value": ext.get("value"),
        "body": ext.get("body"),
        "out": [hop2],
    }
    return [hop1]


def emulate_externals(
    externals: DataFrame,
    base_lt: int = 1 << 40,
    now: int = 0,
    emulator: Callable[[dict], list[dict]] = _fake_emulate,
) -> tuple[DataFrame, DataFrame]:
    """External messages → ('pending' transactions, messages) DataFrames.

    ``externals`` columns: msg_hash, destination, opcode (nullable),
    value (nullable), body (nullable), forward_to (nullable).  Runs the
    emulator per message inside ``mapInPandas`` (constant memory, no
    driver loop); trace_id derives from the external msg hash so
    re-emulation is idempotent and finalization can evict by trace_id.
    """
    spark = externals.sparkSession
    out_schema = T.StructType(
        [
            T.StructField("kind", T.StringType()),
            *[
                T.StructField(f.name, f.dataType)
                for f in EMU_TX_SCHEMA
            ],
            *[
                T.StructField(f"m_{f.name}", f.dataType)
                for f in EMU_MSG_SCHEMA
            ],
        ]
    )

    cols = externals.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.to_dict("records"):
                ext = {k: rec.get(k) for k in cols}
                trace_id = _h("pending", ext["msg_hash"])
                # per-trace visit counter: lt is a strictly increasing
                # sequence in walk (pre-)order, so sibling branches never
                # share lt values
                seq = iter(range(1 << 30))

                def walk(node: dict, path: str, in_hash: str) -> None:
                    # hash over the full child-index PATH, not the depth:
                    # a branching trace touching the same account twice at
                    # equal depth must not collide
                    tx_hash = _h(trace_id, node["account"], path)
                    lt = base_lt + next(seq) * 2
                    rows.append(
                        {
                            "kind": "tx",
                            "account": node["account"],
                            "hash": tx_hash,
                            "lt": lt,
                            "trace_id": trace_id,
                            "now": now,
                            "orig_status": "active",
                            "end_status": "active",
                            "aborted": False,
                            "finality": "pending",
                        }
                    )
                    rows.append(
                        {
                            "kind": "msg",
                            "m_tx_hash": tx_hash,
                            "m_tx_lt": lt,
                            "m_tx_now": now,
                            "m_msg_hash": in_hash,
                            "m_direction": "in",
                            "m_trace_id": trace_id,
                            "m_source": node["in_source"],
                            "m_destination": node["account"],
                            "m_value": node.get("value"),
                            "m_created_lt": lt - 1,
                            "m_opcode": node.get("opcode"),
                            "m_body": node.get("body"),
                            "m_finality": "pending",
                        }
                    )
                    for j, child in enumerate(node.get("out", ())):
                        out_hash = _h(tx_hash, "out", str(j))
                        rows.append(
                            {
                                "kind": "msg",
                                "m_tx_hash": tx_hash,
                                "m_tx_lt": lt,
                                "m_tx_now": now,
                                "m_msg_hash": out_hash,
                                "m_direction": "out",
                                "m_trace_id": trace_id,
                                "m_source": node["account"],
                                "m_destination": child["account"],
                                "m_value": child.get("value"),
                                "m_created_lt": lt + 1,
                                "m_opcode": child.get("opcode"),
                                "m_body": child.get("body"),
                                "m_finality": "pending",
                            }
                        )
                        walk(child, f"{path}.{j}", out_hash)

                roots = emulator(ext)
                if not isinstance(roots, (list, tuple)):
                    raise TypeError(
                        "emulator must return a list of root hop nodes, "
                        f"got {type(roots).__name__}"
                    )
                for i, root in enumerate(roots):
                    validate_emulator_node(root, str(i))
                    walk(root, str(i), ext["msg_hash"])
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    flat = externals.mapInPandas(run, schema=out_schema)
    flat = flat.localCheckpoint(eager=False)
    txs = flat.filter(F.col("kind") == "tx").select(
        *[f.name for f in EMU_TX_SCHEMA]
    )
    msgs = flat.filter(F.col("kind") == "msg").select(
        *[F.col(f"m_{f.name}").alias(f.name) for f in EMU_MSG_SCHEMA]
    )
    return txs, msgs


# ------------------------------------------------- real in-engine emulator


def make_tvm_emulator(
    resolve_state: Callable[[str], dict | None],
    *,
    unixtime: int = 1_700_000_000,
    gas_limit: int = 10_000_000,
    max_hops: int = 64,
    wallet_hop: bool | str = "auto",
) -> Callable[[dict], list[dict]]:
    """A REAL emulator backend over the in-engine TVM (round 10).

    ``resolve_state(account)`` returns ``{"code_boc", "data_boc"}``
    (base64 BOCs, e.g. a ``latest_account_states`` point lookup) or
    None.  Every INTERNAL hop whose account state resolves is executed
    for real: ``tvm.run_compute_phase`` runs the contract's
    recv_internal on an assembled inbound message, and the c5 action
    list becomes the child hops — the compute-phase replay validated
    this path against 131 captured mainnet transactions (97% exit /
    89% out-message agreement after the post-review fixes of commit
    d0820a7, tests/test_tvm.py).  Contract data (c4)
    updates propagate within the trace, so a second hop on the same
    account sees the first hop's state.

    The external ROOT hop (round 11): with the in-engine RFC 8032
    verifier behind CHKSIGNU, an ALREADY-SIGNED external executes
    recv_external for REAL — ``wallet_hop="auto"`` (the default) first
    tries real root execution and uses its c5 actions as the children;
    only when that fails (the usual pre-signing what-if, where the
    signature does not exist yet) does it fall back to the modeled
    accept+forward convention.  ``wallet_hop=True`` forces the modeled
    hop; ``wallet_hop=False`` treats the external's payload as the
    internal message to execute directly.  Real signed-external replay
    is validated against the chain's captured wallet deployments
    (tests/test_tvm.py::test_signed_external_replay).

    What stays modeled, and why, is explicit:

    * child-message values run through the calibrated action phase
      (round 11, tvm/phases.py): +64/+128 carry arithmetic, RAWRESERVE
      and forward-fee deduction with the published formulas, validated
      against captured chain values (fwd_fee exact 105/116, explicit
      sends 100%).  Residual value drift is the declared gas-schedule
      approximation (<0.022 TON on the measured population) — exit
      codes, opcodes, accounts and bodies, which classification keys
      on, are exact; set_code actions now propagate within the trace.
    * a failed BOUNCEABLE hop emits the block.tlb bounce
      (0xFFFFFFFF ++ first 256 body bits back to the sender) and the
      parent's bounce handler executes — what finalization will show
      (round 11); a hop whose account does not resolve (or a failed
      non-bounceable one) becomes a LEAF — the trace truncates visibly
      instead of fabricating downstream behavior.
    """
    import base64 as _b64

    from ton_indexer_spark.functions.boc import (
        Cell,
        cell_to_b64_boc,
        parse_boc,
    )
    from ton_indexer_spark.tvm.phases import (
        apply_action_phase,
        build_bounce,
        gas_fee,
    )
    from ton_indexer_spark.tvm.run import (
        build_external_message,
        build_internal_message,
        run_compute_phase,
        run_compute_phase_external,
    )

    def emulator(ext: dict) -> list[dict]:
        budget = [max_hops]
        data_overrides: dict[str, object] = {}
        # set_code propagation within the trace: lazy-deployment
        # contracts install their REAL code from the first message's
        # handler; a second hop on the same account must run the
        # installed code, not the bootstrap (the round-11 chained-replay
        # finding, tvm/chain_replay.py)
        code_overrides: dict[str, object] = {}

        def exec_internal(account, in_source, opcode, value, body_b64,
                          bounce=True, bounced=False) -> dict:
            node = {
                "account": account,
                "in_source": in_source,
                "opcode": opcode,
                "value": value,
                "body": body_b64,
                "out": [],
            }
            if budget[0] <= 0:
                return node
            st = resolve_state(account)
            if not st or not st.get("code_boc"):
                return node
            budget[0] -= 1
            try:
                body = parse_boc(body_b64) if body_b64 else Cell()
                code = code_overrides.get(account)
                if code is None:
                    code = parse_boc(st["code_boc"])
                data = data_overrides.get(account)
                if data is None and st.get("data_boc"):
                    data = parse_boc(st["data_boc"])
                msg = build_internal_message(
                    src=in_source, dest=account,
                    value=int(value or 0), body=body,
                    bounce=bool(bounce), bounced=bool(bounced))
                balance = int(value or 0) + int(st.get("balance") or 0)
                res = run_compute_phase(
                    code, data, my_address=account, in_msg=msg,
                    body=body, msg_value=int(value or 0),
                    balance=balance, unixtime=unixtime,
                    gas_limit=gas_limit)
            except Exception:
                return node  # leaf: truncate visibly, never fabricate
            if not res.success:
                # bounce phase (round 11): a failed bounceable hop sends
                # the 0xFFFFFFFF bounce back, and the PARENT's bounce
                # handler runs — what finalization will show, instead of
                # a silent truncation
                if bounce and not bounced and in_source is not None:
                    bo = build_bounce(
                        src=in_source, dest=account,
                        msg_value=int(value or 0),
                        gas_fee_paid=gas_fee(res.gas_used), body=body)
                    if bo is not None:
                        node["out"].append(exec_internal(
                            in_source, account, -1, bo["value"],
                            cell_to_b64_boc(bo["body"]),
                            bounce=False, bounced=True))
                return node
            if res.c4 is not None:
                data_overrides[account] = res.c4
            for a in res.actions:
                if a.get("type") == "set_code":
                    code_overrides[account] = a["code"]
            # child values via the calibrated action phase
            # (tvm/phases.py): mode +64/+128 carry arithmetic and
            # forward-fee deduction validated against captured chain
            # values instead of the r10 approximation
            gf = gas_fee(res.gas_used)
            ap = apply_action_phase(
                res.actions, balance=max(0, balance - gf),
                msg_balance_remaining=max(
                    0, min(int(value or 0) - gf, balance - gf)),
                original_balance=int(st.get("balance") or 0))
            sends = (ap.out_msgs if ap.success else
                     [a for a in res.actions
                      if a.get("type") == "send_msg"
                      and a.get("dest") is not None])
            for a in sends:
                child_op = a.get("opcode")
                if child_op is not None and child_op >= (1 << 31):
                    child_op -= 1 << 32
                child_body = a.get("body")
                node["out"].append(exec_internal(
                    a["dest"], account, child_op, a.get("value"),
                    cell_to_b64_boc(child_body)
                    if child_body is not None else None,
                    bounce=a.get("bounce", True),
                    bounced=bool(a.get("bounced"))))
            return node

        def exec_external_real(account, body_b64) -> dict | None:
            """Execute recv_external on the account's real state: the
            REAL root hop for an already-signed external.  Returns the
            node on acceptance (exit 0/1), None when the contract
            rejects (unsigned what-if, seqno/sig mismatch) so the
            caller can fall back to the modeled hop."""
            st = resolve_state(account)
            if not st or not st.get("code_boc") or budget[0] <= 0:
                return None
            try:
                body = parse_boc(body_b64) if body_b64 else Cell()
                code = parse_boc(st["code_boc"])
                data = (parse_boc(st["data_boc"])
                        if st.get("data_boc") else None)
                msg = build_external_message(dest=account, body=body)
                res = run_compute_phase_external(
                    code, data, my_address=account, in_msg=msg,
                    body=body, balance=int(st.get("balance") or 0),
                    unixtime=unixtime, gas_limit=gas_limit)
            except Exception:
                return None
            if not res.success:
                return None
            budget[0] -= 1
            if res.c4 is not None:
                data_overrides[account] = res.c4
            for a in res.actions:
                if a.get("type") == "set_code":
                    code_overrides[account] = a["code"]
            node = {
                "account": account,
                "in_source": None,
                "opcode": ext.get("opcode"),
                "value": ext.get("value"),
                "body": body_b64,
                "out": [],
            }
            # same calibrated action phase as the internal hops: an
            # external carries no value, so the +64 carry source is 0
            # and +128 resolves against the account balance.  A state
            # with no balance column is treated as funded (1 TON) — the
            # what-if convention; a literal 0 would silently skip every
            # fee-paying send
            st_bal = int(st.get("balance") or 10**9)
            gf = gas_fee(res.gas_used)
            ap = apply_action_phase(
                res.actions, balance=max(0, st_bal - gf),
                msg_balance_remaining=0, original_balance=st_bal)
            sends = (ap.out_msgs if ap.success else
                     [a for a in res.actions
                      if a.get("type") == "send_msg"
                      and a.get("dest") is not None])
            for a in sends:
                child_op = a.get("opcode")
                if child_op is not None and child_op >= (1 << 31):
                    child_op -= 1 << 32
                child_body = a.get("body")
                node["out"].append(exec_internal(
                    a["dest"], account, child_op, a.get("value"),
                    cell_to_b64_boc(child_body)
                    if child_body is not None else None,
                    bounce=a.get("bounce", True),
                    bounced=bool(a.get("bounced"))))
            return node

        dest = ext["destination"]
        if wallet_hop == "auto":
            real = exec_external_real(dest, ext.get("body"))
            if real is not None:
                return [real]
            # fall through to the modeled accept+forward convention
        elif not wallet_hop:
            return [exec_internal(dest, None, ext.get("opcode"),
                                  ext.get("value"), ext.get("body"))]
        fwd_to = ext.get("forward_to") or dest
        child = exec_internal(fwd_to, dest, ext.get("opcode"),
                              ext.get("value"), ext.get("body"))
        root = {
            "account": dest,
            "in_source": None,
            "opcode": ext.get("opcode"),
            "value": ext.get("value"),
            "body": ext.get("body"),
            "out": [child],
        }
        return [root]

    return emulator
