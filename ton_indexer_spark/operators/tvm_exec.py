"""Distributed get-method execution over account states (C8 at scale).

The reference bootstraps token/NFT dimensions by running get-methods
against every matching account state through the C++ TVM
(tondb-scanner/src/smc-interfaces/Tokens.cpp — one execution per
account, inside the scanner's worker pool).  The Spark-first equivalent
is a NARROW map over the ``latest_account_states`` table: no shuffle, no
driver involvement, Arrow-batched rows into the in-engine interpreter
(ton_indexer_spark/tvm), per-execution cost bounded by the gas limit so
one pathological contract cannot stall an executor, and per-row failures
quarantined as typed ``exec_error`` values instead of failing the stage
— the same contract as the media codecs' decode path.

At 100 TB scale: account states partition by account hash; this operator
preserves the input partitioning (mapInPandas), reads only the four
columns it needs (column-pruned scan), and its cost is
sum(gas)/executor — embarrassingly parallel.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "account string, method string, exit_code int, gas_used long, "
    "stack_json string, exec_error string"
)

_IN_COLS = ("account", "code_boc", "data_boc", "balance")


def run_get_method_batch(
    states: DataFrame,
    method: str,
    args: list | None = None,
    *,
    gas_limit: int = 1_000_000,
) -> DataFrame:
    """Run one get-method across every row of a states DataFrame.

    ``states`` needs columns account, code_boc, data_boc (base64 BOC)
    and optionally balance.  Returns one row per input row with the
    v2-shaped result stack as JSON — callers decode typed fields with
    the tvm.run stack converters or plain ``get_json_object``.
    """
    import pandas as pd

    cols = [c for c in _IN_COLS if c in states.columns]
    pruned = states.select(*cols)
    frozen_args = list(args or [])

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ton_indexer_spark.tvm import run_get_method, to_v2_stack

        for pdf in batches:
            out = {k: [] for k in ("account", "method", "exit_code",
                                   "gas_used", "stack_json",
                                   "exec_error")}
            for row in pdf.itertuples(index=False):
                acct = getattr(row, "account", None)
                out["account"].append(acct)
                out["method"].append(method)
                try:
                    res = run_get_method(
                        getattr(row, "code_boc"),
                        getattr(row, "data_boc", None),
                        method,
                        frozen_args,
                        my_address=acct,
                        balance=int(getattr(row, "balance", 0) or 0),
                        gas_limit=gas_limit,
                    )
                    out["exit_code"].append(res.exit_code)
                    out["gas_used"].append(res.gas_used)
                    out["stack_json"].append(
                        json.dumps(to_v2_stack(res.stack))
                        if res.success else None)
                    out["exec_error"].append(None)
                except Exception as e:  # quarantine, never fail the stage
                    out["exit_code"].append(None)
                    out["gas_used"].append(None)
                    out["stack_json"].append(None)
                    out["exec_error"].append(
                        f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    return pruned.mapInPandas(_run, schema=_OUT_SCHEMA)


_REPLAY_SCHEMA = (
    "account string, tx_hash string, exit_code int, gas_used long, "
    "n_actions int, out_msgs string, exec_error string"
)


def replay_compute_batch(txs: DataFrame, *, gas_limit: int = 10_000_000
                         ) -> DataFrame:
    """Replay ordinary-transaction compute phases across a DataFrame.

    Input columns: account, tx_hash, init_state_boc (deployment
    StateInit), body_boc, src, value, bounce, fwd_fee, created_lt,
    created_at, now, lt.  Output: the contract's exit code + the
    decoded c5 send_msg actions as a deterministic "dest#opcode"
    comma-joined string (sorted), for direct comparison against the
    captured chain outcome.  Same narrow-map / typed-quarantine shape
    as run_get_method_batch — the reference analog is the trace
    emulator's per-tx TVM invocation
    (ton-index-worker/ton-trace-emulator)."""
    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ton_indexer_spark.functions.boc import parse_boc
        from ton_indexer_spark.tvm.run import (
            build_internal_message,
            run_compute_phase,
        )

        def state_init_cells(b64):
            s = parse_boc(b64).begin_parse()
            if s.load_bit():
                s.load_uint(5)
            if s.load_bit():
                s.load_uint(2)
            return s.load_maybe_ref(), s.load_maybe_ref()

        for pdf in batches:
            out = {k: [] for k in ("account", "tx_hash", "exit_code",
                                   "gas_used", "n_actions", "out_msgs",
                                   "exec_error")}
            for rec in pdf.to_dict("records"):
                out["account"].append(rec.get("account"))
                out["tx_hash"].append(rec.get("tx_hash"))
                try:
                    code, data = state_init_cells(rec["init_state_boc"])
                    body = parse_boc(rec["body_boc"])
                    value = int(rec.get("value") or 0)
                    msg = build_internal_message(
                        src=rec.get("src"), dest=rec.get("account"),
                        value=value, body=body,
                        init=parse_boc(rec["init_state_boc"]),
                        bounce=bool(rec.get("bounce")),
                        fwd_fee=int(rec.get("fwd_fee") or 0),
                        created_lt=int(rec.get("created_lt") or 0),
                        created_at=int(rec.get("created_at") or 0))
                    res = run_compute_phase(
                        code, data, my_address=rec.get("account"),
                        in_msg=msg, body=body, msg_value=value,
                        balance=value, unixtime=int(rec.get("now") or 0),
                        block_lt=int(rec.get("lt") or 0),
                        gas_limit=gas_limit)
                    sends = []
                    for a in res.actions:
                        if a["type"] != "send_msg":
                            continue
                        op = a.get("opcode")
                        if op is not None and op >= (1 << 31):
                            op -= 1 << 32
                        sends.append(f"{a.get('dest')}#{op}")
                    out["exit_code"].append(res.exit_code)
                    out["gas_used"].append(res.gas_used)
                    out["n_actions"].append(len(res.actions))
                    out["out_msgs"].append(",".join(sorted(sends)))
                    out["exec_error"].append(None)
                except Exception as e:  # quarantine, never fail the stage
                    out["exit_code"].append(None)
                    out["gas_used"].append(None)
                    out["n_actions"].append(None)
                    out["out_msgs"].append(None)
                    out["exec_error"].append(
                        f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    cols = [c for c in ("account", "tx_hash", "init_state_boc",
                        "body_boc", "src", "value", "bounce", "fwd_fee",
                        "created_lt", "created_at", "now", "lt")
            if c in txs.columns]
    return txs.select(*cols).mapInPandas(_run, schema=_REPLAY_SCHEMA)


_CHAIN_SCHEMA = (
    "account string, tx_hash string, hop int, exit_code int, "
    "out_msgs string, value_delta_max long, exec_error string"
)


def replay_chain_batch(chains: DataFrame, *, gas_limit: int = 10_000_000
                       ) -> DataFrame:
    """Replay whole per-account transaction CHAINS (deployment +
    follow-ups), propagating c4, set_code and balance hop to hop with
    the published fee phases (tvm/phases.py) — one output row per
    follow-up transaction.

    Input columns: account, chain_json — the chain serialized as JSON
    ({"deploy": {...msg fields...}, "followups": [...]}, the shape the
    golden fixture and tvm/chain_replay.py share).  Chains are
    independent → narrow map, embarrassingly parallel; hops inside one
    chain are inherently sequential state propagation (the same
    dependency the streaming trace assembler honors per trace).
    Reference analog: ton-index-worker/ton-trace-emulator applies full
    phases through the real emulator between hops.
    """
    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ton_indexer_spark.tvm.chain_replay import (
            replay_chain_msgs,
        )

        for pdf in batches:
            out = {k: [] for k in ("account", "tx_hash", "hop",
                                   "exit_code", "out_msgs",
                                   "value_delta_max", "exec_error")}
            for rec in pdf.to_dict("records"):
                acct = rec.get("account")
                try:
                    chain = json.loads(rec["chain_json"])
                    rows = replay_chain_msgs(
                        acct, chain["deploy"], chain["followups"],
                        gas_limit=gas_limit)
                    for r in rows:
                        out["account"].append(acct)
                        out["tx_hash"].append(r["tx_hash"])
                        out["hop"].append(r["hop"])
                        out["exit_code"].append(r["exit_code"])
                        out["out_msgs"].append(
                            ",".join(r["out_msgs"]))
                        out["value_delta_max"].append(
                            r["value_delta_max"])
                        out["exec_error"].append(None)
                except Exception as e:  # quarantine, never fail the stage
                    out["account"].append(acct)
                    out["tx_hash"].append(None)
                    out["hop"].append(None)
                    out["exit_code"].append(None)
                    out["out_msgs"].append(None)
                    out["value_delta_max"].append(None)
                    out["exec_error"].append(
                        f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    return chains.select("account", "chain_json").mapInPandas(
        _run, schema=_CHAIN_SCHEMA)


_EXT_SCHEMA = (
    "account string, tx_hash string, exit_code int, out_msgs string, "
    "accepted boolean, exec_error string"
)


def replay_external_batch(txs: DataFrame, *, gas_limit: int = 10_000_000
                          ) -> DataFrame:
    """Replay SIGNED external-in transactions: recv_external (selector
    -1) on the deployment state, with CHKSIGNU verifying the captured
    ed25519 signature through the clean-room RFC 8032 implementation
    (tvm/ed25519.py).  Input columns: account, tx_hash, init_state_boc,
    body_boc, import_fee, now, lt.  Same narrow-map / typed-quarantine
    shape as the other replay operators; reference analog: the real
    emulator executing a signed external end to end
    (ton-emulate-go/main.go)."""
    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ton_indexer_spark.functions.boc import parse_boc
        from ton_indexer_spark.tvm.run import (
            build_external_message,
            run_compute_phase_external,
        )

        def state_init_cells(b64):
            s = parse_boc(b64).begin_parse()
            if s.load_bit():
                s.load_uint(5)
            if s.load_bit():
                s.load_uint(2)
            return s.load_maybe_ref(), s.load_maybe_ref()

        for pdf in batches:
            out = {k: [] for k in ("account", "tx_hash", "exit_code",
                                   "out_msgs", "accepted", "exec_error")}
            for rec in pdf.to_dict("records"):
                out["account"].append(rec.get("account"))
                out["tx_hash"].append(rec.get("tx_hash"))
                try:
                    code, data = state_init_cells(rec["init_state_boc"])
                    body = parse_boc(rec["body_boc"])
                    msg = build_external_message(
                        dest=rec.get("account"), body=body,
                        init=parse_boc(rec["init_state_boc"]),
                        import_fee=int(rec.get("import_fee") or 0))
                    res = run_compute_phase_external(
                        code, data, my_address=rec.get("account"),
                        in_msg=msg, body=body, balance=10**9,
                        unixtime=int(rec.get("now") or 0),
                        block_lt=int(rec.get("lt") or 0),
                        gas_limit=gas_limit)
                    sends = []
                    for a in res.actions:
                        if a["type"] != "send_msg":
                            continue
                        op = a.get("opcode")
                        if op is not None and op >= (1 << 31):
                            op -= 1 << 32
                        sends.append(f"{a.get('dest')}#{op}")
                    out["exit_code"].append(res.exit_code)
                    out["out_msgs"].append(",".join(sorted(sends)))
                    out["accepted"].append(res.success)
                    out["exec_error"].append(None)
                except Exception as e:  # quarantine, never fail the stage
                    out["exit_code"].append(None)
                    out["out_msgs"].append(None)
                    out["accepted"].append(None)
                    out["exec_error"].append(
                        f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    cols = [c for c in ("account", "tx_hash", "init_state_boc",
                        "body_boc", "import_fee", "now", "lt")
            if c in txs.columns]
    return txs.select(*cols).mapInPandas(_run, schema=_EXT_SCHEMA)
