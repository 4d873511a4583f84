"""Demonstrate the in-engine TVM end to end (round 10).

Three progressively deeper uses of ``ton_indexer_spark/tvm`` over the
REAL mainnet contracts committed as goldens:

1. runGetMethod through the layered executor (data-cell fast path vs
   real execution) for one jetton wallet;
2. distributed dimension derivation: ``jetton_wallets_via_tvm`` over a
   replicated store — the 100 TB shape (narrow Arrow map, per-row gas
   bound), printing the measured executions/s;
3. pending-trace emulation with the real backend: an external message
   forwarded into a captured mainnet contract, the TVM-derived hops
   flowing through the standard pending overlay schemas.

Run:  python examples/tvm_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "ton_indexer_spark", "tvm", "golden")


def main() -> int:
    from pyspark.sql import functions as F

    from ton_indexer_spark.functions.getmethod import layered_executor
    from ton_indexer_spark.session import get_spark
    from ton_indexer_spark.sources.tx_ingest import jetton_wallets_via_tvm
    from ton_indexer_spark.streaming.emulate import (
        emulate_externals,
        make_tvm_emulator,
    )

    with open(os.path.join(GOLDEN_DIR, "get_methods.json")) as fh:
        gm_rows = [r for r in json.load(fh)["rows"]
                   if r["kind"] == "JettonWallet"]
    with open(os.path.join(GOLDEN_DIR, "compute_replay.json")) as fh:
        replay_rows = json.load(fh)["rows"]

    # 1. single get-method through the serving executor
    r = gm_rows[0]
    state = {"account": r["account"], "code_boc": r["code_boc"],
             "data_boc": r["data_boc"], "balance": 0,
             "code_hash": r["code_hash"]}
    res = layered_executor(state, "get_wallet_data", [])
    print(f"[1] get_wallet_data on {r['account'][:16]}…: "
          f"exit={res['exit_code']} stack={len(res['stack'])} entries")

    spark = get_spark(app_name="tvm_probe", shuffle_partitions=32)

    # 2. distributed derivation over a replicated store
    base = spark.createDataFrame(
        [(x["account"], x["code_boc"], x["data_boc"]) for x in gm_rows],
        "address string, code_boc string, data_boc string")
    big = base.crossJoin(spark.range(5000)).select(
        "address", "code_boc", "data_boc").repartition(32).persist()
    n = big.count()
    t0 = time.time()
    ok = (jetton_wallets_via_tvm(big)
          .filter(F.col("exit_code") == 0).count())
    dt = time.time() - t0
    print(f"[2] {n} real TVM executions in {dt:.1f}s "
          f"({n / dt:,.0f}/s on local[32]); {ok} succeeded")

    # 3. pending emulation with the real backend
    rr = next(x for x in replay_rows if len(x["expected_out"]) >= 2)
    from ton_indexer_spark.functions.boc import (
        cell_to_b64_boc,
        parse_boc,
    )

    def state_init(b64):
        s = parse_boc(b64).begin_parse()
        if s.load_bit():
            s.load_uint(5)
        if s.load_bit():
            s.load_uint(2)
        return s.load_maybe_ref(), s.load_maybe_ref()

    code, data = state_init(rr["init_state_boc"])
    states = {rr["account"]: {"code_boc": cell_to_b64_boc(code),
                              "data_boc": cell_to_b64_boc(data)}}
    emulator = make_tvm_emulator(states.get, unixtime=rr["now"])
    op = parse_boc(rr["body_boc"]).begin_parse().load_uint(32)
    ext = spark.createDataFrame(
        [("probe-ext", rr["src"], rr["account"],
          op - (1 << 32) if op >= (1 << 31) else op,
          rr["value"], rr["body_boc"])],
        "msg_hash string, destination string, forward_to string, "
        "opcode long, value long, body string")
    txs, msgs = emulate_externals(ext, now=rr["now"], emulator=emulator)
    hops = msgs.filter(F.col("direction") == "out").count()
    print(f"[3] pending emulation of tx {rr['tx_hash'][:12]}…: "
          f"{txs.count()} pending txs, {hops} out messages "
          f"(chain produced {len(rr['expected_out'])} at the TVM hop)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
