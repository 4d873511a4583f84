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
