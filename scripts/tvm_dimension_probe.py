"""Store-shaped measurement of the jetton-wallet dimension build
(r10 verdict ask #8).

The r10 "19,200 get-method executions/s" number came from a synthetic
120k-row probe; this drives the PRODUCTION router
(`sources/tx_ingest.py::jetton_wallets_dimension`) end-to-end over a
latest-state-shaped table at store scale:

* N_TOTAL rows partitioned by account hash (the store's layout);
* FAST_FRAC of them on canonical TEP-74 wallet code (real encoded data
  cells through the real cell codec) — the layout fast path;
* the remainder cycling the golden traces' REAL mainnet contract
  code+data cells — the TVM path executes get_wallet_data on actual
  compiled code (the same population the tvm_get_method gate pins).

Reports total wall, rows/s overall, per-path rows/s, and the fast-path
hit rate; writes PERF_tvm_dimension.json.

Run:  python scripts/tvm_dimension_probe.py [N_TOTAL] [FAST_FRAC]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    fast_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.97

    from pyspark.sql import functions as F

    from ton_indexer_spark.functions.boc import (
        encode_jetton_wallet_data,
    )
    from ton_indexer_spark.functions.interfaces import (
        CANONICAL_JETTON_WALLET_HASHES,
    )
    from ton_indexer_spark.session import get_spark
    from ton_indexer_spark.sources.tx_ingest import (
        jetton_wallets_dimension,
    )

    spark = get_spark()

    # real mainnet contracts for the TVM path (golden population)
    golden = json.load(open(os.path.join(
        REPO, "ton_indexer_spark", "tvm", "golden", "get_methods.json")))
    wallets = [r for r in golden["rows"]
               if r["kind"] == "JettonWallet" and r["exit_code"] == 0]
    assert wallets, "no runnable golden wallets"

    # distinct canonical data cells (distinct balances/owners so the
    # codec path is not memoized away); one template per 1k rows
    fast_templates = [
        encode_jetton_wallet_data(
            balance=10**9 + i, owner="0:" + f"{i:064X}"[-64:],
            jetton="0:" + "AB" * 32)
        for i in range(1000)
    ]

    n_fast = int(n_total * fast_frac)
    canon = list(CANONICAL_JETTON_WALLET_HASHES)

    base = spark.range(n_total).withColumn(
        "address",
        F.concat(F.lit("0:"), F.sha2(F.col("id").cast("string"), 256)))
    fast_df = (
        base.filter(F.col("id") < n_fast)
        .withColumn("code_hash",
                    F.element_at(F.array(*[F.lit(h) for h in canon]),
                                 (F.col("id") % len(canon) + 1)
                                 .cast("int")))
        .withColumn("data_boc",
                    F.element_at(
                        F.array(*[F.lit(t) for t in fast_templates]),
                        (F.col("id") % len(fast_templates) + 1)
                        .cast("int")))
        .withColumn("code_boc", F.lit(None).cast("string"))
    )
    slow_df = (
        base.filter(F.col("id") >= n_fast)
        .withColumn("w",
                    (F.col("id") % len(wallets)).cast("int"))
        .withColumn("code_hash",
                    F.element_at(
                        F.array(*[F.lit(w["code_hash"])
                                  for w in wallets]),
                        F.col("w") + 1))
        .withColumn("data_boc",
                    F.element_at(
                        F.array(*[F.lit(w["data_boc"])
                                  for w in wallets]),
                        F.col("w") + 1))
        .withColumn("code_boc",
                    F.element_at(
                        F.array(*[F.lit(w["code_boc"])
                                  for w in wallets]),
                        F.col("w") + 1))
        .drop("w")
    )
    states = fast_df.unionByName(slow_df).repartition(64, "address")
    states.write.mode("overwrite").parquet("/tmp/tvm_dim_probe_states")
    states = spark.read.parquet("/tmp/tvm_dim_probe_states")

    t0 = time.time()
    dim = jetton_wallets_dimension(states)
    agg = dim.groupBy("path").agg(
        F.count("*").alias("rows"),
        F.count("error").alias("errors"),
        F.count("owner").alias("owners"),
    ).collect()
    wall = time.time() - t0
    by_path = {r["path"]: r.asDict() for r in agg}
    n_tvm = by_path.get("tvm", {}).get("rows", 0)
    n_layout = by_path.get("layout", {}).get("rows", 0)
    result = {
        "n_total": n_total,
        "wall_s": round(wall, 2),
        "rows_per_s": round(n_total / wall),
        "fast_path_rows": n_layout,
        "fast_path_hit_rate": round(n_layout / n_total, 4),
        "tvm_rows": n_tvm,
        "tvm_errors": by_path.get("tvm", {}).get("errors", 0),
        "layout_errors": by_path.get("layout", {}).get("errors", 0),
        "golden_codebases": len(wallets),
        "partitions": 64,
    }
    # isolate the TVM path cost with a second timed pass over only the
    # non-canonical slice (same partitioning)
    t1 = time.time()
    from ton_indexer_spark.sources.tx_ingest import jetton_wallets_via_tvm
    tvm_only = jetton_wallets_via_tvm(
        states.filter(~F.col("code_hash").isin(list(
            CANONICAL_JETTON_WALLET_HASHES))))
    n = tvm_only.filter(F.col("exit_code") == 0).count()
    tvm_wall = time.time() - t1
    result["tvm_only_wall_s"] = round(tvm_wall, 2)
    result["tvm_exec_per_s"] = round(n_tvm / tvm_wall) if tvm_wall else None
    result["tvm_ok_rows"] = n
    out = os.path.join(REPO, "PERF_tvm_dimension.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
