"""Classification throughput probe — the classify stage in isolation.

Generates a TON-shaped store at ``n_traces`` (test fixture generator),
runs the FULL ``classify_traces`` pipeline (matcher registry + context
joins + serializer) over it and reports traces/s.  Complements
``assembler_probe.py`` (assembly stage) and PERF.md's pipeline table.

Run:  python examples/classify_probe.py [n_traces]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> None:
    from fixture_gen import generate

    from ton_indexer_spark.classifier import classify_traces
    from ton_indexer_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(app_name="classify_probe")
    fx = generate(tempfile.mkdtemp(prefix="clsprobe_"), n_traces=n)
    txs = spark.read.parquet(f"{fx}/transactions.parquet").localCheckpoint(
        eager=True
    )
    msgs = spark.read.parquet(f"{fx}/messages.parquet").localCheckpoint(
        eager=True
    )
    contents = spark.read.parquet(
        f"{fx}/message_contents.parquet"
    ).localCheckpoint(eager=True)
    n_tr = txs.select("trace_id").distinct().count()
    print(f"store: {txs.count()} txs / {msgs.count()} msgs / {n_tr} traces")

    best = None
    for _ in range(2):
        t0 = time.time()
        out = classify_traces(txs, msgs, message_contents=contents)
        n_actions = out.actions.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"classify: {best:.1f}s -> {n_tr / best:,.0f} traces/s "
        f"({n_actions} actions)"
    )


if __name__ == "__main__":
    main()
