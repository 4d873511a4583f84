"""10× scale probe over the REFERENCE query surface (round-7 verdict ask
#5): the five §2 plans most sensitive to data growth, timed on generated
TON-shaped stores at N and 10N traces.

- J9  traces hydration        plans/traces.py::traces_query (account scope,
                              hydrate + includeActions)
- J6  actions by account      plans/actions.py::actions_by_account
- J8  array-membership join   actions filtered via accounts-array overlap
                              (the write-time pre-exploded table's fallback
                              path, crud_actions_v2.go account filter)
- T6  pending overlay         plans/pending.py::pending_transactions_query
                              (anti-joins against the finalized store)
- W2  latest_state            operators/windows.py::latest_by over the
                              account-state history

Run:  python examples/scale_probe_plans.py [n_traces]
Prints wall seconds at 1× and 10× plus the ratio; a healthy plan's ratio
stays near the data ratio (10) or below (page-bounded plans should be
FLAT — the page is 100 rows regardless of store size).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from pyspark.sql import functions as F  # noqa: E402


def build_store(n_traces: int) -> str:
    from fixture_gen import generate

    d = tempfile.mkdtemp(prefix=f"plans_probe_{n_traces}_")
    generate(d, n_traces=n_traces)
    return d


def pending_overlay_frames(spark, cat):
    """Synthetic pending overlay shaped like streaming/emulate output:
    ~1% of the store's traces re-emitted as pending (so the finalized
    anti-joins have real work), plus fresh never-seen traces."""
    txs = cat.transactions
    pend_tids = (
        cat.traces.filter(F.crc32(F.col("trace_id")) % 100 < 1)
        .select("trace_id")
    )
    ptxs = (
        txs.join(pend_tids, "trace_id", "left_semi")
        .select(
            "account", "hash", "lt", "trace_id", "now",
            "orig_status", "end_status", "aborted",
        )
        .withColumn("finality", F.lit("pending"))
    )
    # fresh never-seen pending txs: shifted copies of the re-emitted set
    # (new hash + trace_id + lt) — these survive the finalized anti-join
    fresh = ptxs.withColumn(
        "hash", F.concat(F.col("hash"), F.lit("#P"))
    ).withColumn(
        "trace_id", F.concat(F.col("trace_id"), F.lit("#P"))
    ).withColumn("lt", F.col("lt") + F.lit(10_000_000))
    ptxs = ptxs.unionByName(fresh)
    msgs = cat.messages
    pmsgs = (
        msgs.join(pend_tids, "trace_id", "left_semi")
        .select(
            "tx_hash", "tx_lt",
            F.col("tx_now") if "tx_now" in msgs.columns
            else F.lit(0).alias("tx_now"),
            "msg_hash", "direction", "trace_id", "source", "destination",
            "value", "created_lt", "opcode",
            F.lit(None).cast("string").alias("body"),
        )
        .withColumn("finality", F.lit("pending"))
    )
    return ptxs, pmsgs


def timed(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:<28} {best:7.2f}s  rows={n}")
    return best


def probe(spark, sf_dir: str, label: str) -> dict:
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.operators.windows import latest_by
    from ton_indexer_spark.plans.actions import actions_by_account
    from ton_indexer_spark.plans.pending import pending_transactions_query
    from ton_indexer_spark.plans.traces import traces_query

    cat = Catalog(spark, sf_dir)
    acct = cat.transactions.groupBy("account").count().orderBy(
        F.desc("count")).first()["account"]
    print(f"[{label}] {sf_dir} busiest account={acct[:16]}…")
    out = {}
    out["traces_hydrated(J9)"] = timed(
        "traces_hydrated(J9)",
        lambda: traces_query(
            cat, account=acct, limit=100, hydrate=True,
            include_actions=True,
        ).count(),
    )
    out["actions_by_account(J6)"] = timed(
        "actions_by_account(J6)",
        lambda: actions_by_account(cat, account=acct, limit=100).count(),
    )
    # J8: actions by member tx hash — the reference's tx_hash = ANY(
    # tx_hashes) array filter (crud_actions_v2.go); probe with the
    # busiest account's latest tx
    probe_tx = (
        cat.transactions.filter(F.col("account") == acct)
        .orderBy(F.desc("lt")).select("hash").first()["hash"]
    )
    out["array_membership(J8)"] = timed(
        "array_membership(J8)",
        lambda: cat.actions.filter(
            F.array_contains(F.col("tx_hashes"), probe_tx)
        ).count(),
    )
    ptxs, pmsgs = pending_overlay_frames(spark, cat)
    ptxs = ptxs.localCheckpoint(eager=True)
    pmsgs = pmsgs.localCheckpoint(eager=True)
    # probe an account that IS in the overlay so the anti-joins produce
    # rows (the busiest store account usually misses the ~1% overlay)
    pacct = (
        ptxs.groupBy("account").count().orderBy(F.desc("count"), "account")
        .first()["account"]
    )
    out["pending_overlay(T6)"] = timed(
        "pending_overlay(T6)",
        lambda: pending_transactions_query(
            cat, ptxs, pmsgs, account=pacct
        ).count(),
    )
    hist = cat.account_states_history
    out["latest_state(W2)"] = timed(
        "latest_state(W2)",
        lambda: latest_by(hist, ["account"], "last_trans_lt").count(),
    )
    return out


def main() -> None:
    from ton_indexer_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    spark = get_spark()
    d1 = build_store(n)
    d10 = build_store(n * 10)
    r1 = probe(spark, d1, "1x")
    r10 = probe(spark, d10, "10x")
    print(f"\n{'plan':<28}{'1x':>8}{'10x':>8}{'ratio':>8}")
    for k in r1:
        print(f"{k:<28}{r1[k]:>8.2f}{r10[k]:>8.2f}{r10[k]/max(r1[k],1e-9):>8.2f}")


if __name__ == "__main__":
    main()
