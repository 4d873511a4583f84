"""Streaming soak + chaos test (round-7 verdict ask #6).

One sustained incremental run — ≥20 in-order mc_seqno batches through the
trace assembler AND the classifier — with a HARD mid-batch process kill
(SIGKILL from inside a worker thread, no cleanup, no atexit) followed by
a snapshot restore in a fresh process.  The restored run must converge to
EXACTLY the uninterrupted run's output: the comparison hashes the full
finalized-trace set and the per-trace action multiset.

Recovery contract exercised end-to-end (trace_assembler.py:73-109):
restart resumes from the last persisted snapshot; the driver re-delivers
every batch after it; the batch-keyed output dirs act as the idempotent
T8 sink (replayed batch ids REPLACE their directory, so duplicates are
structurally impossible).

Usage:
    python examples/soak_chaos.py [n_traces] [n_batches] [kill_batch]
        # defaults 100000 20 13 — the PERF.md soak configuration
Internal child mode (one incremental run in its own process/JVM):
    python examples/soak_chaos.py --child <work_dir> <fixture_dir>
        <n_batches> [kill_batch]
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH_PLAN = "batch_plan.json"


def _spark(app: str):
    from ton_indexer_spark.session import get_spark

    return get_spark(app_name=app, shuffle_partitions=16)


def make_fixture(fixture_dir: str, n_traces: int, n_batches: int) -> None:
    """Generate the TON-shaped fixture and a deterministic in-order batch
    plan (contiguous mc_seqno slices) shared by every run."""
    import duckdb

    from tests.fixture_gen import generate

    generate(fixture_dir, n_traces=n_traces)
    con = duckdb.connect()
    seqnos = [
        r[0] for r in con.execute(
            "SELECT DISTINCT mc_block_seqno FROM read_parquet(?) ORDER BY 1",
            [os.path.join(fixture_dir, "transactions.parquet")],
        ).fetchall()
    ]
    step = len(seqnos) // n_batches + 1
    plan = [seqnos[i * step:(i + 1) * step] for i in range(n_batches)]
    with open(os.path.join(fixture_dir, BATCH_PLAN), "w") as f:
        json.dump([s for s in plan if s], f)


def run_incremental(spark, work: str, fixture: str,
                    kill_batch: int | None = None) -> dict:
    """One incremental pass: resume from whatever snapshot exists in
    ``work/state``, re-deliver every batch after it, classify finalized
    traces, write batch-keyed outputs.  ``kill_batch``: SIGKILL this
    process MIDWAY through that batch's processing (a timer thread —
    the hardest crash shape: torn batch, no cleanup)."""
    from pyspark.sql import functions as F

    from ton_indexer_spark.classifier import classify_traces
    from ton_indexer_spark.streaming import IncrementalTraceAssembler

    plan = json.load(open(os.path.join(fixture, BATCH_PLAN)))
    txs = spark.read.parquet(os.path.join(fixture, "transactions.parquet"))
    msgs = spark.read.parquet(os.path.join(fixture, "messages.parquet"))
    bodies = spark.read.parquet(
        os.path.join(fixture, "message_contents.parquet")
    )
    state_dir = os.path.join(work, "state")
    asm = IncrementalTraceAssembler(spark, state_dir=state_dir,
                                    snapshot_every=1)
    snaps = asm._snap_ids()
    start = (snaps[-1] + 1) if snaps else 0
    out_dir = os.path.join(work, "out")
    os.makedirs(out_dir, exist_ok=True)
    stats = {"batches": 0, "finalized": 0, "actions": 0, "wall": 0.0}
    last_wall = 5.0
    for bid in range(start, len(plan)):
        if bid == kill_batch:
            # fire mid-batch: half of the previous batch's wall
            threading.Timer(
                last_wall / 2, os.kill, (os.getpid(), signal.SIGKILL)
            ).start()
        t0 = time.time()
        sl = plan[bid]
        bt = txs.filter(F.col("mc_block_seqno").isin(sl)).drop("trace_id")
        bm = msgs.filter(F.col("mc_seqno").isin(sl))
        r = asm.process_batch(bt, bm, batch_id=bid)
        cls = classify_traces(r.final_transactions, r.final_messages, bodies)
        acts = (
            cls.actions.groupBy("trace_id", "type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # batch-keyed idempotent sink: replay REPLACES the directory (T8)
        base = os.path.join(out_dir, f"batch={bid}")
        r.final_traces.select(
            "trace_id", "state", "nodes_", "edges_", "start_lt", "end_lt"
        ).write.mode("overwrite").parquet(os.path.join(base, "traces"))
        acts.write.mode("overwrite").parquet(os.path.join(base, "actions"))
        last_wall = time.time() - t0
        stats["batches"] += 1
        stats["wall"] += last_wall
        stats["finalized"] += r.final_traces.count()
        stats["actions"] += acts.agg(F.sum("n")).first()[0] or 0
        print(json.dumps({"batch": bid, **stats}), flush=True)
    return stats


def output_hash(spark, work: str) -> str:
    """Canonical digest of the run's full finalized output (all batch
    dirs): the trace set and the per-trace action multiset."""
    traces = spark.read.parquet(os.path.join(work, "out", "batch=*",
                                             "traces"))
    acts = spark.read.parquet(os.path.join(work, "out", "batch=*",
                                           "actions"))
    t_rows = sorted(map(tuple, traces.collect()))
    a_rows = sorted(map(tuple, acts.collect()))
    digest = hashlib.sha256()
    for r in t_rows + a_rows:
        digest.update(repr(r).encode())
    return f"{len(t_rows)}t/{len(a_rows)}a/{digest.hexdigest()[:16]}"


def chaos_run(work_root: str, fixture: str, n_batches: int,
              kill_batch: int) -> dict:
    """Child A (killed mid-batch) then child B (restore + replay), each
    in its own process/JVM via subprocess."""
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g")
    a = subprocess.run(
        [sys.executable, __file__, "--child", work_root, fixture,
         str(n_batches), str(kill_batch)],
        env=env, capture_output=True, text=True,
    )
    killed = a.returncode == -signal.SIGKILL
    b = subprocess.run(
        [sys.executable, __file__, "--child", work_root, fixture,
         str(n_batches)],
        env=env, capture_output=True, text=True,
    )
    if b.returncode != 0:
        raise RuntimeError(f"resume child failed:\n{b.stdout[-2000:]}"
                           f"\n{b.stderr[-2000:]}")
    resumed_from = None
    for line in b.stdout.splitlines():
        if line.startswith('{"batch"'):
            resumed_from = json.loads(line)["batch"]
            break
    return {"killed_by_sigkill": killed, "resumed_from": resumed_from}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        work, fixture = sys.argv[2], sys.argv[3]
        kill = int(sys.argv[5]) if len(sys.argv) > 5 else None
        spark = _spark("soak_child")
        run_incremental(spark, work, fixture, kill_batch=kill)
        return

    import tempfile

    n_traces = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    kill_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    root = tempfile.mkdtemp(prefix="soak_chaos_")
    fixture = os.path.join(root, "fixture")
    print(f"workdir {root}: generating {n_traces} traces...", flush=True)
    make_fixture(fixture, n_traces, n_batches)

    # uninterrupted reference run (own process for a fair wall clock)
    t0 = time.time()
    ref = subprocess.run(
        [sys.executable, __file__, "--child",
         os.path.join(root, "ref"), fixture, str(n_batches)],
        capture_output=True, text=True,
        env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g"),
    )
    ref_wall = time.time() - t0
    if ref.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{ref.stderr[-2000:]}")
    last = [json.loads(x) for x in ref.stdout.splitlines()
            if x.startswith('{"batch"')][-1]
    print(f"reference: {last['finalized']:,} finalized, "
          f"{last['actions']:,} actions, {last['wall']:.1f}s work "
          f"({last['finalized']/last['wall']:,.0f} finalized traces/s "
          f"sustained), {ref_wall:.1f}s wall incl. startup", flush=True)

    info = chaos_run(os.path.join(root, "chaos"), fixture, n_batches,
                     kill_batch)
    print(f"chaos: {info}", flush=True)

    spark = _spark("soak_verify")
    h_ref = output_hash(spark, os.path.join(root, "ref"))
    h_chaos = output_hash(spark, os.path.join(root, "chaos"))
    print(f"ref   : {h_ref}\nchaos : {h_chaos}", flush=True)
    assert info["killed_by_sigkill"], "child A was not SIGKILLed"
    assert h_ref == h_chaos, "restored run diverged from uninterrupted run"
    print("SOAK+CHAOS OK: restored state ≡ uninterrupted state", flush=True)


if __name__ == "__main__":
    main()
