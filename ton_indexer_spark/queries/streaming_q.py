"""Driver gate for the INCREMENTAL (streaming) trace assembler — the
r9 verdict's ask #5: T2/T3 are the system's heart and were attested
only by local soak/chaos tests; this gate proves batch ≡ incremental
(and snapshot restore) to the DRIVER with a computing DuckDB oracle.

The spec replays a fixed 3-batch in-order sequence through
``streaming/trace_assembler.py`` (reference semantics:
ton-index-worker/tondb-scanner/src/TraceAssembler.cpp:285-412):

- batch 1: trace A completes in-batch (2 txs), trace B opens pending,
  trace C roots BROKEN (orphan internal in-message, :316-325);
- batch 2: B grows but stays pending; trace D opens and stays pending;
- **the assembler is then discarded and a NEW instance restores from
  the persisted parquet snapshot** (T3, the <seqno>.tastate analog,
  :90-212) before
- batch 3: B's last pending edge resolves → B finalizes; D consumes
  one edge but opens another → still pending at end-of-stream.

Output: one row per trace with trace_id (root tx hash, the reference's
convention — migrate.cpp:516), state, node/edge/pending counters, lt
span, and ``emitted_batch`` — the batch at which the incremental path
finalized the trace (NULL = still open).

The oracle COMPUTES the same table from the identical fixture rows
(inlined from the same python literals, so they cannot drift) using a
recursive-CTE forest closure + anti-join orphan/pending detection —
and derives ``emitted_batch`` from the invariant that makes streaming
emission safe: a trace finalizes exactly in the batch carrying its
last member (once pending_edges hits zero no member can ever join).
An incremental-vs-batch divergence, a broken snapshot restore, or a
wrong emission batch all hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.queries import register

# ---------------------------------------------------------------------------
# fixture literals — single source for BOTH the Spark frames and the SQL
# oracle.  (hash, lt, mc_block_seqno);  lt doubles as `now`.

_TXS = [
    # batch 1
    ("a1", 100, 1), ("a2", 110, 1), ("b1", 120, 1), ("c1", 130, 1),
    # batch 2
    ("b2", 210, 2), ("d1", 220, 2), ("d2", 230, 2),
    # batch 3
    ("b3", 310, 3), ("d3", 320, 3),
]

# (tx_hash, msg_hash, direction, source, destination)
_MSGS = [
    ("a1", "e1", "in", None, "A1"),     # external root in
    ("a1", "m1", "out", "A1", "A2"),
    ("a2", "m1", "in", "A1", "A2"),     # consumed -> edge a1->a2
    ("b1", "e2", "in", None, "B1"),
    ("b1", "m2", "out", "B1", "B2"),    # pending until batch 2
    ("c1", "i3", "in", "CX", "C1"),     # ORPHAN: internal, no producer
    ("b2", "m2", "in", "B1", "B2"),
    ("b2", "m3", "out", "B2", "B3"),    # pending until batch 3
    ("d1", "e4", "in", None, "D1"),
    ("d1", "m4", "out", "D1", "D2"),
    ("d2", "m4", "in", "D1", "D2"),
    ("d2", "m5", "out", "D2", "D3"),    # pending until batch 3
    ("b3", "m3", "in", "B2", "B3"),     # B completes
    ("d3", "m5", "in", "D2", "D3"),
    ("d3", "m6", "out", "D3", "D4"),    # never consumed: D stays open
]


def _sql_str(v) -> str:
    return "NULL" if v is None else f"'{v}'"


_TX_VALUES = ",\n      ".join(
    f"('{h}', CAST({lt} AS BIGINT), CAST({s} AS BIGINT))"
    for h, lt, s in _TXS
)
_MSG_VALUES = ",\n      ".join(
    f"('{tx}', '{mh}', '{d}', {_sql_str(src)}, {_sql_str(dst)})"
    for tx, mh, d, src, dst in _MSGS
)

_ORACLE = f"""
    WITH RECURSIVE
    txs(hash, lt, mc_block_seqno) AS (VALUES
      {_TX_VALUES}
    ),
    msgs(tx_hash, msg_hash, direction, source, destination) AS (VALUES
      {_MSG_VALUES}
    ),
    outs AS (
      SELECT tx_hash AS src_tx, msg_hash, destination
      FROM msgs WHERE direction = 'out'
    ),
    ins AS (
      SELECT tx_hash AS dst_tx, msg_hash, source
      FROM msgs WHERE direction = 'in'
    ),
    edges AS (
      SELECT o.src_tx, i.dst_tx FROM outs o JOIN ins i USING (msg_hash)
    ),
    -- forest closure: each tx consumes exactly one in-message, so the
    -- producer->consumer edges form a forest; propagate root hashes
    roots AS (
      SELECT hash AS tx, hash AS root FROM txs
      WHERE hash NOT IN (SELECT dst_tx FROM edges)
      UNION ALL
      SELECT e.dst_tx, r.root FROM edges e JOIN roots r ON e.src_tx = r.tx
    ),
    orphans AS (
      SELECT dst_tx FROM ins
      WHERE source IS NOT NULL
        AND msg_hash NOT IN (SELECT msg_hash FROM outs)
    ),
    unconsumed AS (
      SELECT src_tx, COUNT(*) AS n FROM outs
      WHERE destination IS NOT NULL
        AND msg_hash NOT IN (SELECT msg_hash FROM ins)
      GROUP BY src_tx
    ),
    agg AS (
      SELECT r.root AS trace_id,
             COUNT(*) AS nodes,
             MIN(t.lt) AS start_lt,
             MAX(t.lt) AS end_lt,
             SUM(CASE WHEN o.dst_tx IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_orphans,
             CAST(COALESCE(SUM(u.n), 0) AS BIGINT) AS pending_edges,
             MAX(t.mc_block_seqno) AS max_seqno
      FROM txs t
      JOIN roots r ON r.tx = t.hash
      LEFT JOIN orphans o ON o.dst_tx = t.hash
      LEFT JOIN unconsumed u ON u.src_tx = t.hash
      GROUP BY r.root
    ),
    ecount AS (
      SELECT r.root AS trace_id, COUNT(*) AS edges
      FROM edges e JOIN roots r ON r.tx = e.src_tx
      GROUP BY r.root
    )
    SELECT a.trace_id,
           CASE WHEN a.n_orphans > 0 THEN 'broken'
                WHEN a.pending_edges > 0 THEN 'pending'
                ELSE 'complete' END AS state,
           CAST(a.nodes AS BIGINT) AS nodes,
           CAST(COALESCE(ec.edges, 0) AS BIGINT) AS edges,
           a.pending_edges,
           a.start_lt,
           a.end_lt,
           -- the streaming-emission invariant: complete/broken traces
           -- finalize in the batch of their LAST member; pending stay open
           CASE WHEN a.n_orphans = 0 AND a.pending_edges > 0
                THEN CAST(NULL AS BIGINT) ELSE a.max_seqno
           END AS emitted_batch
    FROM agg a LEFT JOIN ecount ec USING (trace_id)
    ORDER BY a.trace_id
"""

_TX_SCHEMA = (
    "account string, hash string, lt long, now long, mc_block_seqno long, "
    "aborted boolean, orig_status string, end_status string, total_fees long"
)
_MSG_SCHEMA = (
    "tx_hash string, tx_lt long, msg_hash string, direction string, "
    "source string, destination string, value long, opcode long, "
    "created_lt long, body_hash string"
)


def _fixture_batches(spark: SparkSession):
    tx_by_lt = {h: (lt, s) for h, lt, s in _TXS}
    batches = []
    for seqno in (1, 2, 3):
        tx_rows = [
            (f"acc_{h}", h, lt, lt, s, False, "active", "active", 1000)
            for h, lt, s in _TXS if s == seqno
        ]
        hashes = {h for h, _, s in _TXS if s == seqno}
        msg_rows = [
            (tx, tx_by_lt[tx][0], mh, d, src, dst, 50, 0, tx_by_lt[tx][0],
             f"body_{mh}")
            for tx, mh, d, src, dst in _MSGS if tx in hashes
        ]
        batches.append((
            spark.createDataFrame(tx_rows, _TX_SCHEMA),
            spark.createDataFrame(msg_rows, _MSG_SCHEMA),
        ))
    return batches


@register(
    "trace_assembly_incremental",
    _ORACLE,
    survey_ops=("T1", "T2", "T3", "T4"),
    description="incremental trace assembly driver gate: a fixed 3-batch "
    "in-order sequence replayed through streaming/trace_assembler.py with "
    "a REAL restart (new assembler instance restoring from the persisted "
    "parquet snapshot) before the last batch; emits per-trace state/"
    "counters/emission-batch and oracles them against a recursive-CTE "
    "forest closure computed by DuckDB from the same fixture literals "
    "(TraceAssembler.cpp:285-412, snapshot restore :90-212)",
)
def trace_assembly_incremental_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from ton_indexer_spark.streaming.trace_assembler import (
        IncrementalTraceAssembler,
    )

    state_dir = tempfile.mkdtemp(prefix="ta_gate_")
    try:
        asm = IncrementalTraceAssembler(spark, state_dir=state_dir)
        finals = []
        res = None
        for i, (bt, bm) in enumerate(_fixture_batches(spark), start=1):
            if i == 3:
                # T3: throw the instance away and restore from snapshot —
                # a broken restore loses B/D state and the oracle catches it
                asm = IncrementalTraceAssembler(spark, state_dir=state_dir)
            res = asm.process_batch(bt, bm, batch_id=i)
            finals.append(
                res.final_traces.withColumn(
                    "emitted_batch", F.lit(i).cast("long")
                )
            )
        out = finals[0]
        for df in finals[1:]:
            out = out.unionByName(df)
        out = out.unionByName(
            res.pending_traces.withColumn(
                "emitted_batch", F.lit(None).cast("long")
            )
        )
        # everything below touches only localCheckpoint'ed frames, so the
        # state dir can be removed before the caller collects
        return out.select(
            "trace_id",
            "state",
            F.col("nodes_").cast("long").alias("nodes"),
            F.col("edges_").cast("long").alias("edges"),
            F.col("pending_edges_").cast("long").alias("pending_edges"),
            "start_lt",
            "end_lt",
            "emitted_batch",
        ).orderBy("trace_id")
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
