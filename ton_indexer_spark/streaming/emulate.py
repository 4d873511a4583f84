"""What-if trace emulation seam (SURVEY.md §2.10 C8).

The reference emulates unconfirmed external messages through a real TVM
(`ton-emulate-go/main.go:189-490` driving `ton-index-worker/
ton-trace-emulator`), stores the resulting "pending" trace in Redis with
a TTL, and overlays it over finalized data at query time.  The TVM
itself is a native C++ component this engine intentionally does not
vendor — ``FAKE_EMULATOR`` below is a clearly-marked deterministic
stand-in (external message → 2-hop message chain) so the PLUMBING is
real and tested end to end:

    emulate_externals(msgs) → (transactions, messages) DataFrames in the
    engine's fact schemas, trace_id = sha256 of the external msg hash,
    finality = 'pending' → rows flow through the same classifier and
    ``plans/traces.pending_overlay`` as finalized data, and are evicted
    by the assembler's TTL when the real trace finalizes (T6).

Swapping the fake for a real TVM changes only ``FAKE_EMULATOR``; every
schema, hash-derivation, and overlay contract stays.
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

                def walk(node: dict, depth: int, in_hash: str) -> None:
                    tx_hash = _h(trace_id, node["account"], str(depth))
                    lt = base_lt + depth * 2
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
                        walk(child, depth + 1, out_hash)

                for root in emulator(ext):
                    walk(root, 0, ext["msg_hash"])
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
