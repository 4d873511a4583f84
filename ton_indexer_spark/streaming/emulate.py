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
