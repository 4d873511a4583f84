"""Per-trace message-tree construction (C1).

The reference's ``to_tree`` links transaction rows into an ``EventNode``
tree via message hashes (indexer/indexer/events/blocks/utils/
tree_utils.py:16-129).  Same idea, fresh implementation over the pandas
rows a grouped UDF receives: one Node per transaction, parent = producer of
the node's in-message.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field


def norm_opcode(op: int | None) -> int | None:
    """Normalize an opcode to its unsigned-uint32 view.

    Ingest sources may deliver opcodes as signed int32 (the reference's
    Postgres column) or unsigned; every matcher constant is unsigned, so the
    tree normalizes once here — the same discipline as the reference's
    ``opcode & 0xFFFFFFFF`` (tree_utils.py:47).
    """
    return None if op is None else op & 0xFFFFFFFF


@dataclass
class Msg:
    msg_hash: str
    direction: str
    source: str | None
    destination: str | None
    value: int | None
    opcode: int | None
    created_lt: int | None
    body: str | None = None
    created_at: int | None = None

    def decoded_body(self) -> dict:
        """Decode the message payload (the engine's F2 BOC-parse surface).

        Real chain data is a base64 BOC — parsed by the pure-Python cell
        reader (functions/boc.py, TEP-74/62 shapes; reference analog
        blocks/messages/jettons.py / nft.py).  Synthetic fixtures carrying
        base64 JSON decode through the fallback, keeping the UDF plumbing
        identical for both.
        """
        if not self.body:
            return {}
        try:
            raw = base64.b64decode(self.body)
        except Exception:
            return {}
        if raw[:4] == b"\xb5\xee\x9c\x72":  # serialized_boc magic
            from ton_indexer_spark.functions.boc import decode_message_body

            return decode_message_body(self.body)
        try:
            return json.loads(raw)
        except Exception:
            return {}


@dataclass(eq=False)  # identity equality/hash — nodes live in sets/dicts
class Node:
    tx_hash: str
    tx_lt: int
    tx_now: int
    account: str
    aborted: bool
    orig_status: str | None
    end_status: str | None
    exit_code: int | None = None  # compute-phase exit code when known
    mc_seqno: int | None = None  # masterchain seqno of the block
    in_msg: Msg | None = None
    out_msgs: list[Msg] = field(default_factory=list)
    parent: "Node | None" = None
    children: list["Node"] = field(default_factory=list)
    consumed: bool = False  # set once a matcher claims the node

    def child_via(self, opcode: int) -> "Node | None":
        for c in self.children:
            if c.in_msg is not None and c.in_msg.opcode == opcode:
                return c
        return None

    def out_opcodes(self) -> set[int]:
        return {m.opcode for m in self.out_msgs if m.opcode is not None}


def build_tree(rows: list[dict]) -> list[Node]:
    """rows = one dict per (tx × message) pair of a single trace.

    Returns the trace's nodes in lt order; parent/children linked by
    msg_hash (out-message of parent == in-message of child).
    """
    nodes: dict[str, Node] = {}
    for r in rows:
        n = nodes.get(r["tx_hash"])
        if n is None:
            n = Node(
                tx_hash=r["tx_hash"],
                tx_lt=r["tx_lt"],
                tx_now=r["tx_now"],
                account=r["account"],
                aborted=bool(r.get("aborted")),
                orig_status=r.get("orig_status"),
                end_status=r.get("end_status"),
                exit_code=(
                    int(r["compute_exit_code"])
                    if r.get("compute_exit_code") is not None
                    else None
                ),
                mc_seqno=(
                    int(r["mc_block_seqno"])
                    if r.get("mc_block_seqno") is not None
                    else None
                ),
            )
            nodes[r["tx_hash"]] = n
        if r.get("msg_hash") is None:
            continue  # messageless transaction (tick-tock) — node only
        msg = Msg(
            msg_hash=r["msg_hash"],
            direction=r["direction"],
            source=r.get("source"),
            destination=r.get("destination"),
            value=r.get("value"),
            opcode=norm_opcode(r.get("opcode")),
            created_lt=r.get("created_lt"),
            body=r.get("body"),
            created_at=r.get("created_at"),
        )
        if msg.direction == "in":
            n.in_msg = msg
        else:
            n.out_msgs.append(msg)

    by_out_hash = {
        m.msg_hash: n for n in nodes.values() for m in n.out_msgs
    }
    for n in nodes.values():
        if n.in_msg is not None and n.in_msg.msg_hash in by_out_hash:
            p = by_out_hash[n.in_msg.msg_hash]
            if p is not n:
                n.parent = p
                p.children.append(n)
    ordered = sorted(nodes.values(), key=lambda n: (n.tx_lt, n.tx_hash))
    for n in ordered:
        n.out_msgs.sort(key=lambda m: (m.created_lt or 0, m.msg_hash))
        n.children.sort(key=lambda c: (c.tx_lt, c.tx_hash))
    return ordered
