"""Wallet external-message payload extraction (the failed-external seam).

A failed external — the wallet transaction aborted and produced no
children — still reveals the user's INTENT: the signed wallet body
carries the internal message(s) that would have been sent.  The
reference parses the v3/v4/v5r1 wallet layouts and grafts ghost nodes
for each embedded message so the trace classifies as a failed
ton/jetton transfer instead of vanishing
(``blocks/messages/externals.py:63-158`` +
``event_processing.py::init_from_external:157-194``).

Layouts (public wallet contracts):

    v3:   signature:bits512 subwallet_id:uint32 valid_until:uint32
          seqno:uint32 [mode-and-^MessageRelaxed]*
    v4:   same + op:uint8 before the message refs
    v5r1: opcode:uint32('sign') wallet_id:uint32 valid_until:uint32
          seqno:uint32 actions:(Maybe ^OutList) — an OutList is a linked
          list of cells, each carrying ^next and ^Message

Each payload ref parses with the standard Message reader
(functions/tx_parse.py::parse_message_cell — MessageRelaxed's int arm is
layout-compatible; addr_none sources read as None).
"""

from __future__ import annotations

import base64

from ton_indexer_spark.functions.boc import BocError, parse_boc


def _payload_dicts(refs) -> list[dict]:
    from ton_indexer_spark.functions.tx_parse import parse_message_cell

    out = []
    for cell in refs:
        try:
            msg = parse_message_cell(cell)
        except BocError:
            continue
        if msg.get("direction_kind") != "int":
            # the reference keeps PayloadMessage.info=None entries and
            # skips them downstream (init_from_external:163-164)
            continue
        out.append(msg)
    return out


def extract_wallet_payloads(body_b64: str) -> tuple[list[dict], str | None]:
    """base64 wallet external body → ([embedded message dicts], wallet
    type) or ([], None) when no known layout matches.  Mirrors the
    reference's try-each-layout discipline (externals.py:140-158)."""
    try:
        root = parse_boc(body_b64)
    except Exception:
        return [], None

    # v5r1 first: self-identifying 'sign' opcode
    try:
        s = root.begin_parse()
        if s.remaining_bits >= 32 and s.load_uint(32) == 0x7369676E:
            s.load_uint(32)  # wallet_id
            s.load_uint(32)  # valid_until
            s.load_uint(32)  # seqno
            refs = []
            cur = s.load_maybe_ref() if s.remaining_bits >= 1 else None
            while cur is not None:
                cs = cur.begin_parse()
                if cs.remaining_refs < 2:
                    break
                cur = cs.load_ref()      # next list node
                # action_send_msg: mode bits precede the ^Message
                refs.append(cs.load_ref())
            if refs:
                return _payload_dicts(refs), "v5r1"
    except Exception:
        pass

    for base_bits, wtype in ((616, "v4"), (608, "v3")):
        try:
            s = root.begin_parse()
            n_refs = s.remaining_refs
            if n_refs == 0 or n_refs > 4:
                continue
            # header + one send_mode byte per embedded message
            if s.remaining_bits != base_bits + 8 * n_refs:
                continue
            s.load_uint(512)  # signature
            s.load_uint(32)   # subwallet_id
            s.load_uint(32)   # valid_until
            s.load_uint(32)   # seqno
            if wtype == "v4":
                s.load_uint(8)  # op (0 = send)
            refs = []
            while s.remaining_refs:
                s.load_uint(8)  # send_mode
                refs.append(s.load_ref())
            return _payload_dicts(refs), wtype
        except Exception:
            continue
    return [], None


def encode_wallet_external(
    messages, *, wallet: str = "v3", subwallet_id: int = 698983191,
    seqno: int = 1, valid_until: int = 0xFFFFFFFF,
) -> str:
    """Fixture encoder: wallet external body embedding ``messages``
    (Message cells from tx_parse.encode_message_cell) → base64 BOC."""
    from ton_indexer_spark.functions.boc import Builder, serialize_boc

    b = Builder()
    b.store_uint(0, 512)  # signature (unchecked by the extractor)
    b.store_uint(subwallet_id, 32)
    b.store_uint(valid_until, 32)
    b.store_uint(seqno, 32)
    if wallet == "v4":
        b.store_uint(0, 8)
    elif wallet != "v3":
        raise ValueError("fixture encoder supports v3/v4")
    for m in messages:
        b.store_uint(3, 8)  # send_mode (pay fees separately + ignore errors)
        b.store_ref(m)
    return base64.b64encode(serialize_boc(b.end_cell())).decode()
