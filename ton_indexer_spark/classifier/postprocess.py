"""Trace post-processors (C4 tail).

The reference runs two functions over the finished block list of every
trace after the matcher loop (``indexer/indexer/events/event_processing.py:
304-307`` — ``trace_post_processors``); this module re-derives both over
the engine's action-dict representation:

* ``post_process_dedust_liquidity`` — a two-asset DeDust LP deposit shows
  up as two independent entry chains (one per asset) touching the same
  deposit contract; the matchers emit the first-asset chain as a *partial*
  ``dex_deposit_liquidity`` action and the chain that finally triggers the
  pool leg as the *final* one.  This merges partial into final per deposit
  contract (``blocks/liquidity.py:473-508`` + ``combine_deposits:511-566``).
* ``unwind_deployments`` — the reference attaches a ``ContractDeploy``
  child block to any base block whose transaction deployed its account
  (``blocks/basic_blocks.py:69,91``) and later promotes those nested
  deploys to top-level actions (``event_processing.py:196-207``).  Here:
  any deploy-transaction claimed into a larger matched action re-emits a
  ``contract_deploy`` action, unless the claiming action already
  represents the deployment itself.

Both run inside the per-trace grouped UDF (pure Python over the already
materialized node/action lists — no extra Spark stage).
"""

from __future__ import annotations

from ton_indexer_spark.classifier.base import _base
from ton_indexer_spark.classifier.tree import Node


def _combine_deposits(final: dict, first: dict) -> bool:
    """Fold the partial deposit's asset legs into the final action's
    ``dex_deposit_liquidity_data`` (combine_deposits, liquidity.py:511-566).
    Returns False (merge refused) when the two deposits declare
    inconsistent target-asset pairs — the reference raises there; we keep
    both actions instead of failing the trace."""
    fd = dict(final.get("dex_deposit_liquidity_data") or {})
    pd_ = first.get("dex_deposit_liquidity_data") or {}

    t_first = {pd_.get("target_asset_1"), pd_.get("target_asset_2")} - {None}
    t_final = {fd.get("target_asset_1"), fd.get("target_asset_2")} - {None}
    if t_first and t_final and t_first != t_final:
        return False

    # gather (asset, amount, user_wallet) legs — partial first, final second,
    # same-asset legs summed (liquidity.py:524-549).  A TON leg carries
    # asset=None (the reference merges Asset objects where TON is truthy;
    # here a leg exists whenever it has an amount)
    legs: list[tuple[object, object, object]] = []
    for d in (pd_, fd):
        for i in (1, 2):
            asset = d.get(f"asset{i}")
            amount = d.get(f"amount{i}")
            if asset is None and amount is None:
                continue
            wallet = d.get(f"user_jetton_wallet_{i}")
            hit = next((j for j, t in enumerate(legs) if t[0] == asset), None)
            if hit is None:
                legs.append((asset, amount, wallet))
            else:
                prev = legs[hit]
                merged = (
                    None if prev[1] is None and amount is None
                    else (prev[1] or 0) + (amount or 0)
                )
                legs[hit] = (asset, merged, wallet or prev[2])
    for i, (asset, amount, wallet) in enumerate(legs[:2], start=1):
        fd[f"asset{i}"] = asset
        fd[f"amount{i}"] = amount
        fd[f"user_jetton_wallet_{i}"] = wallet
    for k in ("target_amount_1", "target_amount_2"):
        if fd.get(k) is None and pd_.get(k) is not None:
            fd[k] = pd_[k]
    if len(legs) >= 2:
        # targets reorder to the merged LEG order, TON (None) included
        # (liquidity.py:566-568) — must run last so the partial backfill
        # can't overwrite a meaningful None (= TON)
        fd["target_asset_1"] = legs[0][0]
        fd["target_asset_2"] = legs[1][0]
    final["dex_deposit_liquidity_data"] = fd

    # Block.merge_blocks analog: union claimed txs, widen the lt/utime span
    final["tx_hashes"] = sorted(set(final["tx_hashes"]) | set(first["tx_hashes"]))
    final["_claimed"] = sorted(
        set(final.get("_claimed", ())) | set(first.get("_claimed", ()))
    )
    final["accounts"] = sorted(
        set(final.get("accounts", ())) | set(first.get("accounts", ()))
    )
    final["start_lt"] = min(final["start_lt"], first["start_lt"])
    final["end_lt"] = max(final["end_lt"], first["end_lt"])
    final["start_utime"] = min(final["start_utime"], first["start_utime"])
    final["end_utime"] = max(final["end_utime"], first["end_utime"])
    final["success"] = bool(final.get("success")) and bool(first.get("success"))
    if final.get("source") is None:
        final["source"] = first.get("source")
    return True


def post_process_dedust_liquidity(actions: list[dict]) -> list[dict]:
    """Merge partial (first-asset) DeDust deposits into the final deposit
    keyed on the deposit-contract account (liquidity.py:473-508)."""
    partials: list[dict] = []
    finals: dict[object, dict] = {}
    used: dict[object, int] = {}
    for a in actions:
        if a.get("type") != "dex_deposit_liquidity":
            continue
        dc = a.get("_deposit_contract")
        data = a.get("dex_deposit_liquidity_data") or {}
        if dc is None or data.get("dex") != "dedust":
            continue
        used[dc] = used.get(dc, 0) + 1
        if a.get("_partial"):
            partials.append(a)
        else:
            finals.setdefault(dc, a)
    if any(v > 2 for v in used.values()):
        # ambiguous reuse of a deposit contract — skip merging wholesale,
        # exactly like the reference (liquidity.py:486-489)
        return actions
    dropped: set[int] = set()
    for p in partials:
        f = finals.get(p["_deposit_contract"])
        if f is not None and _combine_deposits(f, p):
            dropped.add(id(p))
    if not dropped:
        return actions
    return [a for a in actions if id(a) not in dropped]


# Only a claiming action that IS the contract_deploy suppresses the
# re-emission: the reference's unwind promotes nested ContractDeploy blocks
# regardless of the enclosing block's type (event_processing.py:196-207),
# and the serializer drops contract_deploy only as a *child* action — the
# promoted top-level copy always lands (block_tree_serializer.py:1549-1550).
_DEPLOY_BEARING = frozenset({"contract_deploy"})


def _is_deploy(node: Node) -> bool:
    # reference condition: end_status == 'active' and
    # orig_status not in ('active', 'frozen') (basic_blocks.py:68,90)
    return node.end_status == "active" and node.orig_status not in (
        "active", "frozen",
    )


def unwind_deployments(nodes: list[Node], actions: list[dict]) -> list[dict]:
    """Re-emit ``contract_deploy`` for deploy transactions swallowed by a
    larger matched action (event_processing.py:196-207)."""
    claimed_by: dict[str, dict] = {}
    for a in actions:
        # _claimed = the nodes the matcher actually consumed; tx_hashes
        # additionally carries the initiating tx (base.py::_base) and must
        # not make a single-node action look multi-node here
        for h in a.get("_claimed", a.get("tx_hashes", ())):
            claimed_by.setdefault(h, a)
    extra: list[dict] = []
    for n in nodes:
        if not _is_deploy(n):
            continue
        a = claimed_by.get(n.tx_hash)
        if a is None or a.get("type") in _DEPLOY_BEARING:
            continue
        if len(a.get("_claimed", a.get("tx_hashes", ()))) <= 1:
            continue  # single-node action: the deploy fold already applied
        extra.append(_base(n, "contract_deploy"))
    return actions + extra


def run_post_processors(nodes: list[Node], actions: list[dict]) -> list[dict]:
    """Reference order: dedust merge, then deployment unwinding
    (event_processing.py:304-307)."""
    actions = post_process_dedust_liquidity(actions)
    actions = unwind_deployments(nodes, actions)
    return actions


# ------------------------------------------------- failed-external fallback


def failed_external_actions(node: Node, ctx: dict | None = None) -> list[dict]:
    """Classify a lone failed/childless external: the signed wallet body
    reveals the intended internal message(s) — emit them as failed ghost
    actions instead of dropping the trace (reference
    try_process_unknown_event + init_from_external,
    event_processing.py:157-194,340-362; wallet layouts:
    blocks/messages/externals.py:63-158).

    Ghost identity matches the reference exactly: each payload gets a
    synthetic msg_hash = b64(payload_cell_hash_b64 + index)
    (init_from_external:167), so action_id = b64(sha256(msg_hash + type))
    agrees with the reference serializer.  Ghost blocks exclude
    destination columns from `accounts` (block_tree_serializer.py:
    1465-1467 skips them when is_ghost_block).

    Each embedded message becomes a ghost action with success=False:
    valueful no-op messages → ton_transfer; decodable 0x0f8a7ea5 bodies →
    jetton_transfer (the FallbackJettonTransferBlockMatcher analog);
    anything else with an opcode → call_contract.
    """
    import base64 as _b64
    import hashlib as _hashlib

    from ton_indexer_spark.functions.boc import decode_message_body
    from ton_indexer_spark.functions.externals import (
        extract_wallet_payloads,
    )

    ctx = ctx or {}
    if node.in_msg is None or not node.in_msg.body:
        return []
    payloads, wallet = extract_wallet_payloads(node.in_msg.body)
    if not payloads:
        return []

    def ghost_action_id(p: dict, idx: int, typ: str) -> str:
        msg_hash = _b64.b64encode(
            (p.get("hash", "") + str(idx)).encode()
        ).decode()
        return _b64.b64encode(
            _hashlib.sha256((msg_hash + typ).encode()).digest()
        ).decode()

    wallets = ctx.get("jetton_wallets", {})
    acts: list[dict] = []
    for idx, p in enumerate(payloads):
        if p.get("destination") is None:
            continue
        opcode = p.get("opcode")
        body = (
            decode_message_body(p["body_boc"]) if p.get("body_boc") else {}
        )
        common = {
            "claimed": [node],
            "source": node.account,
            "destination": p["destination"],
            "opcode": opcode,
            "value": p.get("value"),
            "success": False,  # the external aborted; nothing executed
        }
        if opcode in (None, 0) and (p.get("value") or 0) > 0:
            acts.append(_base(
                node, "ton_transfer", asset="TON",
                action_id=ghost_action_id(p, idx, "ton_transfer"),
                accounts=sorted({node.account}),
                ton_transfer_data={
                    "content": body.get("comment"),
                    "encrypted": bool(body.get("is_encrypted", False)),
                },
                **common,
            ))
        elif opcode == 0x0F8A7EA5 and body.get("amount") is not None \
                and body.get("destination") is not None:
            # p["destination"] is the sender's jetton wallet; the owner
            # and jetton master resolve from the interface context when
            # hydrated (the wallet never executed, so no notify exists)
            acts.append(_base(
                node, "jetton_transfer",
                action_id=ghost_action_id(p, idx, "jetton_transfer"),
                amount=body.get("amount"),
                asset=wallets.get(p["destination"], (None, None))[1],
                destination=body.get("destination"),
                destination_secondary=None,
                source=node.account,
                source_secondary=p["destination"],
                opcode=opcode,
                value=p.get("value"),
                success=False,
                claimed=[node],
                accounts=sorted({node.account, p["destination"]}),
                jetton_transfer_data={
                    "query_id": body.get("query_id"),
                    "response_destination": body.get(
                        "response_destination"),
                    "forward_amount": body.get("forward_ton_amount"),
                    "custom_payload": body.get("custom_payload"),
                    "forward_payload": body.get("forward_payload"),
                    "comment": body.get("forward_comment"),
                    "is_encrypted_comment": False,
                    "has_internal_transfer": False,
                },
            ))
        else:
            acts.append(_base(
                node, "call_contract",
                action_id=ghost_action_id(p, idx, "call_contract"),
                accounts=sorted({node.account}),
                **common,
            ))
    return acts
