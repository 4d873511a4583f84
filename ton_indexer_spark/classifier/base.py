"""Shared matcher plumbing (C3): the action constructor, the TEP opcode
constants, and the reusable jetton-chain walker.

Split out of ``matchers.py`` so the protocol library (``protocols.py``) can
build on the same primitives without an import cycle.  Opcodes are the
public TEP standards (TEP-74 jettons, TEP-62 NFTs, TEP-81 DNS) plus
published contract constants; per-protocol constants live next to their
matchers in ``protocols.py``.
"""

from __future__ import annotations

import base64
import hashlib

from ton_indexer_spark.classifier.tree import Node

JETTON_TRANSFER = 0x0F8A7EA5
JETTON_INTERNAL = 0x178D4519
JETTON_NOTIFY = 0x7362D09C
EXCESSES = 0xD53276DB  # excesses (TEP-74); tree normalizes opcodes unsigned
JETTON_BURN = 0x595F07BC
BURN_NOTIFY = 0x7BDD97DE
NFT_TRANSFER = 0x5FCC3D14
OWNERSHIP_ASSIGNED = 0x05138D91
MULTISIG_NEW_ORDER = 0xF718510F  # multisig v2 new_order (messages/multisig.py:14)
MULTISIG_APPROVE = 0xA762230F    # approve (messages/multisig.py:73)
MULTISIG_EXECUTE = 0x75097F5D    # execute order → wallet (messages/multisig.py:103)
STAKE_DEPOSIT_OP = 0x47D54391  # liquid-staking pool deposit (messages/staking.py:18)
STAKE_WITHDRAW_OP = 0x319B0CDC  # withdraw request (messages/staking.py:22)
POOL_WITHDRAWAL = 0x0A77535C    # pool payout (messages/staking.py:57)
CHANGE_DNS_OP = 0x4EB1F0F9     # TEP-81 change_dns_record
ELECTOR_NEW_STAKE = 0x4E73744B     # elector new_stake ('NstK')
ELECTOR_RECOVER_STAKE = 0x47657424  # elector recover_stake ('Get$')
ELECTOR_DEPOSIT_CONFIRM = 0xF374484C  # deposit confirmation (messages/staking.py:11)
ELECTOR_RECOVER_CONFIRM = 0xF96F7324  # recover confirmation (messages/staking.py:8)
# the masterchain elector — the reference pins the literal address
# (elections.py:10); both election matchers require it as destination
ELECTOR_ADDRESS = "-1:" + "33" * 32
MULTISIG_APPROVE_ACCEPTED = 0x82609BF6  # order → signer (messages/multisig.py:85)
MULTISIG_APPROVE_REJECTED = 0xAFAF283E  # + exit_code (messages/multisig.py:91)
SUBSCRIPTION_PAYMENT = 0x706C7567   # payment request 'plug' (messages/subscriptions.py:7)
SUBSCRIPTION_PAY_RESPONSE = 0xF06C7567  # wallet's response (subscriptions.py:16)
SUBSCRIPTION_PAY_INTERNAL = 0x73756273  # 'subs' payment → beneficiary (:20)
UNSUBSCRIBE_OP = 0x64737472         # wallet plugin destruct 'dstr' (subscriptions.py:24)
VESTING_SEND = 0xA7733ACD           # vesting send_message (messages/vesting.py:12)
VESTING_SEND_RESP = 0xF7733ACD
VESTING_ADD_WHITELIST = 0x7258A69B  # (messages/vesting.py:33)
VESTING_ADD_WHITELIST_RESP = 0xF258A69B
NFT_DISCOVERY = 0x2FCB26A2          # TEP-62 get_static_data (messages/nft.py:79)
NFT_REPORT_STATIC = 0x8B771735      # report_static_data (messages/nft.py:92)

Ctx = dict  # {"jetton_wallets": {addr: (owner, jetton)}, "nft_items": {addr: ...}}

# proxy-TON jetton masters — published contract addresses the reference
# pins for the single-wallet transfer shape (jettons.py:112-116:
# pTON v1, pTON v2, Tonco wTTON)
PTON_MASTERS = frozenset((
    "0:8CDC1D7640AD5EE326527FC1AD0514F468B30DC84B0173F0E155F451B4E11F7C",
    "0:671963027F7F85659AB55B821671688601CDCF1EE674FC7FBBB1A776A18D34A3",
    "0:949C4C66760C002800E2FA3D8A3CA4E1C90A9373B53AE7472033483BF14CD95E",
))


def _node_lt(n: Node) -> int:
    """The reference's EventNode.get_lt (tree_utils.py:75-81): the lt at
    which the node's in-message was *created* (sender side); external and
    tick-tock nodes fall back to the consuming tx lt."""
    if n.in_msg is not None and n.in_msg.created_lt is not None:
        return n.in_msg.created_lt
    return n.tx_lt


def _node_utime(n: Node) -> int:
    if n.in_msg is not None and n.in_msg.created_at is not None:
        return n.in_msg.created_at
    return n.tx_now


def _base(node: Node, typ: str, **kw) -> dict:
    claimed = kw.pop("claimed", [node])
    act = {
        "type": typ,
        "source": node.in_msg.source if node.in_msg else None,
        "source_secondary": None,
        "destination": node.account,
        "destination_secondary": None,
        "asset": None,
        "opcode": node.in_msg.opcode if node.in_msg else None,
        "value": node.in_msg.value if node.in_msg else None,
        "amount": None,
        "success": not any(n.aborted for n in claimed),
        # tx_hashes/accounts defaulted after kw-update (claimed set +
        # initiating tx + endpoint columns) so matcher overrides win
        # the action's lt span opens when its first message is created and
        # closes when its last tx commits (core.py:153-159)
        "start_lt": min(_node_lt(n) for n in claimed),
        "end_lt": max(n.tx_lt for n in claimed),
        "start_utime": min(_node_utime(n) for n in claimed),
        "end_utime": max(n.tx_now for n in claimed),
        # max masterchain seqno across the claimed txs
        # (block_tree_serializer.py:114) — None when inputs lack it
        "mc_seqno_end": max(
            (n.mc_seqno for n in claimed if n.mc_seqno is not None),
            default=None,
        ),
    }
    act.update(kw)
    # Deterministic action id, reference-compatible: sha256 of the root
    # (min-lt) claimed node's in-message hash (tx hash for message-less
    # tick-tocks) + the action type, base64 (block_tree_serializer.py:99-108)
    root = min(claimed, key=lambda n: (_node_lt(n), n.tx_hash))
    key = (root.in_msg.msg_hash if root.in_msg is not None else root.tx_hash)
    act.setdefault(
        "action_id",
        base64.b64encode(
            hashlib.sha256((key + act["type"]).encode()).digest()
        ).decode(),
    )
    # tx set: every claimed (consuming) tx + the *initiating* tx — the one
    # that produced the root's in-message (block_tree_serializer.py:
    # 1469-1478 extended_tx_hashes); same for its account below
    tx_hashes = {n.tx_hash for n in claimed}
    # claimed-only view for post-processors (the deploy unwind needs "was
    # this node consumed into a LARGER pattern", which the extended
    # tx_hashes no longer answers); stripped at serialization
    act.setdefault("_claimed", sorted(tx_hashes))
    if root.parent is not None:
        tx_hashes.add(root.parent.tx_hash)
    act.setdefault("tx_hashes", sorted(tx_hashes))
    # involved-accounts set: claimed tx accounts + the four endpoint
    # columns (block_tree_serializer.py:115-120,1462-1480); matchers append
    # extra participants (e.g. multisig signers) on top before serialize
    accounts = {n.account for n in claimed}
    if root.parent is not None:
        accounts.add(root.parent.account)
    accounts.update(
        act.get(k)
        for k in ("source", "source_secondary",
                  "destination", "destination_secondary")
    )
    act.setdefault("accounts", sorted(a for a in accounts if a is not None))
    for n in claimed:
        n.consumed = True
    return act


def _op(node: Node) -> int | None:
    return node.in_msg.opcode if node.in_msg is not None else None


def _jetton_chain(node: Node, ctx: Ctx) -> dict | None:
    """Structural jetton-transfer chain rooted at `node` (wallet tx with
    in-op 0x0f8a7ea5).  Returns {claimed, sender_wallet, receiver_wallet,
    dest_owner, notify, amount, asset} or None — shared by the transfer and
    swap matchers."""
    if node.in_msg is None or node.in_msg.opcode != JETTON_TRANSFER:
        return None
    internal = node.child_via(JETTON_INTERNAL)
    if internal is None:
        return None
    claimed = [node, internal]
    notify = internal.child_via(JETTON_NOTIFY)
    if notify is not None:
        claimed.append(notify)
    excess = internal.child_via(EXCESSES) or node.child_via(EXCESSES)
    if excess is not None and excess not in claimed:
        claimed.append(excess)
    wallets = ctx.get("jetton_wallets", {})
    payload = node.in_msg.decoded_body()
    dest_owner = (
        notify.account if notify is not None
        else wallets.get(internal.account, (None, None))[0]
    )
    return {
        "claimed": claimed,
        "sender_wallet": node.account,
        "receiver_wallet": internal.account,
        "dest_owner": payload.get("destination", dest_owner),
        "notify": notify,
        "amount": payload.get("amount"),
        "asset": wallets.get(node.account, (None, None))[1],
    }
