"""Replay the reference's golden trace fixtures through the classifier.

The reference ships 122 real-chain traces (lz4+msgpack,
indexer/tests/traces/*.lz4) with captured per-account interface contexts,
and asserts action-level expectations from YAML files
(indexer/tests/test_cases/*.yaml) via
indexer/tests/utils/generic_yaml_test.py.  This module converts one fixture
into the classifier's (rows, ctx) input shape so the same traces replay
through ``build_tree`` + ``classify_tree`` — i.e. exactly the code the
Spark ``applyInPandas`` group function runs — and through the full
``classify_traces`` DataFrame path.

Fixture layout (trace_deserializer.py:221-264): a msgpack map with
``trace`` (trace header), ``transactions`` (each with nested ``messages``,
each message optionally carrying ``message_content``/``init_state`` bodies
as base64 BOC), and ``interfaces`` (account → {InterfaceName: fields}) —
the captured equivalent of the production interface repository
(tests/utils/repository.py).
"""

from __future__ import annotations

import pathlib

from ton_indexer_spark.functions.fixture_codec import load_lz4_msgpack

# every dimension the captured interface context can express — the fixture
# repository is authoritative for its trace's accounts, so matchers must
# gate on membership, exactly like the reference repository (C6)
FIXTURE_DIMS = frozenset(
    ("jetton_wallets", "nft_items", "dns_items", "dex_pools",
     "multisig", "auctions", "nft_sales")
)


def _i(v):
    return None if v is None else int(v)


def load_fixture(path: str | pathlib.Path) -> dict:
    return load_lz4_msgpack(path)


def fixture_rows(data: dict) -> list[dict]:
    """Flatten a fixture into (tx × message) row dicts for build_tree."""
    rows: list[dict] = []
    trace_id = data["trace"]["trace_id"]
    for tx in data["transactions"]:
        base = {
            "trace_id": trace_id,
            "tx_hash": tx["hash"],
            "tx_lt": _i(tx["lt"]),
            "tx_now": _i(tx["now"]),
            "account": tx["account"],
            "aborted": bool(tx["aborted"]),
            "orig_status": tx["orig_status"],
            "end_status": tx["end_status"],
            "compute_exit_code": _i(tx.get("compute_exit_code")),
            "mc_block_seqno": _i(tx.get("mc_block_seqno")),
        }
        msgs = tx.get("messages") or []
        if not msgs:
            rows.append(
                base | {
                    "msg_hash": None, "direction": None, "source": None,
                    "destination": None, "value": None, "opcode": None,
                    "created_lt": None, "body": None,
                }
            )
            continue
        for m in msgs:
            content = m.get("message_content") or {}
            rows.append(
                base | {
                    "msg_hash": m["msg_hash"],
                    "direction": m["direction"],
                    "source": m.get("source"),
                    "destination": m.get("destination"),
                    "value": _i(m.get("value")),
                    "opcode": _i(m.get("opcode")),
                    "created_lt": _i(m.get("created_lt")),
                    "created_at": _i(m.get("created_at")),
                    "body": content.get("body"),
                }
            )
    return rows


def fixture_ctx(data: dict) -> dict:
    """Interface context → the classifier's per-trace ctx dict."""
    interfaces: dict = data.get("interfaces") or {}
    jetton_wallets: dict[str, tuple] = {}
    nft_items: set[str] = set()
    nft_index: dict[str, int] = {}
    nft_collection: dict[str, str] = {}
    nft_sale_info: dict[str, dict] = {}
    nft_auction_info: dict[str, dict] = {}
    nft_sales: dict[str, str] = {}
    auctions: set[str] = set()
    dex_pools: set[str] = set()
    pool_dex: dict[str, str] = {}
    multisig: set[str] = set()
    multisig_orders: dict[str, dict] = {}
    extra: dict[str, dict] = {}
    for account, ifs in interfaces.items():
        for name, fields in (ifs or {}).items():
            if name == "JettonWallet":
                jetton_wallets[account] = (
                    fields.get("owner"), fields.get("jetton")
                )
            elif name == "NftItem":
                nft_items.add(account)
                idx = fields.get("index")
                if idx is not None:
                    nft_index[account] = int(float(idx))
                if fields.get("collection_address"):
                    nft_collection[account] = fields["collection_address"]
            elif name == "NftSale":
                nft_sales[account] = fields.get("nft_address")
                nft_sale_info[account] = fields
            elif name == "NftAuction":
                nft_auction_info[account] = fields
                auctions.add(account)
            elif name == "DedustPool":
                dex_pools.add(account)
                pool_dex[account] = "dedust"
            elif name == "MultisigOrder":
                multisig_orders[account] = fields
                multisig.add(fields.get("multisig_address"))
            else:
                # extra-data requests (get_extra_data in repository.py:49)
                extra.setdefault(account, {})[name] = fields
    return {
        "dims_present": FIXTURE_DIMS,
        "jetton_wallets": jetton_wallets,
        "nft_items": nft_items,
        "nft_index": nft_index,
        "nft_collection": nft_collection,
        "nft_sale_info": nft_sale_info,
        "nft_auction_info": nft_auction_info,
        "dns_items": set(),
        "dex_pools": dex_pools,
        "pool_dex": pool_dex,
        "multisig": multisig or None,
        "multisig_orders": multisig_orders,
        "auctions": auctions,
        "nft_sales": nft_sales,
        "extra": extra,
    }


def flatten_actions(acts: list[dict]) -> list[dict]:
    """Depth-first action list with parent ids, matching serialize (C5)."""
    out: list[dict] = []

    def walk(a: dict, parent_id: str | None) -> None:
        row = dict(a)
        row["parent_action_id"] = parent_id
        out.append(row)
        for child in a.get("children", ()):
            walk(child, row.get("action_id"))

    for a in acts:
        walk(a, None)
    return out


def replay_fixture(path: str | pathlib.Path) -> list[dict]:
    """fixture file → flat classified action dicts (pure-Python path)."""
    from ton_indexer_spark.classifier.matchers import classify_tree
    from ton_indexer_spark.classifier.tree import build_tree

    data = load_fixture(path)
    rows = fixture_rows(data)
    ctx = fixture_ctx(data)
    nodes = build_tree(rows)
    return flatten_actions(classify_tree(nodes, ctx))
