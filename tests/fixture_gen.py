"""Deterministic synthetic TON-schema fixture generator (FIXTURES.md).

Generates the §1-§4 tables with a *hidden* ground-truth ``trace_id`` so the
trace-assembly operator can be verified from transactions+messages alone
(FIXTURES.md §3), plus the dimension tables the endpoint plans join against.

Trace shapes (FIXTURES.md §2): 40% single-tx, 40% linear chains 2-5, 15%
trees fanout 2-3 depth 2-3, 5% long chains; plus edge cases: (a) broken
traces rooted at an in-message whose producer is missing, (b) log messages
(destination NULL) completing edges, (c) pending traces with an unconsumed
out-edge, (d) externals (source NULL) rooting traces.

Pure numpy/pyarrow — no Spark needed to generate; written once per test
session to parquet.
"""

from __future__ import annotations

import base64
from collections import Counter
import hashlib
import json
import os
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_700_000_000  # base unix seconds


def _hash(tag: str, i) -> str:
    """Deterministic 44-char base64 'tonhash'."""
    return base64.b64encode(hashlib.sha256(f"{tag}:{i}".encode()).digest()).decode()


def _addr(i: int) -> str:
    return f"0:{hashlib.sha256(f'acc:{i}'.encode()).hexdigest()}"


class _Gen:
    def __init__(self, n_traces: int, seed: int):
        self.rng = np.random.default_rng(seed)
        self.n_traces = n_traces
        self.accounts = [_addr(i) for i in range(200)]
        self.code_hashes = [_hash("code", i) for i in range(12)]
        self.txs: list[dict] = []
        self.msgs: list[dict] = []
        self.traces: list[dict] = []
        self.lt = 1_000_000
        self.msg_seq = 0

    def next_lt(self) -> int:
        self.lt += int(self.rng.integers(5, 50))
        return self.lt

    def _mc_seqno(self, lt: int) -> int:
        return 1 + (lt - 1_000_000) // 5_000  # ~new mc block every 5k lt

    def _tx(self, trace_id: str, account: str, aborted=False) -> dict:
        lt = self.next_lt()
        h = _hash("tx", len(self.txs))
        mc = self._mc_seqno(lt)
        tx = {
            "account": account,
            "hash": h,
            "lt": lt,
            "block_workchain": 0,
            "block_shard": -9223372036854775808,
            "block_seqno": mc * 2,
            "mc_block_seqno": mc,
            "trace_id": trace_id,
            "now": T0 + (lt - 1_000_000) // 10,
            "orig_status": "active",
            "end_status": "active",
            "total_fees": int(self.rng.integers(10**5, 10**7)),
            "account_state_hash_before": _hash("st", f"{account}:{lt - 1}"),
            "account_state_hash_after": _hash("st", f"{account}:{lt}"),
            "descr": "ord",
            "aborted": bool(aborted),
            "compute_exit_code": 0 if not aborted else int(self.rng.integers(1, 100)),
            "compute_gas_used": int(self.rng.integers(10**3, 10**6)),
            "compute_gas_fees": int(self.rng.integers(10**4, 10**6)),
        }
        self.txs.append(tx)
        return tx

    def _msg_row(self, tx, direction, msg_hash, source, destination, value,
                 created_lt, opcode, body_hash=None):
        self.msgs.append(
            {
                "tx_hash": tx["hash"],
                "tx_lt": tx["lt"],
                "tx_now": tx["now"],
                "mc_seqno": tx["mc_block_seqno"],
                "msg_hash": msg_hash,
                "msg_hash_norm": msg_hash,
                "direction": direction,
                "trace_id": tx["trace_id"],
                "source": source,
                "destination": destination,
                "value": value,
                "fwd_fee": int(self.rng.integers(10**3, 10**5)),
                "ihr_fee": 0,
                "created_lt": created_lt,
                "created_at": T0 + (created_lt - 1_000_000) // 10,
                "opcode": opcode,
                "bounce": False,
                "bounced": False,
                "body_hash": body_hash,
                "init_state_hash": None,
            }
        )

    def _new_msg_hash(self) -> str:
        self.msg_seq += 1
        return _hash("msg", self.msg_seq)

    OPCODES = [0, 0x0F8A7EA5, 0x178D4519, 0x7362D09C, 0x05138D91, -11, 0x595F07BC]

    def _opcode(self) -> int:
        return int(self.rng.choice(self.OPCODES))

    def gen_trace(self, kind: str) -> None:
        """kind ∈ single|chain|tree|long|broken|pending"""
        root_acc = self.accounts[int(self.rng.integers(0, len(self.accounts)))]
        broken = kind == "broken"
        # spec: (node, parent_tx or None); root consumes external or orphan msg
        root_trace_id = None  # assigned after root tx hash known

        # build tx tree structure first (list of (parent_idx or None))
        if kind == "single":
            parents = [None]
        elif kind == "chain" or kind == "broken" or kind == "pending":
            n = int(self.rng.integers(2, 6)) if kind != "single" else 1
            parents = [None] + list(range(n - 1))
        elif kind == "long":
            n = int(self.rng.integers(20, 60))
            parents = [None] + list(range(n - 1))
        else:  # tree
            depth = int(self.rng.integers(2, 4))
            parents = [None]
            frontier = [0]
            for _ in range(depth):
                nxt = []
                for p in frontier:
                    for _ in range(int(self.rng.integers(2, 4))):
                        parents.append(p)
                        nxt.append(len(parents) - 1)
                frontier = nxt

        node_txs: list[dict] = []
        edges = 0
        root_in_mh = None  # the root's in-message hash (created at i == 0)
        for i, parent in enumerate(parents):
            acc = self.accounts[int(self.rng.integers(0, len(self.accounts)))]
            if i == 0:
                # provisional trace id fixed below once hash is known
                tx = self._tx("pending", acc if kind != "single" else root_acc)
                trace_id = tx["hash"]
                tx["trace_id"] = trace_id
                root_trace_id = trace_id
                if broken:
                    # in-message whose producing out-message is missing
                    mh = self._new_msg_hash()
                    self._msg_row(tx, "in", mh, _addr(999), tx["account"],
                                  int(self.rng.integers(10**6, 10**9)),
                                  tx["lt"] - 3, self._opcode())
                else:
                    mh = self._new_msg_hash()
                    self._msg_row(tx, "in", mh, None, tx["account"], None,
                                  0, self._opcode())
                root_in_mh = mh
            else:
                ptx = node_txs[parent]
                tx = self._tx(root_trace_id, acc)
                mh = self._new_msg_hash()
                value = int(self.rng.integers(10**6, 10**10))
                created_lt = ptx["lt"] + 2
                op = self._opcode()
                body = _hash("body", mh) if self.rng.random() < 0.5 else None
                # out under producer, in under consumer — same msg_hash
                self._msg_row(ptx, "out", mh, ptx["account"], tx["account"],
                              value, created_lt, op, body)
                self._msg_row(tx, "in", mh, ptx["account"], tx["account"],
                              value, created_lt, op, body)
                edges += 1
            node_txs.append(tx)

        # ~20% of txs emit a log message (destination NULL) — completed edge
        for tx in node_txs:
            if self.rng.random() < 0.2:
                mh = self._new_msg_hash()
                self._msg_row(tx, "out", mh, tx["account"], None, None,
                              tx["lt"] + 1, -11)

        pending_edges = 0
        if kind == "pending":
            # out-edge with a destination but no consuming tx in the data
            last = node_txs[-1]
            mh = self._new_msg_hash()
            self._msg_row(last, "out", mh, last["account"], _addr(998),
                          int(self.rng.integers(10**6, 10**9)), last["lt"] + 2,
                          self._opcode())
            pending_edges = 1

        state = "broken" if broken else ("pending" if pending_edges else "complete")
        lts = [t["lt"] for t in node_txs]
        nows = [t["now"] for t in node_txs]
        mcs = [t["mc_block_seqno"] for t in node_txs]
        ext = None if broken else self.msgs[-1]["msg_hash"]
        # the root tx always gets exactly one in-row, created at i == 0
        # above — equivalent to scanning self.msgs for it, without the
        # O(traces x messages) blowup that made 30k-trace stores minutes
        self.traces.append(
            {
                "trace_id": root_trace_id,
                "external_hash": root_in_mh if root_in_mh else ext,
                "external_hash_norm": root_in_mh if root_in_mh else ext,
                "mc_seqno_start": min(mcs),
                "mc_seqno_end": max(mcs),
                "start_lt": min(lts),
                "end_lt": max(lts),
                "start_utime": min(nows),
                "end_utime": max(nows),
                "state": state,
                "edges_": edges,
                "pending_edges_": pending_edges,
                "nodes_": len(node_txs),
                "classification_state": "unclassified",
            }
        )

    def run(self):
        kinds = (["single"] * 38 + ["chain"] * 38 + ["tree"] * 15 +
                 ["long"] * 3 + ["broken"] * 3 + ["pending"] * 3)
        for i in range(self.n_traces):
            self.gen_trace(kinds[i % len(kinds)])


def _prev_pointers(txs: list[dict]) -> None:
    by_acc: dict[str, list[dict]] = {}
    for t in sorted(txs, key=lambda t: t["lt"]):
        by_acc.setdefault(t["account"], []).append(t)
    for chain in by_acc.values():
        prev = None
        for t in chain:
            t["prev_trans_hash"] = prev["hash"] if prev else None
            t["prev_trans_lt"] = prev["lt"] if prev else None
            prev = t


def _write(path: str, rows: list[dict], decimals: tuple[str, ...] = ()) -> None:
    if not rows:
        raise ValueError(f"no rows for {path}")
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    arrays, fields = [], []
    for k, v in cols.items():
        if k in decimals:
            arr = pa.array(
                [None if x is None else Decimal(int(x)) for x in v],
                type=pa.decimal128(38, 0),
            )
        else:
            arr = pa.array(v)
        arrays.append(arr)
        fields.append(pa.field(k, arr.type))
    pq.write_table(pa.Table.from_arrays(arrays, schema=pa.schema(fields)), path)


def generate(out_dir: str, n_traces: int = 300, seed: int = 42) -> str:
    """Generate all fixture tables under out_dir; returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    g = _Gen(n_traces, seed)
    g.run()
    _prev_pointers(g.txs)
    rng = g.rng

    # ---- fact tables
    _write(f"{out_dir}/transactions.parquet", g.txs)
    _write(f"{out_dir}/messages.parquet", g.msgs)

    contents = [
        {"hash": m["body_hash"], "body": base64.b64encode(
            f"body-of-{m['msg_hash']}".encode()).decode()}
        for m in g.msgs
        if m["body_hash"] is not None and m["direction"] == "in"
    ]
    seen = set()
    contents = [c for c in contents if not (c["hash"] in seen or seen.add(c["hash"]))]
    _write(f"{out_dir}/message_contents.parquet", contents)

    mcs = sorted({t["mc_block_seqno"] for t in g.txs})
    tx_count_by_mc = Counter(t["mc_block_seqno"] for t in g.txs)
    blocks = []
    for s in mcs:
        blocks.append({
            "workchain": -1, "shard": -9223372036854775808, "seqno": s,
            "mc_block_seqno": s,
            "gen_utime": T0 + s * 500, "start_lt": 1_000_000 + (s - 1) * 5000,
            "end_lt": 1_000_000 + s * 5000,
            "tx_count": tx_count_by_mc[s],
            "key_block": s % 100 == 0,
            "prev_blocks": [{"workchain": -1, "shard": -9223372036854775808,
                             "seqno": s - 1}] if s > 1 else [],
        })
        blocks.append({
            "workchain": 0, "shard": -9223372036854775808, "seqno": s * 2,
            "mc_block_seqno": s,
            "gen_utime": T0 + s * 500, "start_lt": 1_000_000 + (s - 1) * 5000,
            "end_lt": 1_000_000 + s * 5000,
            "tx_count": tx_count_by_mc[s],
            "key_block": False,
            "prev_blocks": [{"workchain": 0, "shard": -9223372036854775808,
                             "seqno": (s - 1) * 2}] if s > 1 else [],
        })
    _write(f"{out_dir}/blocks.parquet", blocks)

    _write(f"{out_dir}/traces.parquet", g.traces)

    # ---- account states: 1-4 versions per account; latest = max lt.
    # Every third account is a standard WALLET (published code hash +
    # well-formed data cell) so the wallet-family endpoints have real
    # decode work; the rest keep synthetic hashes (is_wallet = false).
    from ton_indexer_spark.functions.wallets import encode_wallet_data

    wallet_kinds = [
        ("hNr6RJ+Ypph3ibojI1gHK8D3bcRSQAKl0JGLmnXS1Zk=", "v3"),     # v3 r2
        ("/rX/aCDi/w2Ug+fg1iyBfYRniftK5YDIeIZtlZ2r1cA=", "v3"),     # v4 r2
        ("IINLe3KxEhR+Gy+0V7hOdNGjDwT3N9T2KmaOlVLSty8=", "v5"),     # v5 r1
        ("WHzHie/xyE9G7DeX5F/ICaFP9a4k8eDHpqmcydyQYf8=", "seqno"),  # v1 r3
    ]
    history = []
    for i, acc in enumerate(g.accounts):
        if i % 3 == 0:
            code_hash, layout = wallet_kinds[(i // 3) % len(wallet_kinds)]
        else:
            code_hash, layout = g.code_hashes[i % len(g.code_hashes)], None
        for v in range(1 + int(rng.integers(0, 4))):
            lt = int(rng.integers(1_000_000, g.lt))
            history.append({
                "account": acc,
                "hash": _hash("st", f"{acc}:{lt}"),
                "balance": int(rng.integers(0, 10**12)),
                "account_status": "active",
                "timestamp": T0 + (lt - 1_000_000) // 10,
                "last_trans_hash": _hash("tx", f"h{acc}:{lt}"),
                "last_trans_lt": lt,
                "frozen_hash": None,
                "data_hash": _hash("data", i),
                "code_hash": code_hash,
                # seqno derived from lt so a test can recompute the
                # expected value from any state row it selects
                "data_boc": (
                    encode_wallet_data(
                        layout, seqno=lt % 100_000, wallet_id=100 + i
                    )
                    if layout
                    else None
                ),
            })
    _write(f"{out_dir}/account_states_history.parquet", history)
    latest = {}
    for r in history:
        cur = latest.get(r["account"])
        if cur is None or (r["last_trans_lt"], r["hash"]) > (cur["last_trans_lt"], cur["hash"]):
            latest[r["account"]] = r
    _write(f"{out_dir}/latest_account_states.parquet", list(latest.values()))

    # ---- jetton dims
    masters = [{
        "address": _addr(1000 + i),
        "total_supply": int(rng.integers(10**9, 10**15)),
        "mintable": bool(i % 2),
        "admin_address": g.accounts[i],
        "jetton_content": json.dumps({"name": f"JET{i}", "symbol": f"J{i}"}),
        "jetton_wallet_code_hash": g.code_hashes[i % len(g.code_hashes)],
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
        "code_hash": g.code_hashes[i % len(g.code_hashes)],
        "data_hash": _hash("jmd", i),
    } for i in range(8)]
    _write(f"{out_dir}/jetton_masters.parquet", masters, decimals=("total_supply",))

    wallets = []
    for i in range(60):
        mintless = rng.random() < 0.1
        wallets.append({
            "address": _addr(2000 + i),
            "balance": 0 if rng.random() < 0.15 else int(rng.integers(1, 10**12)),
            "owner": g.accounts[int(rng.integers(0, len(g.accounts)))],
            "jetton": masters[int(rng.integers(0, len(masters)))]["address"],
            "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
            "code_hash": g.code_hashes[int(rng.integers(0, len(g.code_hashes)))],
            "data_hash": _hash("jwd", i),
            "mintless_is_claimed": bool(mintless and rng.random() < 0.5),
            "mintless_amount": int(rng.integers(1, 10**9)) if mintless else None,
            "mintless_start_from": T0 if mintless else None,
            "mintless_expire_at": T0 + 10**7 if mintless else None,
        })
    _write(f"{out_dir}/jetton_wallets.parquet", wallets,
           decimals=("balance", "mintless_amount"))

    # jetton transfer events decoded from ~opcode txs
    jt = []
    jt_txs = [t for t in g.txs if rng.random() < 0.15]
    for t in jt_txs:
        w = wallets[int(rng.integers(0, len(wallets)))]
        jt.append({
            "tx_hash": t["hash"], "tx_lt": t["lt"], "tx_now": t["now"],
            "tx_aborted": t["aborted"], "mc_seqno": t["mc_block_seqno"],
            "query_id": int(rng.integers(0, 2**63)),
            "amount": int(rng.integers(1, 10**10)),
            "source": w["owner"],
            "destination": g.accounts[int(rng.integers(0, len(g.accounts)))],
            "jetton_wallet_address": w["address"],
            "jetton_master_address": w["jetton"],
            "response_destination": w["owner"],
            "custom_payload": None,
            "forward_ton_amount": int(rng.integers(0, 10**7)),
            "forward_payload": None,
            "trace_id": t["trace_id"],
        })
    _write(f"{out_dir}/jetton_transfers.parquet", jt,
           decimals=("query_id", "amount", "forward_ton_amount"))

    # ---- NFT dims
    collections = [{
        "address": _addr(3000 + i),
        "next_item_index": 100,
        "owner_address": g.accounts[i],
        "collection_content": json.dumps({"name": f"COL{i}"}),
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
        "code_hash": g.code_hashes[i % len(g.code_hashes)],
        "data_hash": _hash("ncd", i),
    } for i in range(5)]
    _write(f"{out_dir}/nft_collections.parquet", collections,
           decimals=("next_item_index",))

    items = [{
        "address": _addr(4000 + i),
        "init": True,
        "index": i,
        "collection_address": (None if rng.random() < 0.1 else
                               collections[int(rng.integers(0, 5))]["address"]),
        "owner_address": g.accounts[int(rng.integers(0, len(g.accounts)))],
        "content": json.dumps({"name": f"NFT{i}"}),
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
        "code_hash": g.code_hashes[int(rng.integers(0, len(g.code_hashes)))],
        "data_hash": _hash("nid", i),
    } for i in range(40)]
    _write(f"{out_dir}/nft_items.parquet", items, decimals=("index",))

    nft_tr = []
    for i in range(60):
        t = g.txs[int(rng.integers(0, len(g.txs)))]
        it = items[int(rng.integers(0, len(items)))]
        old_owner = g.accounts[int(rng.integers(0, len(g.accounts)))]
        nft_tr.append({
            "tx_hash": t["hash"], "tx_lt": t["lt"], "tx_now": t["now"],
            "tx_aborted": t["aborted"], "mc_seqno": t["mc_block_seqno"],
            "query_id": int(rng.integers(0, 2**62)),
            "nft_item_address": it["address"],
            "nft_item_index": int(it["index"]),
            "nft_collection_address": it["collection_address"],
            "old_owner": old_owner,
            "new_owner": it["owner_address"],
            "response_destination": old_owner,
            "forward_amount": int(rng.integers(0, 10**7)),
            "trace_id": t["trace_id"],
        })
    _write(f"{out_dir}/nft_transfers.parquet", nft_tr,
           decimals=("query_id", "nft_item_index", "forward_amount"))

    sales = [{
        "address": _addr(5000 + i),
        "nft_address": items[int(rng.integers(0, len(items)))]["address"],
        "nft_owner_address": g.accounts[int(rng.integers(0, len(g.accounts)))],
        "full_price": int(rng.integers(10**8, 10**12)),
        "marketplace_address": _addr(5999),
        "marketplace_fee": int(rng.integers(10**6, 10**8)),
        "royalty_amount": int(rng.integers(10**5, 10**7)),
        "is_complete": bool(rng.random() < 0.3),
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
    } for i in range(10)]
    _write(f"{out_dir}/getgems_nft_sales.parquet", sales,
           decimals=("full_price", "marketplace_fee", "royalty_amount"))

    # ---- misc dims
    dns = []
    for i in range(30):
        owner = g.accounts[int(rng.integers(0, len(g.accounts)))]
        for d in range(1 + int(rng.integers(0, 3))):
            dom = f"{'x' * int(rng.integers(1, 12))}{i}.ton"
            dns.append({
                "nft_item_address": _addr(6000 + len(dns)),
                "nft_item_owner": owner,
                "domain": dom,
                "dns_wallet": owner,
                "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
            })
    _write(f"{out_dir}/dns_entries.parquet", dns)

    methods = [{
        "code_hash": ch,
        "methods": sorted(int(x) for x in
                          rng.choice(range(70000, 130000), size=5, replace=False)),
    } for ch in g.code_hashes]
    _write(f"{out_dir}/contract_methods.parquet", methods)

    meta = []
    for m in masters[:6]:
        meta.append({"address": m["address"], "type": "jetton_masters",
                     "name": f"Jetton {m['address'][:8]}", "symbol": "J",
                     "description": "synthetic", "image": None, "valid": True})
    for it in items[:20]:
        meta.append({"address": it["address"], "type": "nft_items",
                     "name": f"Item {it['address'][:8]}", "symbol": None,
                     "description": "synthetic", "image": None, "valid": True})
    for c in collections[:4]:
        meta.append({"address": c["address"], "type": "nft_collections",
                     "name": f"Col {c['address'][:8]}", "symbol": None,
                     "description": "synthetic", "image": None, "valid": True})
    _write(f"{out_dir}/address_metadata.parquet", meta)

    multisig = [{
        "address": _addr(7000 + i),
        "threshold": int(rng.integers(1, 4)),
        "signers": [g.accounts[int(x)] for x in rng.integers(0, len(g.accounts), 4)],
        "proposers": [g.accounts[int(x)] for x in rng.integers(0, len(g.accounts), 2)],
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
    } for i in range(5)]
    _write(f"{out_dir}/multisig.parquet", multisig)

    orders = [{
        "address": _addr(7100 + i),
        "multisig_address": multisig[i % len(multisig)]["address"],
        "order_seqno": i,
        "threshold": multisig[i % len(multisig)]["threshold"],
        "sent_for_execution": bool(i % 3 == 0),
        "approvals_num": int(rng.integers(0, 4)),
        "expiration_date": 1_800_000_000 + i * 1000,
        "signers": multisig[i % len(multisig)]["signers"],
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
    } for i in range(12)]
    _write(f"{out_dir}/multisig_orders.parquet", orders,
           decimals=("order_seqno",))

    vesting = [{
        "address": _addr(7200 + i),
        "vesting_start_time": 1_700_000_000 + i * 100,
        "vesting_total_duration": 86400 * 365,
        "unlock_period": 86400 * 30,
        "cliff_duration": 86400 * 90 if i % 2 else 0,
        "vesting_total_amount": int(rng.integers(10**9, 10**12)),
        "vesting_sender_address": g.accounts[int(rng.integers(0, len(g.accounts)))],
        "owner_address": g.accounts[int(rng.integers(0, len(g.accounts)))],
        "last_transaction_lt": int(rng.integers(1_000_000, g.lt)),
    } for i in range(6)]
    _write(f"{out_dir}/vesting_contracts.parquet", vesting,
           decimals=("vesting_total_amount",))
    whitelist = [{
        "vesting_contract_address": v["address"],
        "wallet_address": g.accounts[int(rng.integers(0, len(g.accounts)))],
    } for v in vesting for _ in range(2)]
    # primary key (contract, wallet): dedupe
    seen = set()
    whitelist = [w for w in whitelist
                 if not ((w["vesting_contract_address"], w["wallet_address"]) in seen
                         or seen.add((w["vesting_contract_address"], w["wallet_address"])))]
    _write(f"{out_dir}/vesting_whitelist.parquet", whitelist)

    # ---- actions + action_accounts (pre-classifier ground truth for plans)
    ACTION_TYPES = (["ton_transfer"] * 30 + ["call_contract"] * 25 +
                    ["jetton_transfer"] * 20 + ["jetton_swap"] * 8 +
                    ["nft_transfer"] * 5 + ["contract_deploy"] * 4 +
                    ["stake_deposit", "multisig_create_order", "dex_deposit_liquidity",
                     "auction_bid", "unknown"] * 1)
    tx_by_trace: dict[str, list[dict]] = {}
    for t in g.txs:
        tx_by_trace.setdefault(t["trace_id"], []).append(t)
    actions, action_accounts = [], []
    for tr in g.traces:
        if tr["state"] != "complete":
            continue
        txs = sorted(tx_by_trace[tr["trace_id"]], key=lambda t: t["lt"])
        n_actions = 1 + int(rng.integers(0, 2))
        parent_id = None
        parent_type = None
        for a in range(n_actions):
            sub = txs if n_actions == 1 else txs[a::n_actions] or txs
            atype = ACTION_TYPES[int(rng.integers(0, len(ACTION_TYPES)))]
            action_id = _hash("act", f"{tr['trace_id']}:{a}")
            src = sub[0]["account"]
            dst = sub[-1]["account"]
            is_child = a > 0 and rng.random() < 0.15
            row = {
                "trace_id": tr["trace_id"],
                "action_id": action_id,
                "start_lt": sub[0]["lt"], "end_lt": sub[-1]["lt"],
                "start_utime": sub[0]["now"], "end_utime": sub[-1]["now"],
                "trace_end_lt": tr["end_lt"], "trace_end_utime": tr["end_utime"],
                "trace_mc_seqno_end": tr["mc_seqno_end"],
                "source": src, "source_secondary": None,
                "destination": dst, "destination_secondary": None,
                "asset": ("TON" if atype == "ton_transfer" else
                          masters[int(rng.integers(0, len(masters)))]["address"]),
                "asset_secondary": None, "asset2": None, "asset2_secondary": None,
                "opcode": int(rng.choice([0, 0x0F8A7EA5, 0x5FCC3D14])),
                "tx_hashes": [t["hash"] for t in sub],
                "type": atype,
                "value": int(rng.integers(10**6, 10**12)),
                "amount": int(rng.integers(1, 10**10)),
                "success": bool(rng.random() < 0.92),
                "parent_action_id": parent_id if is_child else None,
                "ancestor_type": [parent_type] if is_child and parent_type else [],
            }
            actions.append(row)
            if not is_child:
                parent_id, parent_type = action_id, atype
            for acc in dict.fromkeys([src, dst]):
                action_accounts.append({
                    "action_id": action_id, "trace_id": tr["trace_id"],
                    "account": acc,
                    "trace_end_lt": tr["end_lt"], "action_end_lt": row["end_lt"],
                    "trace_end_utime": tr["end_utime"],
                    "action_end_utime": row["end_utime"],
                })
    _write(f"{out_dir}/actions.parquet", actions, decimals=("value", "amount"))
    _write(f"{out_dir}/action_accounts.parquet", action_accounts)
    return out_dir


if __name__ == "__main__":
    import sys

    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ton_fixture")
    print("ok")
