"""End-to-end walkthrough: what a user of the reference stack gets here.

Reference deployment: C++ worker → Postgres → Go API + Python classifier +
Redis overlay.  This engine: ONE Spark application —

    1. ingest a stream of raw blocks' transactions+messages (file drops),
       assembling traces statefully with pending-state snapshots;
    2. classify finalized traces into semantic actions in the same
       micro-batch, maintain latest-state dimensions, publish push events;
    3. serve every /api/v3-style query as a DataFrame/SQL plan over the
       resulting parquet tables.

Run:  python examples/end_to_end.py   (~2 min on local[32])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from tests.fixture_gen import generate  # noqa: E402
from ton_indexer_spark import plans  # noqa: E402
from ton_indexer_spark.catalog import Catalog  # noqa: E402
from ton_indexer_spark.session import get_spark  # noqa: E402
from ton_indexer_spark.streaming.ingest import IngestPipeline  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="end_to_end_demo")
    work = tempfile.mkdtemp(prefix="ton_demo_")
    print(f"== generating synthetic chain data under {work}")
    fx = generate(os.path.join(work, "raw"), n_traces=500)

    # ---- 1+2. streaming ingest (two in-order drops) -----------------------
    raw_txs = spark.read.parquet(f"{fx}/transactions.parquet").drop("trace_id")
    raw_msgs = spark.read.parquet(f"{fx}/messages.parquet").drop("trace_id")
    seqs = sorted(r[0] for r in raw_txs.select("mc_block_seqno").distinct().collect())
    mid = seqs[len(seqs) // 2]
    src_tx = os.path.join(work, "src_tx")
    raw_txs.filter(F.col("mc_block_seqno") <= mid).coalesce(1).write.parquet(src_tx)
    raw_txs.filter(F.col("mc_block_seqno") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src_tx)
    src_msg = os.path.join(work, "src_msg")
    raw_msgs.write.parquet(src_msg)

    events: dict[str, int] = {}
    pipe = IngestPipeline(
        spark,
        out_dir=os.path.join(work, "db"),
        state_dir=os.path.join(work, "state"),
        classify=True,
        message_contents=spark.read.parquet(f"{fx}/message_contents.parquet"),
        jetton_wallets=spark.read.parquet(f"{fx}/jetton_wallets.parquet"),
        nft_items=spark.read.parquet(f"{fx}/nft_items.parquet"),
        publisher=lambda ch, p: events.__setitem__(ch, events.get(ch, 0) + len(p)),
    )
    pipe.run_available_now(src_tx, src_msg, os.path.join(work, "ckpt"))
    print(f"== ingested; push events published: {events}")

    traces = spark.read.parquet(os.path.join(work, "db", "traces"))
    actions = spark.read.parquet(os.path.join(work, "db", "actions"))
    print("== traces by state:")
    traces.groupBy("state").count().orderBy("state").show()
    print("== actions by type:")
    actions.groupBy("type").count().orderBy(F.desc("count")).show()

    # ---- 3. the query surface over the ORIGINAL fixture tables ------------
    cat = Catalog(spark, fx)
    print("== GET /transactions?account=...&limit=3 (with message enrichment)")
    acc = cat.transactions.groupBy("account").count().orderBy(
        F.desc("count")).first()["account"]
    plans.transactions_query(cat, accounts=[acc], limit=3).select(
        "hash", "lt", "account", F.size("out_msgs").alias("n_out")
    ).show(truncate=60)
    print("== GET /traces?account=...&limit=3 (hydrated)")
    plans.traces_query(cat, account=acc, limit=3).select(
        "trace_id", "state", "nodes_", F.size("transactions").alias("n_txs")
    ).show(truncate=40)
    print("== address book (shortest-domain rule):")
    plans.address_book(cat).filter(F.col("domain").isNotNull()).show(
        5, truncate=40
    )

    # ---- 4. raw-BOC ingest projection (the worker-side flatten) -----------
    # real chain dumps enter as BOC-encoded transaction cells; the parse
    # stage reproduces the reference worker's DataParser flatten
    import base64

    from ton_indexer_spark.functions.boc import serialize_boc
    from ton_indexer_spark.functions.tx_parse import (
        encode_message_cell,
        encode_ord_descr,
        encode_transaction_cell,
    )
    from ton_indexer_spark.sources.tx_ingest import parse_raw_transactions

    cell = encode_transaction_cell(
        int("ab" * 32, 16), 1_000_100, 1_700_000_000,
        in_msg=encode_message_cell(
            "0:" + "cd" * 32, "0:" + "ab" * 32, value=10**9,
            created_lt=1_000_000, created_at=1_700_000_000,
        ),
        descr=encode_ord_descr(),
    )
    raw = spark.createDataFrame(
        [(base64.b64encode(serialize_boc(cell)).decode(),)], "boc string"
    )
    parsed = parse_raw_transactions(raw)
    print("== raw BOC cell → flat transaction row:")
    parsed.select("account", "lt", "now", "orig_status", "end_status",
                  "compute_success").show(truncate=40)

    # ---- 5. offchain metadata seam (derived queue → fetch → LWW merge) ----
    from ton_indexer_spark.sources.metadata import (
        fetch_address_metadata,
        metadata_fetch_tasks,
    )
    from ton_indexer_spark.sources.writer import merge_dimension

    content = cat.jetton_masters.select(
        "address", F.lit("jetton_masters").alias("type"),
        F.concat(F.lit("https://meta.example/"), F.col("address"))
        .alias("content_uri"),
    ).limit(5)
    md_path = os.path.join(work, "db", "address_metadata_fetched")
    merge_dimension(
        spark,
        fetch_address_metadata(metadata_fetch_tasks(content), now=1),
        md_path, key=["address", "type"], version_col="updated_at",
    )
    print("== fetched token metadata (deterministic fake fetcher):")
    spark.read.parquet(md_path).select(
        "address", "name", "symbol", "valid").show(5, truncate=40)
    print(f"done. artifacts under {work}")


if __name__ == "__main__":
    main()
