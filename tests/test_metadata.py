"""S8 offchain metadata fetch seam: derived queue + Arrow-batched fetcher
+ bucket-pruned LWW merge (reference ton-metadata-fetcher/main.go)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ton_indexer_spark.sources.metadata import (
    FAKE_FETCHER,
    fetch_address_metadata,
    metadata_fetch_tasks,
)
from ton_indexer_spark.sources.writer import merge_dimension

A = [f"0:{i:064x}" for i in range(6)]


def _content(spark):
    rows = [
        (A[0], "jetton_masters", "https://example.org/j0.json"),
        (A[1], "jetton_masters", "ipfs://bafy/j1.json"),
        (A[2], "nft_collections", "https://example.org/bad.json"),  # fails
        (A[3], "nft_collections", None),  # onchain-only: never queued
    ]
    return spark.createDataFrame(
        rows, "address string, type string, content_uri string")


def test_queue_fetch_merge_requeue_cycle(spark, tmp_path):
    content = _content(spark)
    path = str(tmp_path / "address_metadata")

    # 1. cold queue: every row with a uri
    tasks = metadata_fetch_tasks(content)
    assert tasks.count() == 3

    # 2. fetch (deterministic fake) → merge
    fetched = fetch_address_metadata(tasks, now=1000, ttl_s=500,
                                     invalid_retry_s=50)
    merge_dimension(spark, fetched, path, key=["address", "type"],
                    version_col="updated_at")
    md = spark.read.parquet(path)
    got = {r["address"]: r for r in md.collect()}
    assert got[A[0]]["valid"] and got[A[0]]["name"].startswith("Token ")
    assert got[A[0]]["image"].endswith("/image.png")
    assert got[A[0]]["expires_at"] == 1500
    assert not got[A[2]]["valid"] and got[A[2]]["expires_at"] == 1050

    # 3a. inside the failure-backoff window NOTHING requeues — the short
    # expiry on the invalid row is the retry_at backoff (main.go:141-153)
    backoff = metadata_fetch_tasks(content, spark.read.parquet(path), now=1040)
    assert backoff.count() == 0

    # 3b. warm queue: only the failed row re-enters after its short expiry
    again = metadata_fetch_tasks(content, spark.read.parquet(path), now=1100)
    assert {r["address"] for r in again.collect()} == {A[2]}

    # 4. after TTL both expire and requeue
    later = metadata_fetch_tasks(content, spark.read.parquet(path), now=2000)
    assert later.count() == 3

    # 5. refetch + merge is idempotent and LWW on updated_at
    fetched2 = fetch_address_metadata(again, now=1100)
    merge_dimension(spark, fetched2, path, key=["address", "type"],
                    version_col="updated_at")
    md2 = spark.read.parquet(path)
    assert md2.count() == 3  # upsert, not append
    assert md2.filter(F.col("address") == A[2]).first()["updated_at"] == 1100


def test_fetcher_contract_enforced(spark):
    def bad_fetcher(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[["address", "type"]].assign(valid=True)

    tasks = metadata_fetch_tasks(_content(spark))
    import pytest

    with pytest.raises(Exception, match="omitted columns"):
        fetch_address_metadata(tasks, fetcher=bad_fetcher).collect()


def test_fake_fetcher_deterministic():
    pdf = pd.DataFrame({
        "address": [A[0], A[0]],
        "type": ["jetton_masters"] * 2,
        "content_uri": ["https://x/a.json"] * 2,
    })
    r1, r2 = FAKE_FETCHER(pdf).iloc[0], FAKE_FETCHER(pdf).iloc[1]
    assert r1["name"] == r2["name"] and r1["symbol"] == r2["symbol"]
