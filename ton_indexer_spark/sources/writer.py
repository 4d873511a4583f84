"""Parquet writers implementing the reference's two write disciplines
(SURVEY.md §2.1 S3/S4).

1. **Fact append** (blocks/transactions/messages/traces/actions): the
   reference bulk-COPYs per seqno into Postgres and mirrors into ClickHouse
   with explicit ORDER BY sort keys (InsertManagerClickhouse.cpp:186,219).
   Spark analog: append-mode parquet partitioned by a coarse time bucket
   (``mc_bucket = mc_seqno div bucket_size``) with rows pre-sorted *within
   partitions* by the query-path sort key — parquet row-group min/max then
   prunes both by partition (time) and by sort column (lt/hash point
   lookups), replacing the reference's 40 btree indexes.

2. **Dimension last-writer-wins merge** (latest_account_states, jetton
   wallets, NFT items, …): the reference upserts keeping max
   ``last_transaction_lt`` (InsertManagerPostgres.cpp:1019-1460), ClickHouse
   uses ReplacingMergeTree(ver).  Spark analog: read-current ∪ delta →
   window-latest per key → atomic directory swap.  Idempotent (re-running a
   batch converges to the same table state — the reference's ON CONFLICT
   fallback, :1746-1748).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_indexer_spark.operators.windows import latest_by

DEFAULT_BUCKET = 1_000_000


def with_mc_bucket(df: DataFrame, seqno_col: str = "mc_block_seqno",
                   bucket_size: int = DEFAULT_BUCKET) -> DataFrame:
    return df.withColumn("mc_bucket", F.expr(f"`{seqno_col}` div {bucket_size}"))


def write_facts(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    seqno_col: str = "mc_block_seqno",
    bucket_size: int = DEFAULT_BUCKET,
) -> None:
    """Append facts partitioned by mc_bucket, sorted within partitions."""
    out = with_mc_bucket(df, seqno_col, bucket_size)
    (
        out.repartition("mc_bucket")
        .sortWithinPartitions(*sort_cols)
        .write.mode("append")
        .partitionBy("mc_bucket")
        .parquet(path)
    )


def merge_dimension(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    key: Sequence[str],
    version_col: str = "last_transaction_lt",
    tiebreakers: Sequence[str] = (),
) -> None:
    """Last-writer-wins upsert of ``delta`` into the dimension at ``path``.

    Atomicity: the merged table is written to a temp dir then swapped in —
    a reader never sees a half-written table (single-writer assumption, as
    in the reference's per-seqno transactional insert).
    """
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.unionByName(delta, allowMissingColumns=True)
    else:
        merged = delta
    latest = latest_by(merged, key, version_col, tiebreakers=tiebreakers)
    atomic_replace(latest, path)


def replace_by_key(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    key: Sequence[str],
) -> None:
    """Replace all rows sharing a key with ``delta``'s rows — the engine's
    reclassification primitive (the reference deletes-then-reinserts actions
    per trace, indexer/event_classifier.py:261-267).  Idempotent: applying
    the same delta twice converges.  Implemented as anti-join ∪ delta with
    an atomic swap, so readers see either the old or the new classification
    of a trace, never a mix."""
    if os.path.exists(path):
        current = spark.read.parquet(path)
        keep = current.join(delta.select(*key).distinct(), list(key), "left_anti")
        merged = keep.unionByName(delta, allowMissingColumns=True)
    else:
        merged = delta
    atomic_replace(merged, path)


def atomic_replace(df: DataFrame, path: str) -> None:
    """Write ``df`` (whose plan may read from ``path``) to a temp dir, then
    swap directories.  Needed whenever a table is rebuilt from itself —
    a plain overwrite deletes the input files before the lazy plan reads
    them.  Readers never observe a half-written table."""
    atomic_replace_many([(df, path)])


def atomic_replace_many(pairs: Sequence[tuple[DataFrame, str]]) -> None:
    """atomic_replace for several tables whose plans may read EACH OTHER's
    current files: all temp writes execute before any directory is swapped."""
    staged = []
    for df, path in pairs:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        staged.append((tmp, path))
    for tmp, path in staged:
        old = f"{path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
