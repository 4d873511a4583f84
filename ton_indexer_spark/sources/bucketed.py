"""Bucketed (co-located) table layout for shuffle-free joins.

The hottest join in the engine is messages-out ⋈ messages-in on msg_hash
(trace assembly) and messages ⋈ transactions on (tx_hash) — at 100 TB these
shuffle the full fact tables every run.  Writing both sides bucketed by the
join key (`bucketBy` + `saveAsTable`) makes the join a zero-exchange
sort-merge: each bucket pairs with its counterpart, and Spark plans no
Exchange at all (verified in tests/test_explain.py).

This is the Spark analog of the reference's co-located ClickHouse sort keys
(InsertManagerClickhouse.cpp:186,219) and the design SURVEY.md §4 calls for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table (spark-warehouse)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
