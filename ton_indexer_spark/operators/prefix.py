"""Distributed global prefix sum + sequence packing.

A training-data pipeline packs documents into fixed token-budget bins
(sequence packing for LLM pretraining batches).  The contiguous-cumsum
scheme — bin = floor(exclusive_prefix_sum / budget) over a deterministic
document order — is the standard scalable formulation: it preserves
order, wastes at most one document's tokens per boundary, and reduces to
a global running sum.

A naive `Window.orderBy(key)` running sum collapses everything into ONE
window partition (single task — the classic Spark scale trap).  The
scale path is the textbook two-phase distributed prefix sum:

1. range-repartition by the order key (so partition p holds a contiguous
   key range), cumsum within each partition via a window partitioned by
   `spark_partition_id()` — parallel;
2. one tiny aggregation of per-partition totals → exclusive offsets,
   broadcast-joined back and added — O(#partitions) driver data.

The result is independent of where the range boundaries land, so the
operator is deterministic even though the range sampler is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_col`` order (order must be a unique key for determinism)."""
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_local_sum", F.sum(value_col).over(w))
    # per-partition totals -> exclusive offset per partition (tiny table).
    # Sum value_col directly (NOT max(_local_sum)): max of the running sum
    # equals the partition total only for non-negative values, and this
    # operator is generic (balance deltas etc. may be negative).
    totals = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_total"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_total").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(totals), "_pid")
        .withColumn(out_col, F.col("_local_sum") + F.col("_offset"))
        .drop("_pid", "_local_sum", "_offset")
    )


def sequence_pack(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a pack/bin id: bin = floor(exclusive_cumsum/budget)
    over ``order_col`` order — contiguous token-budget packing."""
    with_sum = global_running_sum(df, order_col, tokens_col, "_incl_sum")
    return (
        with_sum.withColumn(
            bin_col,
            # integer division: exact in both engines (token counts >= 0)
            F.expr(f"(_incl_sum - `{tokens_col}`) div {int(budget)}"),
        )
        .drop("_incl_sum")
    )
