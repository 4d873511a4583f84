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

1. bucket rows by contiguous key range, cumsum within each bucket via a
   window partitioned by the bucket id — parallel;
2. one tiny aggregation of per-bucket totals → exclusive offsets,
   broadcast-joined back and added — O(#buckets) driver data.

Bucket ids are a DETERMINISTIC function of the key: range boundaries
come from one `percentile_approx` pass, collected (n_buckets-1 scalars,
a bounded driver collect) and baked into the plan as literals.  An
earlier version derived the bucket from ``spark_partition_id()`` after
``repartitionByRange`` — wrong at scale: the plan references the
bucketed frame TWICE (totals + the final join), and when the exchange
is not reused each execution re-SAMPLES the range boundaries, so the
offsets were computed against a different partitioning than they were
joined to (caught by the sf1 oracle sweep; invisible at small sf where
the sampler sees the full data).  With data-derived bucket ids every
branch agrees by construction and correctness is independent of
physical partitioning; where the boundaries land only affects balance.
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
    ``order_col`` order (order must be a unique NUMERIC key — unique for
    determinism, numeric for the percentile bucketing)."""
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # one cheap sketch pass; the collect is n_partitions-1 scalars
    probs = [i / n_partitions for i in range(1, n_partitions)]
    row = df.select(
        F.percentile_approx(order_col, probs, 10_000).alias("b")
    ).first()
    bounds = sorted(set(row["b"])) if row is not None and row["b"] else []
    if bounds:
        arr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(arr, lambda x: x < F.col(order_col)))
    else:
        bucket = F.lit(0)  # empty/constant input: single tiny bucket
    bucketed = df.withColumn("_pid", bucket)
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_local_sum", F.sum(value_col).over(w))
    # per-bucket totals -> exclusive offset per bucket (tiny table).
    # Sum value_col directly (NOT max(_local_sum)): max of the running sum
    # equals the bucket total only for non-negative values, and this
    # operator is generic (balance deltas etc. may be negative).
    totals = (
        bucketed.groupBy("_pid")
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
