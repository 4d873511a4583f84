"""As-of join (point-in-time join) — beyond-reference operator.

The reference materializes nearest-state-at-time instead of joining
(``latest_account_states`` + per-tx before/after hashes — SURVEY.md §2.3
'absent' row); a training-data pipeline needs the general operator: for
every left row, the most recent right row with the same key and
``right.ts <= left.ts`` (backward direction, pandas ``merge_asof``
semantics with ``allow_exact_matches=True``).

Scale shape: the naive formulation is a range join (cartesian per key,
O(n·m) worst case — Spark plans it as BroadcastNestedLoop).  This
implementation is the **union trick**: tag both sides, union, and take a
running ``last(value, ignorenulls=True)`` over a window partitioned by
key and ordered by (ts, side).  ONE shuffle on the key, O((n+m) log(n+m))
per partition sort, no pair explosion — the plan that survives 100×.
Skewed keys shard like any window (salt upstream if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Left rows + ``value_cols`` of the latest right row at-or-before
    ``ts_col`` with equal ``by`` keys (null when none exists).

    ``tolerance`` — optional max staleness in ts units: matches older
    than ``left.ts - tolerance`` are nulled (pandas merge_asof
    ``tolerance=``).  Right-side ts is exposed as ``asof_ts`` for it.

    ``seq_col`` — optional globally-unique column present on BOTH inputs
    (e.g. an event id) used as the final window tiebreaker, making the
    winner among equal-timestamp right rows deterministic (highest seq).
    Without it, equal-ts right rows pick an arbitrary winner.
    """
    by = list(by)
    lcols = left.columns
    l_tag = left.withColumn("_side", F.lit(1))
    r_keep = [seq_col] if seq_col else []
    r_tag = right.select(
        *by,
        *r_keep,
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_side", F.lit(0))

    # align schemas for the union: left carries null right-values, right
    # carries null left-payload
    for c in lcols:
        if c not in by and c != ts_col and c not in r_keep:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tag = r_tag.withColumn(ts_col, F.col("_r_ts"))
    for c in value_cols:
        l_tag = l_tag.withColumn(
            f"_r_{c}", F.lit(None).cast(right.schema[c].dataType)
        )
    l_tag = l_tag.withColumn(
        "_r_ts", F.lit(None).cast(right.schema[ts_col].dataType)
    )
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows sort BEFORE left rows at equal ts (side 0 < 1) — exact
    # matches are visible, merge_asof allow_exact_matches=True
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if seq_col:
        order.append(F.col(seq_col).asc())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = F.col("asof_ts") < (F.col(ts_col) - F.lit(tolerance))
        out = out.select(
            *lcols,
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias(
                "asof_ts"
            ),
            *[
                F.when(stale, F.lit(None))
                .otherwise(F.col(f"asof_{c}"))
                .alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return out
