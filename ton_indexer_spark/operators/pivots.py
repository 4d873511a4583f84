"""Conditional-aggregation pivot (SURVEY.md §2.4 A1).

The reference stores each internal message twice (direction in/out) and
folds the pair back into one row per msg_hash with
``max(CASE WHEN direction='in' THEN tx_hash END)`` etc.
(ton-index-go/index/crud/crud_messages.go:25-29).  Generic form: group by a
key, one max(when(tag==v, payload)) column per (tag value, payload) pair —
a single map-side-combinable aggregation (no join, no second shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inout_pivot(
    df: DataFrame,
    group_by: Sequence[str],
    tag_col: str,
    tag_values: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """One output column ``{tag}_{payload}`` per (tag value × payload col)."""
    aggs = []
    for tag in tag_values:
        for payload in payload_cols:
            aggs.append(
                F.max(F.when(F.col(tag_col) == tag, F.col(payload))).alias(
                    f"{tag}_{payload}"
                )
            )
    return df.groupBy(*group_by).agg(*aggs)
