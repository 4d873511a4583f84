"""Window-function operators (SURVEY.md §2.5 W1-W4).

The reference expresses these structurally (DISTINCT ON, writer-side
max-lt upsert, precomputed prev pointers, app-side tree assembly); in Spark
they are all one Window spec away.  All helpers require a total order inside
each partition (caller passes unique tiebreakers) so results are
deterministic under any physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering(order_by: Sequence[tuple[str, str]]) -> list[Column]:
    out = []
    for name, direction in order_by:
        c = F.col(name)
        out.append(c.desc() if direction.lower() == "desc" else c.asc())
    return out


def first_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[tuple[str, str]],
) -> DataFrame:
    """DISTINCT ON / first-row-per-group (W1) — crud.go:297-300 (shortest
    domain per owner), crud_actions_v2.go:347-350 (post-join dedup).

    row_number over (partition, total order) == 1.  This shuffles once on
    the partition keys; at scale prefer partition keys aligned with the
    table's storage partitioning so AQE can keep it local.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_ordering(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[tuple[str, str]],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Value-ranked top-N per group (the N>1 generalization of
    ``first_per_group``): row_number over (partition, total order) <= n.

    One shuffle on the partition keys; each group ranks independently, so
    the sort parallelizes across groups — there is no global TakeOrdered
    here because the limit is PER GROUP.  ``rank_col`` optionally keeps
    the 1-based rank in the output."""
    w = Window.partitionBy(*partition_by).orderBy(*_ordering(order_by))
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= n
    )
    if rank_col is not None:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def latest_by(
    df: DataFrame,
    key: Sequence[str],
    version_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Last-writer-wins versioning (W2) — the Spark analog of the writer-side
    max-``last_transaction_lt`` dedup (InsertManagerPostgres.cpp:1019-1460)
    and ClickHouse ``ReplacingMergeTree(ver)`` (InsertManagerClickhouse.cpp:253).

    Used both as a query-time view over append-only history and as the
    write-time compaction in sources/writer.py.
    """
    order = [(version_col, "desc")] + [(t, "desc") for t in tiebreakers]
    return first_per_group(df, key, order)


def with_prev_pointer(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[tuple[str, str]],
    cols: Sequence[str],
    prefix: str = "prev_",
) -> DataFrame:
    """Precomputed lag() pointers (W3) — the reference stores
    ``prev_trans_hash/prev_trans_lt`` on every transaction (migrate.cpp:170-171);
    we compute them at ingest with one window pass per account chain.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_ordering(order_by))
    for c in cols:
        df = df.withColumn(f"{prefix}{c}", F.lag(c).over(w))
    return df


def ordered_collect(
    df: DataFrame,
    group_by: Sequence[str],
    sort_cols: Sequence[str],
    payload_cols: Sequence[str],
    out_col: str = "items",
) -> DataFrame:
    """Ordered assembly within a group (W4) — the reference sorts a trace's
    transactions by (lt, account) app-side before linking them into a tree
    (crud_traces.go:389-420).  Spark shape: collect structs with the sort
    key leading, then array_sort — a single aggregation, no second shuffle.
    """
    struct_cols = [F.col(c) for c in list(sort_cols) + [c for c in payload_cols if c not in sort_cols]]
    return df.groupBy(*group_by).agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias(out_col)
    )
