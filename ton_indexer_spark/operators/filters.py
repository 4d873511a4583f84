"""Filter builders (SURVEY.md §2.2 P2-P8).

The reference builds conjunctive WHERE clauses from request params
(ton-index-go/index/crud/crud.go:52-73 ``filterByArray``;
crud_transactions.go:56-69 range predicates).  Here every predicate is a
Column expression so Catalyst pushes it into the parquet scan (min/max and
dictionary pruning) — the Spark analog of the reference's 40 btree indexes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_by_array(df: DataFrame, col: str, values: Sequence | None) -> DataFrame:
    """``col = v`` / ``col IN (...)`` — crud.go:52-73 semantics.

    None or empty → no-op (the reference skips the clause entirely).
    """
    if not values:
        return df
    if len(values) == 1:
        return df.filter(F.col(col) == values[0])
    return df.filter(F.col(col).isin(list(values)))


def filter_range(
    df: DataFrame,
    col: str,
    lo=None,
    hi=None,
    lo_exclusive: bool = False,
    hi_exclusive: bool = False,
) -> DataFrame:
    """Half-open/closed range predicate (crud_transactions.go:56-69).

    Emitted as plain comparisons so parquet row-group min/max pruning fires.
    """
    c = F.col(col)
    preds: list[Column] = []
    if lo is not None:
        preds.append(c > lo if lo_exclusive else c >= lo)
    if hi is not None:
        preds.append(c < hi if hi_exclusive else c <= hi)
    for p in preds:
        df = df.filter(p)
    return df
