"""Top-K by measure (SURVEY.md §2.4 A4) — crud_accounts.go:223.

``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject: each task keeps
a k-row heap, the driver merges — no global sort, no shuffle of the full
table.  That is exactly the plan we want at 100 TB, so this helper exists
mainly to pin the deterministic tiebreaker contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    measure: str,
    k: int,
    ascending: bool = False,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    order = [F.col(measure).asc() if ascending else F.col(measure).desc()]
    order += [F.col(t).asc() for t in tiebreakers]
    return df.orderBy(*order).limit(k)
