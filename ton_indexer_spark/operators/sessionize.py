"""Gap-based sessionization (time-window analog of SURVEY.md §2.8 T2).

The reference sessions by message-hash causality, not by time gap; we still
ship a time-gap sessionizer because (a) it is the standard Spark session
primitive the "beyond-reference" analytics need, and (b) it shares the
window machinery the trace assembler's batch variant uses.

Pure window algebra — SQL-expressible, so the DuckDB oracle can verify it:
new_session = (ts - lag(ts) > gap); session ordinal = running sum of flags.
One shuffle on the entity key; the running sum is computed inside the same
window, so no second exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_by_gap(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: int,
    tiebreakers: Sequence[str] = (),
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-entity session ordinal (1-based) by inactivity gap.

    ``ts_col`` may be integer epoch-micros or any timestamp/date type —
    it is normalized through :func:`functions.timecols.epoch_us`; ``gap``
    is epoch-micros.  Integer arithmetic throughout: a double conversion
    of epoch-micros would lose precision past 2^53.
    """
    from ton_indexer_spark.functions.timecols import epoch_us

    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(entity_col).orderBy(*order)
    ts = epoch_us(df, ts_col)
    prev = F.lag(ts).over(w)
    new_flag = F.when(prev.isNull() | ((ts - prev) > F.lit(int(gap))), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
