"""Type-robust epoch-microsecond extraction.

The engine's time convention is epoch-micros BIGINT (mirrors the
reference's integer unix-seconds / logical-time columns,
migrate.cpp:73), but driver-generated parquet has shipped the same
logical column as epoch-micros int64, TIMESTAMP(NANOS), and
TIMESTAMP(MICROS)/TIMESTAMP_NTZ across rounds.  Every query that does
time *arithmetic* goes through :func:`epoch_us` so the plan is exact
integer math regardless of the physical type, and — critically — free
of the driver session's timezone: TIMESTAMP_NTZ is differenced against
the NTZ epoch literal, never cast through a zoned timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_us(df: DataFrame, col: str) -> Column:
    """Return ``col`` as epoch-microseconds BIGINT, whatever its type.

    - integer types: passthrough (already the engine's micros convention)
    - TIMESTAMP_NTZ: NTZ-epoch ``timestampdiff`` — timezone-free, exact
    - TIMESTAMP (zoned): ``unix_micros`` (absolute instant, tz-free)
    - DATE: midnight of that day, NTZ semantics
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (LongType, IntegerType, ShortType)):
        return c.cast("long")
    if isinstance(dt, TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)")
    if isinstance(dt, TimestampType):
        return F.unix_micros(c)
    if isinstance(dt, DateType):
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, CAST(`{col}` AS TIMESTAMP_NTZ))"
        )
    if isinstance(dt, (DoubleType, FloatType, DecimalType)):
        return c.cast("long")
    raise TypeError(f"epoch_us: unsupported type {dt} for column {col!r}")
