"""Parquet table catalog.

The reference serves 40+ REST endpoints over a fixed relational schema
(ton-index-worker/ton-index-postgres/src/migrate.cpp:114-699).  Our engine's
equivalent of "the database" is a directory of parquet tables; this module
loads them lazily and registers temp views so both the DataFrame API and
spark.sql() target the same relations.

Works for the driver's TPC-H-ish testdata (region nation customer supplier
part orders lineitem events documents embeddings) and for TON-schema fixture
directories produced by tests/fixture_gen.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy loader for a directory of ``<name>.parquet`` tables.

    Timestamp policy: parquet TIMESTAMP(NANOS) columns are rejected by the
    vectorized Spark reader and silently truncated to micros by DuckDB, so
    the engine normalizes them to epoch-MICROSECOND BIGINTs (read via
    ``spark.sql.legacy.parquet.nanosAsLong``, then integer-divided by 1000).
    That mirrors the reference's own convention — integer unix-seconds /
    logical-time columns (migrate.cpp:73) — and makes every time comparison
    exact integer arithmetic (oracle side: ``epoch_us(col)``).
    Milli/micro parquet timestamps stay native (exact in both engines).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin the session timezone: TIMESTAMP_NTZ arithmetic (timecols.
        # epoch_us) resolves through NTZ→TIMESTAMP casts that use the
        # session zone; under a DST zone the epoch literal and a summer
        # value would cast with different offsets.  UTC makes every NTZ
        # difference exact and bit-identical to DuckDB's naive epoch_us,
        # whatever zone the driver process inherited.
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def _nanos_cols(self, name: str) -> list[str]:
        import pyarrow.dataset as pads
        import pyarrow.types as pat

        # dataset() handles both single parquet files (driver testdata) and
        # Spark-written directories (this engine's own sinks)
        schema = pads.dataset(self.path(name), format="parquet").schema
        return [
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def has(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            df = self.spark.read.parquet(self.path(name))
            for c in self._nanos_cols(name):
                # epoch-nanos long → epoch-micros long (integer division —
                # a double roundtrip would lose precision past 2^53)
                df = df.withColumn(c, F.expr(f"`{c}` div 1000"))
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        # catalog.lineitem sugar; raises for genuinely unknown attrs
        if name.startswith("_"):
            raise AttributeError(name)
        if self.has(name):
            return self.table(name)
        raise AttributeError(f"no table {name!r} under {self.sf_dir}")

    def register_views(self, names: tuple[str, ...] | None = None) -> None:
        """Register temp views so spark.sql() can reference tables by name."""
        for name in names or self.available():
            self.table(name).createOrReplaceTempView(name)

    def available(self) -> tuple[str, ...]:
        return tuple(
            f[: -len(".parquet")]
            for f in sorted(os.listdir(self.sf_dir))
            if f.endswith(".parquet")
        )
