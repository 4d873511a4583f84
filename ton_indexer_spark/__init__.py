"""ton_indexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of toncenter/ton-indexer.

Not a port: the reference (C++/Go/Python over Postgres/ClickHouse) tells us
WHAT to compute; this package re-expresses it Spark-first:

- ``session``     — tuned SparkSession factory (AQE, Arrow, shuffle sizing).
- ``catalog``     — parquet table catalog (the driver's TPC-H-ish testdata and
                    TON-schema tables alike).
- ``schemas``     — StructTypes for the TON data model (SURVEY.md §1).
- ``operators/``  — generic relational operators from SURVEY.md §2
                    (filters, pagination, windows, pivots, top-k, joins,
                    sessionization, connected components).
- ``plans/``      — endpoint-shaped query builders mirroring the reference's
                    REST surface (transactions, messages, actions, traces…).
- ``streaming/``  — Structured Streaming ingest + stateful trace assembly.
- ``classifier/`` — trace → actions pattern-matching DSL (grouped pandas UDF).
- ``dedup/``, ``similarity/``, ``functions/``, ``multimodal/`` — the
  training-data-pipeline operator set (minhash/simhash/ngram dedup, ANN,
  text quality/langid/tokenize/fingerprint, binary-column plumbing).
- ``queries/``    — the registry binding each implemented operator to a
                    (PySpark builder, DuckDB oracle SQL) pair consumed by
                    ``__spark_entry__`` and the driver's correctness gate.
"""

__version__ = "0.1.0"
