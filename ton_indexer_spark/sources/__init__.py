"""Sources & sinks: parquet fact/dimension writers and streaming wiring."""

from ton_indexer_spark.sources.writer import merge_dimension, write_facts

__all__ = ["write_facts", "merge_dimension"]
