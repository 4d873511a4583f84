"""Structured-Streaming plane (SURVEY.md §2.8).

- trace_assembler: incremental stateful trace sessionization (T2/T3/T4);
- ingest: micro-batch ingest pipeline wiring (T1/T5/T8) — source →
  derived-table maintenance → idempotent sinks via foreachBatch.
"""

from ton_indexer_spark.streaming.trace_assembler import IncrementalTraceAssembler

__all__ = ["IncrementalTraceAssembler"]
