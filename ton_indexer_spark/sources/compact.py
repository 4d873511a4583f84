"""Small-file compaction for streaming-append fact tables.

Micro-batch appends produce one file set per batch; at 100 TB that decays
scan performance (footer overhead, tiny row groups) and the reference's
equivalent is ClickHouse background merges.  `compact_facts` rewrites each
partition directory whose file count exceeds a threshold into
size-targeted files, preserving the in-file sort (the pruning contract of
sources/writer.py), with the same atomic directory swap readers rely on.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession

from ton_indexer_spark.sources.writer import atomic_replace


def partition_dirs(path: str) -> list[str]:
    return sorted(
        d for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    )


def compact_facts(
    spark: SparkSession,
    path: str,
    sort_cols: Sequence[str],
    max_files_per_partition: int = 8,
    target_rows_per_file: int = 5_000_000,
) -> dict[str, int]:
    """Compact each over-fragmented `mc_bucket=<n>` partition dir in place.
    Returns {partition: files_before} for the partitions rewritten."""
    rewritten: dict[str, int] = {}
    for part in partition_dirs(path):
        pdir = os.path.join(path, part)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) <= max_files_per_partition:
            continue
        df = spark.read.parquet(pdir)
        n = df.count()
        n_files = max(1, n // target_rows_per_file)
        compacted = df.repartition(n_files).sortWithinPartitions(*sort_cols)
        atomic_replace(compacted, pdir)
        rewritten[part] = len(files)
    return rewritten
