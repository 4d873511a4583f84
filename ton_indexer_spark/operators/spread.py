"""Scale-adaptive input spreading for CPU-heavy map-side operators.

Several operators in this engine are deliberately map-side only (shingle
arrays, MinHash signatures, SimHash votes, model scoring): at the 100 TB
design point the corpus scan is thousands of tasks and a narrow map is
the cheapest possible plan.  On a SMALL input, though, the same plan
collapses onto however many tasks the scan yields — a sub-128 MB parquet
file is ONE split, so the whole CPU-heavy map runs serially while the
rest of the cluster idles (measured: the map-side MinHash signature at
sf0.1 ran 5× slower than a shuffle-based one purely because the scan was
a single task).

``spread_small`` is the guard: when (and only when) the input has fewer
partitions than the session's parallelism, round-robin repartition it so
downstream map work uses every core.  The decision is derived from the
actual partitioning of the plan, not a constant:

* big inputs (scan splits >= parallelism) pass through untouched — at
  scale this function is the identity and adds no shuffle;
* small inputs pay one tiny exchange of the raw rows (bounded by the
  input's actual size, which is exactly the regime where it is cheap).

This is the partitioning-derive-from-input-size rule of the optimization
playbook (§2: make partitioning scale-adaptive rather than a constant
tuned for either local mode or the cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def adaptive_partitions(
    df: DataFrame,
    per_partition_bytes: int = 64 * 1024 * 1024,
    max_parts: int | None = None,
) -> int:
    """Scale-adaptive shuffle-partition count for an explicit
    ``repartition(n, key)``: ceil(plan-estimated bytes / target bytes),
    clamped to [1, session shuffle partitions].

    Derived from the optimizer's size estimate (file sizes for scans,
    actual bytes for local relations) — no job runs, and join-stat
    overestimates only ever round the answer UP toward the session
    default, never down, so a 100 TB input keeps full parallelism while
    a fixture-sized one stops fanning 32 near-empty tasks through every
    downstream stage."""
    sess = df.sparkSession
    cap = max_parts or int(sess.conf.get("spark.sql.shuffle.partitions"))
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable: keep the session default
        return cap
    if size <= 0:
        return cap
    return max(1, min(cap, -(-size // per_partition_bytes)))


def spread_small(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session default parallelism iff it
    currently has fewer partitions; identity otherwise.

    ``min_parts`` overrides the target (tests / callers that know the
    downstream fan-out).  Uses the physical plan's partition count —
    computing it compiles the plan but runs no job.
    """
    sess = df.sparkSession
    target = min_parts or sess.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — never let the guard break a plan
        return df
    if current >= target:
        return df
    return df.repartition(target)
