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

import logging

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

# sizeInBytes for relations without statistics (LogicalRDD etc.) is
# Long.MaxValue — anything this large means "unknown", not "big"
_UNKNOWN_SIZE = 1 << 62


def _est_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan task count from optimizer statistics — no
    physical planning, no RDD conversion (the former probe compiled the
    full physical plan per call, ~30-60 ms of pure driver latency on
    every builder invocation).

    Replays Spark's own file-split sizing (FilePartition.maxSplitBytes):
    ``maxSplit = min(maxPartitionBytes, max(openCost, bytes/minParts))``
    so the answer tracks what the scan would actually do: tiny inputs
    estimate 1, and anything past ~minParts*openCost estimates >= the
    session parallelism.  Returns None when statistics are unavailable
    (non-file sources), so the caller can fall back."""
    try:
        sess = df.sparkSession
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if size <= 0 or size >= _UNKNOWN_SIZE:
            return None
        conf = sess._jsparkSession.sessionState().conf()
        max_pb = int(conf.filesMaxPartitionBytes())
        open_cost = int(conf.filesOpenCostInBytes())
        min_pn = sess.sparkContext.defaultParallelism
        opt = conf.filesMinPartitionNum()
        if opt.isDefined():
            min_pn = int(opt.get())
        max_split = min(max_pb, max(open_cost, size // max(min_pn, 1)))
        return max(1, -(-size // max(max_split, 1)))
    except Exception as exc:  # noqa: BLE001 — internal-API probe
        logger.debug("stats partition estimate unavailable: %s", exc)
        return None


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
    downstream fan-out).  The partition count comes from optimizer
    statistics (``_est_scan_partitions`` — no plan compile, no job);
    sources without statistics fall back to the physical plan's count.
    """
    sess = df.sparkSession
    target = min_parts or sess.sparkContext.defaultParallelism
    current = _est_scan_partitions(df)
    if current is None:
        try:
            current = df.rdd.getNumPartitions()
        except Exception as exc:  # noqa: BLE001 — never break a plan
            logger.warning("spread_small probe failed, passing through: %s",
                           exc)
            return df
    if current >= target:
        return df
    return df.repartition(target)
