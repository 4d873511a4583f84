"""Connected-components query — batch trace assembly on generic data
(SURVEY.md §2.8 T2, §7 step 4).

Trace assembly = connected components over message-hash linkage.  The
driver's testdata has no messages table, so the gate-checked CC instance
derives an edge list from `events` (consecutive events of a user within 30
minutes are linked); components then equal sessions, and the oracle is a
recursive-CTE min-label propagation in DuckDB — the same fixpoint our
distributed operator computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.functions.timecols import epoch_us
from ton_indexer_spark.operators import connected_components
from ton_indexer_spark.queries import register

GAP_US = 1800 * 1_000_000

_EDGE_SQL = f"""
    SELECT prev_event_id AS src, event_id AS dst
    FROM (
        SELECT event_id, ts,
               LAG(event_id) OVER w AS prev_event_id,
               LAG(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE prev_event_id IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) <= {GAP_US}
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    ev = ev.withColumn("_ts_us", epoch_us(ev, "ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("_ts_us").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("prev_event_id", F.lag("event_id").over(w))
        .withColumn("prev_ts_us", F.lag("_ts_us").over(w))
        .filter(
            F.col("prev_event_id").isNotNull()
            & ((F.col("_ts_us") - F.col("prev_ts_us")) <= GAP_US)
        )
        .select(F.col("prev_event_id").alias("src"), F.col("event_id").alias("dst"))
    )


@register(
    "connected_components",
    f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL}),
    sym AS (
        SELECT src AS a, dst AS b FROM edges
        UNION
        SELECT dst AS a, src AS b FROM edges
    ),
    walk AS (
        -- full reachability, not only label-decreasing steps: a component
        -- whose min id sits behind a LARGER intermediate node is otherwise
        -- unreachable (e.g. chain 1—100—2 would leave node 2 labeled 2).
        -- The recursive UNION de-duplicates rows, so the walk terminates
        -- at |component|² pairs worst-case — components here are sessions
        SELECT a AS node, a AS component FROM sym
        UNION
        SELECT w.node, s.b AS component
        FROM walk w JOIN sym s ON s.a = w.component
    )
    SELECT node, MIN(component) AS component
    FROM walk
    GROUP BY node
    ORDER BY node
    """,
    survey_ops=("T2", "A9"),
    description="batch trace assembly: min-label connected components over "
    "a derived edge list; oracle = recursive CTE fixpoint "
    "(TraceAssembler.cpp:285-412 batch equivalent)",
)
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    return connected_components(edges).orderBy("node")
