"""`GET /api/v3/messages` equivalent.

Mirrors ton-index-go/index/crud/crud_messages.go:
- :25-29 the in/out fold — each internal message is stored twice
  (direction in/out); the endpoint collapses the pair into one row with
  ``max(CASE WHEN direction='in' THEN tx_hash END)`` per msg_hash (A1);
- :43-55,82-87 null-predicate filters (externals) and opcode/direction;
- :89-96 deterministic sort (created_lt, msg_hash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import filter_by_array, filter_range, paginate


def messages_query(
    cat: Catalog,
    msg_hashes: Sequence[str] | None = None,
    sources: Sequence[str] | None = None,
    destinations: Sequence[str] | None = None,
    opcode: int | None = None,
    body_hash: str | None = None,
    direction: str | None = None,
    start_lt: int | None = None,
    end_lt: int | None = None,
    start_utime: int | None = None,
    end_utime: int | None = None,
    exclude_externals: bool = False,
    only_externals: bool = False,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
    with_body: bool = True,
) -> DataFrame:
    m = cat.messages
    m = filter_by_array(m, "msg_hash", msg_hashes)
    m = filter_by_array(m, "source", sources)
    m = filter_by_array(m, "destination", destinations)
    m = filter_range(m, "created_lt", start_lt, end_lt)
    m = filter_range(m, "created_at", start_utime, end_utime)
    if opcode is not None:
        m = m.filter(F.col("opcode") == opcode)
    if body_hash is not None:  # main.go:457 — find message by body hash
        m = m.filter(F.col("body_hash") == body_hash)
    if direction is not None:  # 'in' | 'out' leg filter before the pivot
        m = m.filter(F.col("direction") == direction)
    if exclude_externals:  # crud_messages.go:82-87
        m = m.filter(F.col("source").isNotNull())
    if only_externals:
        m = m.filter(F.col("source").isNull())

    # ONE aggregation: the in/out pivot and the direction-invariant payload
    # fold together (max() is deterministic on identical duplicate values),
    # so the whole fold costs a single map-side-combinable shuffle — the
    # reference needs the same single GROUP BY (crud_messages.go:25-29)
    payload = [
        F.max(c).alias(c)
        for c in ("source", "destination", "value", "opcode", "created_lt",
                  "created_at", "body_hash", "trace_id")
    ]
    folded = m.groupBy("msg_hash").agg(
        F.max(F.when(F.col("direction") == "in", F.col("tx_hash"))).alias("in_tx_hash"),
        F.max(F.when(F.col("direction") == "in", F.col("tx_lt"))).alias("in_tx_lt"),
        F.max(F.when(F.col("direction") == "out", F.col("tx_hash"))).alias("out_tx_hash"),
        F.max(F.when(F.col("direction") == "out", F.col("tx_lt"))).alias("out_tx_lt"),
        *payload,
    )

    if with_body:
        contents = cat.message_contents.select(
            F.col("hash").alias("body_hash"), F.col("body")
        )
        folded = folded.join(contents, "body_hash", "left")

    # utime-filtered requests page by created_at, lt-paged otherwise —
    # the reference switches order_col the same way (crud_messages.go:
    # 67-80), and msg_hash follows the sort direction (:96)
    key = (
        "created_at"
        if (start_utime is not None or end_utime is not None)
        else "created_lt"
    )
    return paginate(
        folded,
        sort=[(key, sort), ("msg_hash", sort)],
        limit=limit,
        offset=offset,
    )
