"""`GET /api/v3/blocks` equivalent (ton-index-go/index/crud/crud_blocks.go).

Filters by workchain / seqno range / utime range / masterchain seqno;
deterministic order (gen_utime, workchain, shard, seqno); existence probe
(crud_blocks.go:111) is `.limit(1).count() > 0` on the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.catalog import Catalog
from ton_indexer_spark.operators import filter_range, paginate


def blocks_query(
    cat: Catalog,
    workchain: int | None = None,
    mc_seqno: int | None = None,
    min_seqno: int | None = None,
    max_seqno: int | None = None,
    start_utime: int | None = None,
    end_utime: int | None = None,
    sort: str = "desc",
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    b = cat.blocks
    if workchain is not None:
        b = b.filter(F.col("workchain") == workchain)
    if mc_seqno is not None:
        b = b.filter(F.col("mc_block_seqno") == mc_seqno)
    b = filter_range(b, "seqno", min_seqno, max_seqno)
    b = filter_range(b, "gen_utime", start_utime, end_utime)
    return paginate(
        b,
        sort=[
            ("gen_utime", sort),
            ("workchain", "asc"),
            ("shard", "asc"),
            ("seqno", "asc"),
        ],
        limit=limit,
        offset=offset,
    )


def block_exists(cat: Catalog, workchain: int, seqno: int) -> bool:
    return (
        cat.blocks.filter(
            (F.col("workchain") == workchain) & (F.col("seqno") == seqno)
        )
        .limit(1)
        .count()
        > 0
    )


def masterchain_block_shards(
    cat: Catalog, seqno: int, include_mc_block: bool = False
) -> DataFrame:
    """/api/v3/masterchainBlockShards: every shard block committed under a
    masterchain seqno (crud shape: blocks WHERE mc_block_seqno = $1),
    ordered (workchain, shard, seqno)."""
    b = cat.blocks.filter(F.col("mc_block_seqno") == seqno)
    if not include_mc_block:
        b = b.filter(F.col("workchain") != -1)
    return b.orderBy("workchain", "shard", "seqno")


def masterchain_info(cat: Catalog) -> DataFrame:
    """/api/v3/masterchainInfo: first and last indexed masterchain block
    (go API returns {first, last}; one aggregate scan over the pruned
    workchain partition)."""
    mc = cat.blocks.filter(F.col("workchain") == -1)
    lo = mc.orderBy(F.col("seqno").asc()).limit(1).withColumn(
        "which", F.lit("first"))
    hi = mc.orderBy(F.col("seqno").desc()).limit(1).withColumn(
        "which", F.lit("last"))
    return lo.unionByName(hi)
