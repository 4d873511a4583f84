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


def masterchain_block_shard_state(cat: Catalog, seqno: int) -> DataFrame:
    """/api/v3/masterchainBlockShardState (main.go:195-218, QueryShards →
    crud_blocks.go:183-197): the full shard STATE at a masterchain block —
    for every shard chain, the tip block that mc block references — not
    just the blocks committed since the previous mc block (that's
    /masterchainBlockShards).

    The reference maintains a ``shard_state`` table filled from the mc
    block's ShardHashes (DataParser.cpp:74-85, one row per shard tip).
    Derivation from the blocks table: a shard tip referenced by mc seqno S
    was committed under some mc_block_seqno <= S, and is the newest such
    block of its (workchain, shard) — so the state is the per-shard
    arg-max.  mc_block_seqno <= S prunes the scan (partition-prunable at
    scale); the per-shard max is a tiny aggregate joined back broadcast.
    """
    shard_blocks = cat.blocks.filter(
        (F.col("workchain") != -1) & (F.col("mc_block_seqno") <= seqno)
    )
    tips = shard_blocks.groupBy("workchain", "shard").agg(
        F.max("seqno").alias("seqno")
    )
    # the mc block itself is part of its shard state (DbScanner.cpp:154
    # pushes the mc block into shard_blocks_ ahead of the shard tips)
    mc_row = cat.blocks.filter(
        (F.col("workchain") == -1) & (F.col("seqno") == seqno)
    )
    return mc_row.unionByName(
        shard_blocks.join(
            F.broadcast(tips), ["workchain", "shard", "seqno"], "left_semi"
        )
    ).orderBy("workchain", "shard", "seqno")


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
