"""DSIR-style importance weighting — data selection for pretraining.

Distributed form of "Data Selection for Language Models via Importance
Resampling" (Xie et al. 2023): score every raw document by how much more
likely its hashed n-gram features are under a small TARGET corpus (the
domain you want more of) than under the raw pool, then resample the raw
pool by that importance weight.

Execution shape (the point at 100 TB):

1. feature pass — word-bigram explode + hash-bucket projection over both
   corpora; ONE groupBy per corpus onto ``n_buckets`` rows.  The bucket
   tables are broadcast-sized BY CONSTRUCTION (the paper uses 10k
   buckets for billions of docs), so collecting them to the driver is
   the same contract as ``charlm.train_char_lm``;
2. model — per-bucket log importance ratios quantized to int64 once on
   the driver (round-half-up: ``floor(ln(p_b/q_b)·1e6 + 0.5)``, add-one
   smoothing), so document weights are EXACT integer sums:
   order-independent, partition-independent, replayable bit-for-bit in
   the DuckDB oracle.  The oracle evaluates the identical expression
   shape (divide → ln → subtract → ·1e6 → floor+0.5), so the two
   engines agree whenever they share a libm ``log``; a cross-platform
   last-ulp ``.5``-boundary flip is the one residual risk, accepted for
   a driver that runs both engines on one host;
3. score pass — per-doc bucket counts weighted through the ratio
   vector, carried as a dense bucket-indexed array literal (O(1)
   ``element_at`` per row — no model join stage at all).  The corpus
   shuffles only on (doc, bucket) for its own aggregation; nothing
   corpus-sized ever reaches the driver.

Raw-only buckets (never seen in target) still get a finite smoothed
ratio; docs with fewer than 2 tokens have no features and are absent
from the output, mirroring ``decontaminate``'s contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _bigram_buckets(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per word-bigram occurrence (not distinct:
    DSIR weights are count-weighted, unlike decontamination's set
    semantics)."""
    from ton_indexer_spark.operators.spread import spread_small

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # CPU-heavy narrow map (tokenize + bigram explode + md5 bucket):
    # spread a small single-split input across cores — identity at scale
    t = spread_small(docs).select(F.col(id_col), toks.alias("t")).filter(
        (F.length(F.trim(F.col(text_col))) > 0) & (F.size(toks) >= 2)
    )
    grams = t.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat(
                    F.element_at("t", i.cast("int")),
                    F.lit(" "),
                    F.element_at("t", (i + F.lit(1)).cast("int")),
                ),
            )
        ).alias("gram"),
    )
    return grams.select(
        id_col,
        (
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """(id_col, n_grams, logw_scaled) — per-raw-doc importance weight.

    ``logw_scaled`` is the exact int64 Σ k_b · ⌊ln(p̂_b/q̂_b)·1e6 + ½⌋
    over the doc's feature buckets (p̂ = target, q̂ = raw, add-one
    smoothed).  Resample by keeping the top weights (or Gumbel-top-k on
    ``logw_scaled`` for the paper's sampled variant).
    """

    from ton_indexer_spark.functions.quality_nb import MAX_DENSE_BUCKETS

    assert n_buckets <= MAX_DENSE_BUCKETS, (
        f"n_buckets={n_buckets} exceeds the dense-literal budget "
        f"({MAX_DENSE_BUCKETS}); use a broadcast-join model table instead")
    rg = _bigram_buckets(raw, id_col, text_col, n_buckets)
    tg = _bigram_buckets(target, id_col, text_col, n_buckets)

    # materialize the per-doc bucket counts of BOTH corpora in ONE job
    # (a flag column keeps them apart): they feed the raw and target
    # bucket totals (one rolled-up collect below — no second pass over
    # either gram explode) and the final weighted aggregation
    kk = (
        rg.withColumn("_tgt", F.lit(False))
        .unionByName(tg.withColumn("_tgt", F.lit(True)))
        .groupBy("_tgt", id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    k = kk.filter(~F.col("_tgt")).drop("_tgt")
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for r in (
        kk.groupBy("_tgt", "bucket").agg(F.sum("k").alias("c")).collect()
    ):
        (tc if r["_tgt"] else rc)[r["bucket"]] = r["c"]
    t_total = sum(tc.values()) + n_buckets
    r_total = sum(rc.values()) + n_buckets
    ratios = {
        b: int(
            math.floor(
                (
                    math.log((tc.get(b, 0) + 1) / t_total)
                    - math.log((c + 1) / r_total)
                )
                * SCALE
                + 0.5
            )
        )
        for b, c in rc.items()
    }
    # dense bucket-indexed ratio vector as ONE expression literal: the
    # former createDataFrame + broadcast-join cost a table build and a
    # join stage for a model that is n_buckets ints; element_at on the
    # folded array is an O(1) per-row lookup.  Buckets absent from rc
    # never occur in k (k's buckets ARE rc's domain), so the 0 filler is
    # unreachable.
    vals = ",".join(f"{ratios.get(b, 0)}L" for b in range(n_buckets))
    lr_arr = F.expr(f"array({vals})")

    return (
        k.groupBy(id_col)
        .agg(
            F.sum("k").alias("n_grams"),
            F.sum(
                F.col("k")
                * F.element_at(lr_arr, (F.col("bucket") + 1).cast("int"))
            ).alias("logw_scaled"),
        )
    )
