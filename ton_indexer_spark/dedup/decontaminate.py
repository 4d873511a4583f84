"""Benchmark decontamination — flag training documents that share n-grams
with an evaluation/benchmark corpus.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM §C use
exact 8-13-gram overlap): any training document containing an n-gram that
also appears in a held-out benchmark is flagged (and usually dropped) so
downstream eval numbers aren't inflated by memorized test items.

Scale shape (what survives 100 TB):

- the benchmark side is SMALL (eval suites are thousands of documents, a
  few million distinct shingles) while the training side is the 100 TB
  corpus.  The plan therefore reduces the benchmark to a DISTINCT shingle
  set and joins the training shingles against it; AQE broadcasts the
  benchmark side from its runtime size, so the big side never shuffles —
  shingling, the hash-join probe, and the per-doc partial count all stay
  map-side in one stage.
- training shingles are NOT distinct-ed globally (that would shuffle the
  corpus); per-doc DISTINCT happens inside `shingles()` which only
  shuffles the (doc_id, shingle) pairs that survive the broadcast
  semi-probe — i.e. the (rare) contaminated shingles, plus one count row
  per doc.
- output is one row per training document (LEFT join keeps clean docs
  with hit=0), so the operator composes as a filter stage:
  ``.filter(~F.col("contaminated"))``.

The ``contaminated`` verdict is integer-exact (``n_hit * denom >=
ratio_num * n_shingles`` avoids float thresholds), so the DuckDB oracle
hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.dedup.shingles import shingles


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    min_hit_ratio: tuple[int, int] = (1, 1000),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc contamination stats against a benchmark corpus.

    Returns ``(id_col, n_shingles, n_hit, contaminated)`` with one row per
    training document that has at least one k-token shingle; ``n_hit``
    counts its distinct shingles that also occur anywhere in ``benchmark``,
    and ``contaminated`` is true iff ``n_hit / n_shingles >= num / denom``
    (``min_hit_ratio``), evaluated in exact integer arithmetic.  The
    default (1/1000) flags on essentially any overlap, matching the
    "exact n-gram collision" policy of the published pipelines.
    """
    num, denom = min_hit_ratio
    train_sh = shingles(train, id_col=id_col, text_col=text_col, k=k)
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the training shingles: a left join against the
    # (broadcast-sized) benchmark set marks hits, and a single per-doc
    # aggregation produces both counts — two separate aggregations would
    # re-run the shingle explode once per branch
    return (
        train_sh.join(bench_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hit"),
        )
        .withColumn(
            "contaminated",
            F.col("n_hit") * denom >= F.lit(num) * F.col("n_shingles"),
        )
    )
