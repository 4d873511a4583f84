"""n-gram Jaccard near-duplicate pairs.

shingle self-join → |A ∩ B| per pair → Jaccard = common / (|A|+|B|-common).
The threshold test is done in INTEGER arithmetic
(``common * denom_scale >= thresh_scaled * union``) so the cut is exact and
engine-independent; the reported jaccard double is a deterministic division
of those same integers.

Scale: the self-join shuffles on the shingle; hot shingles (stop-phrase
skew) are capped with a document-frequency filter — standard practice, and
the reason this beats |docs|² at 100 TB.  The cap DEFAULTS ON
(``max_shingle_df=256``): an unguarded posting-list self-join grows with
the square of the hottest shingle's document frequency, which the 10×
scale probe measured as 28× wall growth on a duplicate-heavy corpus.
A shingle shared by >256 documents carries ~no similarity signal (it is
boilerplate by definition) but contributes >32k join pairs; dropping it
changes Jaccard only for pairs that were already near-identical in their
rare shingles.  Pass ``max_shingle_df=None`` to disable, and enable INFO
logging on this module to see how many shingles the cap dropped.
"""

from __future__ import annotations

import logging

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.dedup.shingles import shingles

logger = logging.getLogger(__name__)

DEFAULT_MAX_SHINGLE_DF = 256


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Return (doc_a, doc_b, common, size_a, size_b, jaccard) for pairs with
    Jaccard >= threshold (doc_a < doc_b).

    ``max_shingle_df`` caps the posting-list length per shingle (the
    self-join skew guard — see module docstring); ``None`` disables."""
    sh = shingles(docs, id_col, text_col, k)
    if max_shingle_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        keep = df_counts.filter(F.col("df") <= max_shingle_df)
        if logger.isEnabledFor(logging.INFO):
            # no silent caps: count what the guard dropped (extra job, so
            # only when the caller opted into INFO logging)
            n_dropped = df_counts.count() - keep.count()
            logger.info(
                "ngram_jaccard_pairs: dropped %d shingles with df > %d",
                n_dropped, max_shingle_df,
            )
        sh = sh.join(keep.select("shingle"), "shingle")
    # the shingle set feeds three plan branches (a-side, b-side, sizes);
    # without caching, Catalyst re-runs tokenize+explode per branch
    sh = sh.cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    frac = Fraction(threshold).limit_denominator(10**6)
    out = (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("size").alias("size_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("size").alias("size_b")), "doc_b")
        .withColumn("union_size", F.col("size_a") + F.col("size_b") - F.col("common"))
        .filter(
            F.col("common") * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * F.col("union_size")
        )
        .select(
            "doc_a",
            "doc_b",
            "common",
            "size_a",
            "size_b",
            (F.col("common").cast("double") / F.col("union_size").cast("double")).alias(
                "jaccard"
            ),
        )
    )
    return out
