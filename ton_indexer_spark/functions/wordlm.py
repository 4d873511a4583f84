"""Word-bigram LM scoring — the distributed-model perplexity filter.

``functions/charlm.py`` covers the broadcast-model regime: a model small
enough to collect and inline (37 chars).  A WORD n-gram model (the
CCNet/KenLM configuration) is corpus-vocabulary-sized — millions of rows
at 100 TB — so the model can never live on the driver.  This module is
the distributed-model counterpart:

1. **train**: two aggregations over the corpus — bigram counts
   ``c(w1,w2)`` and their left-marginal ``c(w1)`` (derived by re-agg of
   the bigram table, not a second corpus scan) — kept as DataFrames; the
   only scalar collected is the vocabulary size ``V``.
2. **score**: per-doc bigram occurrence counts (one explode + groupBy)
   LEFT-joined to the model on ``(w1, w2)`` — a shuffle join on the
   bigram key with map-side partial aggregation, the right shape when
   the model side is also huge.  Add-one smoothing over ``V`` gives
   ``nll(w2|w1) = -ln((c12+1)/(c1+V))``; an out-of-vocabulary bigram
   gets the smoothed floor (``c12=0`` with the trained marginal, or
   ``-ln(1/V)`` when even ``w1`` is unseen) — OOV text scores WORSE,
   it is never silently dropped.

Tokenization is the lowercase alphanumeric convention shared with the
other text operators: ``[^a-z0-9]+`` → space, split, drop empties.

Exactness: per-bigram negative log-probs are quantized to integer
micro-nats (``round(nll · 1e6)`` as int64) BEFORE the per-doc sum, so
document scores are exact int64 sums — order- and partitioning-
independent.  The ``ln`` itself is evaluated once per bigram TYPE (not
per occurrence) in whole-stage codegen; a last-ulp divergence between
engines' ``ln`` would need to land within 1e-10 of a rounding midpoint
to flip a score, which the gate's three-SF replay checks empirically.
(The gate self-scores its training corpus, so its oracle never reaches
the OOV floor — the floor paths are pytest-covered instead.)

Docs with fewer than two tokens have no bigrams and are not scored
(no rows emitted — the filter's don't-know bucket).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _tokens(text_col: Column) -> Column:
    """Lowercased alphanumeric word array (empty strings dropped)."""
    cleaned = F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " ")
    return F.filter(F.split(cleaned, " "), lambda x: x != "")


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, w1, w2) — one row per adjacent token pair occurrence.
    One explode over per-doc positions; no self-join.

    Shape note (measured): building (w1, w2) structs inside the explode
    via transform() is SLOWER here (2.26 vs 0.83 s at sf0.1) — the HOF
    interpretation overhead exceeds the cost of carrying the short token
    array through the Generate; the position-explode stays."""
    from ton_indexer_spark.operators.spread import spread_small

    w = spread_small(docs).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("w")
    ).filter(F.size("w") >= 2)
    return w.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
        "w",
    ).select(
        id_col,
        F.element_at("w", F.col("i")).alias("w1"),
        F.element_at("w", F.col("i") + 1).alias("w2"),
    )


@dataclass(frozen=True)
class WordBigramLm:
    """Distributed bigram model: both tables are vocabulary-sized
    DataFrames (the artifacts a deployment persists); only the scalars
    live on the driver."""

    bigrams: DataFrame    # (w1, w2, q)   — int64 micro-nat smoothed NLL
    marginals: DataFrame  # (w1, c1)      — left-context counts
    vocab_size: int
    oov_q: int            # floor for a bigram whose w1 is unseen


def train_word_bigram_lm(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: DataFrame | None = None,
    vocab_size: int | None = None,
) -> tuple[WordBigramLm, int]:
    """(model, V) — add-one-smoothed bigram NLLs plus the marginals the
    OOV floor needs at score time.

    ``bigrams`` — optional precomputed ``doc_bigrams`` output; the
    self-scoring pipeline passes a persisted table so train and score
    share one tokenize+explode pass instead of two corpus scans.
    ``vocab_size`` — optional precomputed |V|; passing it skips the only
    other corpus scan (the token-distinct count)."""
    bi = (
        bigrams
        if bigrams is not None
        else doc_bigrams(reference, id_col, text_col)
    )
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    if vocab_size is None:
        toks = reference.select(
            F.explode(_tokens(F.col(text_col))).alias("t")
        )
        vocab_size = int(toks.agg(F.countDistinct("t")).collect()[0][0] or 0)
    v = vocab_size
    model = big.join(uni, "w1").select(
        "w1",
        "w2",
        F.round(
            -F.ln((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(v))))
            * SCALE,
            0,
        )
        .cast("long")
        .alias("q"),
    )
    oov_q = int(math.floor(math.log(max(v, 1)) * SCALE + 0.5))  # -ln(1/V)
    return WordBigramLm(model, uni, v, oov_q), v


def word_lm_score(
    docs: DataFrame,
    lm: WordBigramLm,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_bigrams, nll_sum_scaled, nll_per_bigram) per scoreable
    doc (≥1 bigram).  Doc bigrams pre-aggregate to per-(doc, w1, w2)
    counts before the model join, so the shuffle carries bigram TYPES
    per doc, not occurrences; the join key (w1, w2) co-partitions with
    the model.  Out-of-vocabulary bigrams take the smoothed floor
    (never dropped): ``-ln(1/(c1+V))`` when ``w1`` was seen,
    ``-ln(1/V)`` when not."""
    bi = (
        bigrams
        if bigrams is not None
        else doc_bigrams(docs, id_col, text_col)
    )
    occ = bi.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    v = float(lm.vocab_size)
    scored = (
        occ.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.marginals, ["w1"], "left")
        .select(
            id_col,
            "n",
            F.coalesce(
                F.col("q"),
                F.round(
                    -F.ln(F.lit(1.0) / (F.col("c1") + F.lit(v))) * SCALE, 0
                ).cast("long"),
                F.lit(lm.oov_q),
            ).alias("q_eff"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("q_eff"))
            .cast("long")
            .alias("nll_sum_scaled"),
        )
        .withColumn(
            "nll_per_bigram",
            F.round(
                F.col("nll_sum_scaled")
                / F.col("n_bigrams")
                / F.lit(float(SCALE)),
                6,
            ),
        )
    )
