"""Character-LM quality scoring — the perplexity-proxy filter.

Pretraining pipelines (CCNet, RefinedWeb, FineWeb) score documents with
a small language model trained on a clean reference corpus and drop the
high-perplexity tail.  This is the distributed form of that filter with a
character unigram model — deliberately tiny, because the POINT here is
the execution shape, which is identical for any externally-trained
table-lookup model (KenLM char/word n-grams included):

1. **train**: one aggregation over the reference corpus producing the
   model table (alphabet-sized — here 37 entries), collected to the
   driver.  At 100 TB this is a single partial-agg pass; the model is a
   broadcast-sized artifact by construction.
2. **score**: a map-side SELECT over the corpus — per-character counts
   via ``length(x) - length(replace(x, c, ''))`` (pure codegen, no
   explode — the per-char-row explode would be |corpus|·|doc length|
   rows) and a static weighted sum against the model literals.  No
   shuffle at all.

Exactness: log-probs are quantized to integers once at train time
(``q_c = round(-ln((n_c + 1) / (N + |A|)) · 1e6)`` — add-one smoothing,
half-away rounding), so document scores are exact int64 sums —
order-independent, partitioning-independent, and replayable in the
DuckDB oracle.  Characters outside the alphabet (e.g. CJK, punctuation)
are unscored, reported via ``n_scored``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
SCALE = 1_000_000


def _char_count(lowered: Column, ch: str) -> Column:
    return F.length(lowered) - F.length(
        F.replace(lowered, F.lit(ch), F.lit(""))
    )


def train_char_lm(reference: DataFrame, text_col: str = "text") -> dict[str, int]:
    """Integer-scaled negative log-probs per alphabet char.

    One aggregation pass; the returned model is ``{char: q_scaled}`` with
    ``q = round_half_away(-ln((n_c + 1) / (N + |A|)) * SCALE)``.
    """
    from ton_indexer_spark.operators.spread import spread_small

    lowered = F.lower(F.col(text_col))
    # 37 replace() scans per row is CPU-heavy map work: spread a small
    # single-split input so the partial aggregation uses every core
    reference = spread_small(reference)
    counts_row = reference.agg(
        *[
            F.sum(_char_count(lowered, c)).alias(f"c{i}")
            for i, c in enumerate(ALPHABET)
        ]
    ).collect()[0]
    counts = [int(counts_row[i] or 0) for i in range(len(ALPHABET))]
    total = sum(counts) + len(ALPHABET)
    model = {}
    for c, n in zip(ALPHABET, counts):
        nll = -math.log((n + 1) / total)
        model[c] = int(math.floor(nll * SCALE + 0.5))
    return model


def char_lm_score(
    docs: DataFrame,
    model: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_scored, nll_sum_scaled, nll_per_char) — map-side only.

    ``nll_sum_scaled`` is the exact integer Σ count(c)·q_c;
    ``nll_per_char`` the double quotient (null when no scoreable chars).
    Lower is more reference-like; the filter drops the high tail.
    """
    # project the 37 per-char counts ONCE, then derive both sums from the
    # bound columns: inlining the count expressions into n_scored AND the
    # weighted sum would evaluate every replace() twice per row and blow
    # the whole-stage-codegen 64 KB method limit
    from ton_indexer_spark.operators.spread import spread_small

    lowered = F.lower(F.col(text_col))
    # same reasoning as train: the 37-replace count projection is the
    # dominant per-row cost — use every core on small inputs
    docs = spread_small(docs)
    counted = docs.select(
        F.col(id_col),
        *[
            _char_count(lowered, c).cast("long").alias(f"_c{i}")
            for i, c in enumerate(ALPHABET)
        ],
    )
    cols = [F.col(f"_c{i}") for i in range(len(ALPHABET))]
    n_scored = sum(cols[1:], cols[0])
    nll = None
    for i, c in enumerate(ALPHABET):
        term = cols[i] * F.lit(model[c])
        nll = term if nll is None else nll + term
    return counted.select(
        F.col(id_col),
        n_scored.alias("n_scored"),
        nll.alias("nll_sum_scaled"),
        F.when(
            n_scored > 0,
            nll.cast("double") / n_scored.cast("double"),
        ).alias("nll_per_char"),
    )


def nll_columns(
    model: dict[str, int], text_col: str = "text"
) -> tuple[Column, Column]:
    """(n_scored, nll_sum_scaled) as bare Column expressions.

    For callers that need the scoring inline in an existing projection
    (e.g. a streaming plan that must stay a single stateless select) —
    the ONE definition of the scoring algebra, shared with
    ``char_lm_score``."""
    lowered = F.lower(F.col(text_col))
    counts = [_char_count(lowered, c).cast("long") for c in ALPHABET]
    n_scored = sum(counts[1:], counts[0])
    nll = None
    for c, cnt in zip(ALPHABET, counts):
        term = cnt * F.lit(model[c])
        nll = term if nll is None else nll + term
    return n_scored, nll
