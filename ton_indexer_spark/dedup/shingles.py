"""Word-shingle extraction shared by the ngram/minhash dedup paths.

k-token shingles over whitespace tokens, DISTINCT per doc.  Pure column
algebra: split → sequence → transform → array_distinct (→ explode);
shingling happens map-side before the first shuffle, and per-doc
distinctness is computed INSIDE the row (``array_distinct``) so no
consumer pays the corpus-wide ``DISTINCT`` shuffle the old
explode → ``.distinct()`` formulation required (identical output —
doc_id was part of the distinct key, so global distinct == per-doc
distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_expr(k: int) -> F.Column:
    """DISTINCT k-shingle array expression over a bound ``toks`` column."""
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + j + 1).cast("int"))
                  for j in range(k)],
            ),
        )
    )


def _toked(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) with the input spread across cores when it is small.

    Binding the token array to a column FIRST matters: inlining the
    split() expression at every element_at use site makes Catalyst
    re-split the text once per shingle position — O(len²) per document.
    """
    from ton_indexer_spark.operators.spread import spread_small

    # CPU-heavy narrow map: make sure a small input (single-split scan)
    # still uses every core — identity at scale (see operators/spread.py)
    return spread_small(docs).select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks")
    )


def shingle_array(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, sharr) — the document's DISTINCT k-token shingles as an array.

    Entirely map-side: tokenize, slide the k-window, ``array_distinct``.
    For consumers that reduce the array in place (MinHash signatures).
    Consumers that need one row per shingle should use ``shingles`` —
    NOT an explode over this function's bound column (see below).
    """
    return _toked(docs, id_col, text_col).select(
        F.col(id_col), _shingle_expr(k).alias("sharr")
    )


def shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Return (id, shingle) pairs, distinct per document.

    Documents with fewer than k tokens produce no shingles (matching the
    conventional MinHash definition — they can only be exact-dup matched).

    Shape: map-side only (shingle expression + explode); no shuffle —
    the downstream groupBy/join is each consumer's FIRST exchange.

    The array expression is inlined INTO the explode rather than bound in
    a Project below it: a ``Project[array] → Generate(explode(col))``
    split measured ~25× slower at sf0.1 than ``Generate(explode(expr))``
    (the non-codegen HOF Project forces a stage boundary that copies the
    full shingle array per row into the Generate stage).
    """
    return _toked(docs, id_col, text_col).select(
        F.col(id_col), F.explode(_shingle_expr(k)).alias("shingle")
    )
