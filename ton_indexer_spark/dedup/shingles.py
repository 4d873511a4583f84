"""Word-shingle extraction shared by the ngram/minhash dedup paths.

k-token shingles over whitespace tokens, DISTINCT per doc.  Pure column
algebra: split → sequence → transform → explode; shingling happens inside
codegen before the only shuffle (the downstream groupBy/join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Return (id, shingle) pairs, distinct per document.

    Documents with fewer than k tokens produce no shingles (matching the
    conventional MinHash definition — they can only be exact-dup matched).
    """
    # bind the token array to a column FIRST: inlining the split() expression
    # at every element_at use site makes Catalyst re-split the text once per
    # shingle position — O(len²) per document
    toked = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    shingle_arr = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return (
        toked.select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )
