"""SimHash document signatures.

Each token votes ±1 on every signature bit; bit j of the signature is the
sign of the vote sum.  Bit source: parity of hex digit j of md5(token) —
deterministic and portable to the SQL oracle (no engine-specific 64-bit
hash).  Tokens vote with multiplicity (standard SimHash weighting by term
frequency).

Shape: explode tokens → ONE groupBy(doc) with n_bits conditional sums —
single shuffle, map-side combinable.  Near-dup pairs = signatures within a
small Hamming distance; `hamming_distance` is provided for the pair stage
(bucketize on bit-prefixes for the 100 TB path, same banding idea as LSH).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS = 16
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash_signature(
    docs: DataFrame,
    n_bits: int = N_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, simhash) where simhash is an n_bits '0'/'1' string (bit 0 first)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    toks = toks.withColumn("th", F.md5(F.col("token")))
    votes = [
        F.sum(
            F.when(F.substring("th", j + 1, 1).isin(*_ODD_HEX), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(n_bits)]
    )
    return agg.select(F.col(id_col), bits.alias("simhash"))


def hamming_distance(a: Column, b: Column, n_bits: int = N_BITS) -> Column:
    """Hamming distance between two '0'/'1' signature strings."""
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(
            F.substring(a, j + 1, 1) != F.substring(b, j + 1, 1), 1
        ).otherwise(0)
    return out
