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
    """(id, simhash) where simhash is an n_bits '0'/'1' string (bit 0 first).

    Computed ENTIRELY map-side: the token array is hashed once per token
    (``transform`` to md5), and bit j's vote sum is derived as
    ``2·|odd-parity tokens| − |tokens|`` via ``filter``+``size`` over the
    bound hash array — no explode, no groupBy, no shuffle (the old
    explode → groupBy(doc) formulation shuffled every token row).  Same
    integers: Σ±1 ≡ 2·(#+1 votes) − n.  Docs with no tokens produce no
    row (same as the explode form).
    """
    from ton_indexer_spark.operators.spread import spread_small

    toks_arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    # Drop token-less docs BEFORE the hash projection, on the raw text
    # expression: filtering the bound n_tok alias afterwards makes
    # predicate pushdown inline the array pipeline into the Filter
    # condition and re-plan it through constraint propagation (measured
    # 2× slower at sf0.1).
    docs = docs.filter(F.size(toks_arr) > 0)
    # CPU-heavy narrow map: spread a small (single-split) input across
    # the cores — identity at scale (see operators/spread.py)
    docs_t = spread_small(docs).select(F.col(id_col), toks_arr.alias("toks"))
    # bind the hash array once; each bit's filter() re-reads the bound
    # column (CollapseProject keeps multi-use non-cheap aliases bound)
    hashed = docs_t.select(
        F.col(id_col),
        F.size("toks").alias("n_tok"),
        F.transform("toks", F.md5).alias("th"),
    )
    odd = F.array(*[F.lit(c) for c in _ODD_HEX])

    def _is_odd_at(j: int):
        # single-arg closure: a 2-parameter lambda would be taken by the
        # HOF machinery as the (element, index) form, binding j to the
        # array index instead of the bit position
        return lambda h: F.array_contains(odd, F.substring(h, j + 1, 1))

    votes = [
        (
            F.lit(2) * F.size(F.filter("th", _is_odd_at(j)))
            - F.col("n_tok")
        ).alias(f"v{j}")
        for j in range(n_bits)
    ]
    agg = hashed.select(F.col(id_col), *votes)
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
