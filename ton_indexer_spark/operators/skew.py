"""Skew-mitigation join (scale toolkit; SURVEY.md §4 design note).

Hot keys (a DEX router account, a viral NFT collection) make one shuffle
partition dominate a join.  AQE's skew-join split handles sort-merge cases;
`salted_join` is the explicit fallback that also works for aggregate-heavy
paths: the skewed (large) side gets a random salt in [0, salt), the small
side is exploded across all salt values, and the join key becomes
(key, salt) — spreading each hot key over `salt` partitions at the cost of
replicating the small side `salt`×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``large ⋈ small ON on`` with the hot-key salt trick.
    Deterministic salting (hash of the row's full key tuple would be random
    enough; we use a uniform rand seeded per-partition via monotonically
    increasing id modulo) keeps re-runs stable for idempotent sinks."""
    salted_large = large.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()),
                          F.lit(salt))).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
