"""Bloom-filter membership — bounded-memory screening against a reference
corpus.

The semi-join in ``decontaminate`` is exact but carries the reference
set's full key set through the join.  When the reference is large (e.g.
"everything already in the previous training run" — billions of keys) the
classic answer is a Bloom filter: k hash positions in an m-bit space;
membership = all k bits set.  The filter's size is FIXED at m bits no
matter how many keys went in — the property that matters at 100 TB —
at the price of a tunable false-positive rate ≈ (1 - e^(-k·n/m))^k.

Representation: the built filter is the DISTINCT SET-BIT POSITION table
(≤ m rows, bounded regardless of reference size), which Spark broadcasts
for the probe join; semantically identical to the bit-array and — unlike
opaque bitset bytes — exactly replayable in the DuckDB oracle.  Hash
family is engine-portable: position_i = int(md5(i || ':' || key)[:8], 16)
mod m.

Probe plan: explode each candidate's k positions (map-side), broadcast
hash-join against the position table, count hits per candidate —
``maybe_member`` iff all k positions are set.  One stage, no shuffle of
the candidate side beyond the per-key count (k rows per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of the k hash positions for a key — the same engine-portable
    md5 bucket `operators/sampling.py::hash_bucket` uses, seeded per hash
    function by an index prefix."""
    from ton_indexer_spark.operators.sampling import hash_bucket

    return F.array(
        *[
            hash_bucket(
                F.concat(F.lit(f"{i}:"), key.cast("string")), m_bits
            )
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    reference: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Distinct set-bit positions of the reference keys — ≤ m_bits rows.

    This IS the Bloom filter (position-set form); pass it to
    ``bloom_probe``.  Persisting it as a small parquet gives an
    incremental filter: union + distinct with the next batch's positions.
    """
    return (
        reference.select(
            F.explode(
                _positions(F.col(key_col), m_bits, k_hashes)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """candidates + ``maybe_member`` (true ⇒ possibly in reference; false ⇒
    DEFINITELY not — the Bloom guarantee)."""
    # distinct keys first: duplicate candidate rows would otherwise emit
    # 2k position rows per key and break the all-k-bits count
    pos = candidates.select(key_col).distinct().select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), m_bits, k_hashes)).alias("pos"),
    )
    hits = (
        pos.join(F.broadcast(bloom.select("pos").distinct()), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n_set"))
    )
    return (
        candidates.join(hits, key_col, "left")
        .withColumn(
            "maybe_member", F.coalesce(F.col("_n_set"), F.lit(0)) == k_hashes
        )
        .drop("_n_set")
    )
