"""Hashed linear quality model scoring (fastText-style, map-only).

Production pipelines score every document with a linear classifier over
hashed token features (fastText / CCNet quality filters).  At 100 TB the
only acceptable plan is map-only: no explode, no shuffle, no model
broadcast bigger than the weight vector.  This module scores entirely
inside per-row column expressions:

    tokens  -> bucket = md5-prefix mod n_buckets   (feature hashing)
    score   = sum(weight[bucket]) over the token array (F.aggregate)

Weights are pluggable.  ``synthetic_weight`` derives a deterministic
integer weight from the bucket id (a Knuth multiplicative hash) so the
whole model is a closed-form expression — the gate's DuckDB oracle
replays the identical integer arithmetic.  A trained model drops in as a
broadcast map-literal (``F.element_at(weight_map, bucket)``) without
changing the plan shape: still one scan, zero shuffles.

The md5-prefix bucket is the engine's portable-hash idiom (same bytes in
Spark and DuckDB; see functions/text.py::fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_BUCKETS = 1024
# Knuth's multiplicative constant; bucket is reduced first so the product
# stays far below int64 overflow
_A = 2654435761
_TOKEN_RE = "[^a-z0-9]+"


def tokens_lower(text: Column) -> Column:
    """Lowercased alphanumeric tokens, empties filtered."""
    return F.filter(
        F.split(F.lower(F.trim(text)), _TOKEN_RE), lambda t: t != F.lit("")
    )


def token_bucket(token: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Feature-hash a token into [0, n_buckets) via the md5 prefix."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def synthetic_weight(bucket: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic integer weight in [-n_buckets, n_buckets) per bucket."""
    return (bucket * F.lit(_A)) % (2 * n_buckets) - n_buckets


def hashed_linear_raw(text: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Integer-exact sum of per-token weights — order-independent, so the
    result is bit-identical whatever the evaluation order (doubles would
    not be)."""
    return F.aggregate(
        tokens_lower(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + synthetic_weight(token_bucket(t, n_buckets),
                                              n_buckets),
    )


def hashed_linear_score(text: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Mean weight normalized to [-1, 1): one IEEE division of two exact
    integers, deterministic across engines."""
    n = F.size(tokens_lower(text))
    return F.when(n > 0, hashed_linear_raw(text, n_buckets)
                  / (n.cast("double") * n_buckets)).otherwise(F.lit(0.0))


def quality_logit(score: Column) -> Column:
    """Sigmoid squash for consumers that want a [0,1] quality probability.
    Kept out of the hash-compared gate output (libm exp may differ across
    engines in the last ulp)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
