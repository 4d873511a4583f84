"""Naive-Bayes quality-classifier TRAINER over hashed token features.

``quality_model.py`` scores documents with a fastText-style hashed
linear model and notes that "a trained weight vector drops in as a map
literal".  This module supplies that trained vector: a multinomial
Naive-Bayes log-odds model (the classic CCNet/GPT-3-era quality-filter
shape) trained entirely with counting aggregations — no gradient loop,
no float accumulation, exactly reproducible across engines.

Training plan (100 TB shape):
    tokenize -> explode -> groupBy(bucket)        one shuffle whose key
    cardinality is ``n_buckets`` (default 1024), so map-side partial
    aggregation collapses each task's output to <= n_buckets rows; the
    reduce side is trivially small regardless of corpus size.

Weights are **integer-quantized micro-log-units** (the engine's char-LM
idiom, see ``queries/text.py::char_lm_quality``):

    w_q[b] = floor((ln(pos_b+1) - ln(pos_tot+B)
                   - ln(neg_b+1) + ln(neg_tot+B)) * SCALE + 0.5)

so downstream score sums are exact int64 arithmetic — order-independent
and engine-independent GIVEN the quantized weights.  Precision envelope
for the quantization itself: w_q is derived from natural logs, so a
1-ulp libm difference between JVM ``Math.log`` and another engine's
``ln()`` can flip floor(x*1e6+0.5) when x*1e6 lands within ~1e-9 of a
.5 boundary (probability ~1e-9 per weight per engine pair).  The gated
oracle queries therefore compare weights trained by the SAME engine
(Spark trains, both sides consume the literal), mirroring how
``quality_model.quality_logit`` keeps raw ``exp()`` out of gated
output; cross-engine training parity is expected but not claimed exact.

Scoring plan: the trained table is ``n_buckets`` rows — it collects to a
map literal (a bounded, codebook-sized collect, the repo's policy line)
and scoring becomes the same map-only zero-shuffle projection as
``quality_model.hashed_linear_raw``: one scan, ``F.aggregate`` over the
token array, no explode, no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ton_indexer_spark.functions.quality_model import (
    N_BUCKETS,
    token_bucket,
    tokens_lower,
)

SCALE = 1_000_000


def _quantize(x: Column) -> Column:
    """floor(x*SCALE + 0.5) — identical half-up semantics in Spark and
    DuckDB (unlike ROUND, whose negative-half tie behavior varies)."""
    return F.floor(x * F.lit(SCALE) + F.lit(0.5)).cast("long")


def nb_bucket_counts(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-bucket positive/negative token counts.

    ``label`` is a boolean column (True = positive class).  Output:
    (bucket, pos_cnt, neg_cnt) — at most ``n_buckets`` rows.
    """
    from ton_indexer_spark.operators.spread import spread_small

    # CPU-heavy narrow map (tokenize + explode + md5 bucket per token):
    # spread a small single-split input across cores — identity at scale
    e = spread_small(docs).select(
        label.alias("y"),
        F.explode(tokens_lower(F.col(text_col))).alias("tok"),
    )
    return (
        e.groupBy(token_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos_cnt"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg_cnt"),
        )
    )


def nb_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Train: (bucket, pos_cnt, neg_cnt, w_q) with w_q the quantized
    Laplace-smoothed log-odds.  The totals are a 1-row broadcast join —
    no second pass over the corpus."""
    counts = nb_bucket_counts(docs, label, text_col, n_buckets)
    totals = counts.agg(
        F.sum("pos_cnt").alias("pos_tot"), F.sum("neg_cnt").alias("neg_tot")
    )
    b = F.lit(float(n_buckets))
    w = (
        F.log(F.col("pos_cnt") + F.lit(1.0))
        - F.log(F.col("pos_tot") + b)
        - F.log(F.col("neg_cnt") + F.lit(1.0))
        + F.log(F.col("neg_tot") + b)
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket", "pos_cnt", "neg_cnt", _quantize(w).alias("w_q")
    )


def nb_prior_q(docs: DataFrame, label: Column) -> int:
    """Quantized class-prior log-odds (one scalar aggregate).

    Empty input yields the flat prior (0): the SUMs are coalesced to 0
    so Laplace smoothing sees (0+1)/(0+1)."""
    row = docs.select(
        F.coalesce(F.sum(F.when(label, 1).otherwise(0)), F.lit(0)).alias("p"),
        F.coalesce(F.sum(F.when(label, 0).otherwise(1)), F.lit(0)).alias("n"),
    ).first()
    prior = F.log(F.lit(float(row["p"] + 1))) - F.log(F.lit(float(row["n"] + 1)))
    # evaluate the same expression engine-side for bit parity with the gate
    return int(
        docs.sparkSession.range(1).select(_quantize(prior)).first()[0]
    )


# Dense-literal guard: the model travels inlined in every aggregate
# expression (partial AND final), so its size is a codegen/plan-size
# hazard past a few thousand entries.  Larger models must go back to
# the broadcast-join table path (see git history of dsir_weights for
# the join formulation).
MAX_DENSE_BUCKETS = 4096


def nb_weight_map(
    weights: DataFrame, n_buckets: int = N_BUCKETS
) -> Column:
    """Collect the trained table (<= n_buckets rows) into a DENSE
    bucket-indexed array literal (missing buckets = 0, the same value
    ``nb_score`` coalesced for map misses).  Bounded collect: the model,
    not the data.

    Array, not ``create_map``: ``element_at`` on a map literal is a
    linear scan of all n_buckets entries PER TOKEN (measured as the
    dominant cost of the scoring stage); on an array it is an O(1)
    index.

    ``nb_score``'s ``n_buckets`` must equal the array length built here:
    a trained bucket outside [0, n_buckets) would silently vanish from
    the dense vector, so it is asserted instead."""
    assert n_buckets <= MAX_DENSE_BUCKETS, (
        f"n_buckets={n_buckets} exceeds the dense-literal budget "
        f"({MAX_DENSE_BUCKETS}); use a broadcast-join model table instead")
    rows = weights.select("bucket", "w_q").collect()
    by_bucket = {int(r["bucket"]): int(r["w_q"]) for r in rows}
    assert not by_bucket or (
        0 <= min(by_bucket) and max(by_bucket) < n_buckets
    ), f"trained bucket outside [0, {n_buckets}) — n_buckets mismatch"
    # one expression string → ONE py4j round trip; building n_buckets
    # F.lit() Columns costs 2·n_buckets gateway calls (~seconds of pure
    # driver latency, measured)
    vals = ",".join(f"{by_bucket.get(b, 0)}L" for b in range(n_buckets))
    return F.expr(f"array({vals})")


def nb_model(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> tuple[Column, int]:
    """(dense weight-array Column, prior_q) for scoring — the fused
    model build.

    Computes exactly what ``nb_weight_map(nb_train(...))`` +
    ``nb_prior_q(...)`` compute, in ONE corpus job instead of ~9: the
    per-bucket token counts and the per-doc label counts ride the same
    aggregation (the doc counts as a synthetic ``bucket = -1`` row per
    document, unioned below the groupBy), the totals are exact integer
    sums done in Python, and the log-odds quantization is evaluated
    engine-side in a single jobless OneRowRelation SELECT that replays
    the training expression double-for-double (same JVM ``Math.log``,
    same operation order), so the resulting weights are bit-identical
    to the unfused path."""
    assert n_buckets <= MAX_DENSE_BUCKETS, (
        f"n_buckets={n_buckets} exceeds the dense-literal budget "
        f"({MAX_DENSE_BUCKETS}); use a broadcast-join model table instead")
    from ton_indexer_spark.operators.spread import spread_small

    spark = docs.sparkSession
    tok = (
        spread_small(docs)
        .select(
            label.alias("y"),
            F.explode(tokens_lower(F.col(text_col))).alias("tok"),
        )
        .select(
            "y", token_bucket(F.col("tok"), n_buckets).alias("bucket")
        )
    )
    doc_rows = docs.select(
        label.alias("y"), F.lit(-1).cast("long").alias("bucket")
    )
    rows = (
        tok.unionByName(doc_rows)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos_cnt"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg_cnt"),
        )
        .collect()
    )
    by_bucket: dict[int, tuple[int, int]] = {}
    p_docs = n_docs = 0
    for r in rows:
        b = int(r["bucket"])
        if b < 0:
            p_docs, n_docs = int(r["pos_cnt"]), int(r["neg_cnt"])
        else:
            by_bucket[b] = (int(r["pos_cnt"]), int(r["neg_cnt"]))
    pos_tot = sum(p for p, _ in by_bucket.values())
    neg_tot = sum(n for _, n in by_bucket.values())

    # replay nb_train's arithmetic exactly: ((ln(p+1) - ln(pt+B)) -
    # ln(n+1)) + ln(nt+B), then floor(x*1e6 + 0.5) — every operand cast
    # long→double the same way Catalyst casts the column path
    def _w_expr(p: int, n: int) -> str:
        return (
            f"CAST(FLOOR((((LN(CAST({p} AS DOUBLE) + 1.0D)"
            f" - LN(CAST({pos_tot} AS DOUBLE) + CAST({n_buckets} AS DOUBLE)))"
            f" - LN(CAST({n} AS DOUBLE) + 1.0D))"
            f" + LN(CAST({neg_tot} AS DOUBLE) + CAST({n_buckets} AS DOUBLE)))"
            f" * CAST(1000000 AS DOUBLE) + 0.5D) AS BIGINT)"
        )

    prior_expr = (
        f"CAST(FLOOR((LN(CAST({p_docs + 1} AS DOUBLE))"
        f" - LN(CAST({n_docs + 1} AS DOUBLE)))"
        f" * CAST(1000000 AS DOUBLE) + 0.5D) AS BIGINT)"
    )
    order = sorted(by_bucket)
    w_terms = ",".join(_w_expr(*by_bucket[b]) for b in order)
    w_select = f"array({w_terms}) AS w, " if order else ""
    out = spark.sql(f"SELECT {w_select}{prior_expr} AS p").first()
    prior_q = int(out["p"])
    wq = dict(zip(order, (int(v) for v in out["w"]))) if order else {}
    vals = ",".join(f"{wq.get(b, 0)}L" for b in range(n_buckets))
    return F.expr(f"array({vals})"), prior_q


def nb_score(
    text: Column,
    weight_map: Column,
    prior_q: int,
    n_buckets: int = N_BUCKETS,
) -> Column:
    """Map-only integer score: prior + sum of per-token quantized
    log-odds.  Unseen buckets contribute 0 (they were smoothed into the
    totals at train time; the dense weight vector stores the 0
    explicitly).  Same zero-shuffle plan shape as
    ``quality_model.hashed_linear_raw``.  ``weight_map`` is the dense
    array from ``nb_weight_map`` — ``element_at`` is 1-based, hence the
    ``+ 1``."""
    per_tok = F.aggregate(
        tokens_lower(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(
            weight_map, (token_bucket(t, n_buckets) + F.lit(1)).cast("int")
        ),
    )
    return per_tok + F.lit(prior_q)
