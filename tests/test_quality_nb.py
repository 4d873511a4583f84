"""Naive-Bayes quality trainer/scorer unit tests (hand-computed oracle).

Gate-level DuckDB parity lives in test_oracle_parity (quality_nb_train /
quality_nb_score); here we pin the math and the plan shape.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ton_indexer_spark.functions.quality_model import N_BUCKETS
from ton_indexer_spark.functions.quality_nb import (
    SCALE,
    nb_prior_q,
    nb_score,
    nb_train,
    nb_weight_map,
)


def _mk(spark):
    rows = [
        (1, "good good text", True),
        (2, "good text", True),
        (3, "bad bad noise", False),
        (4, "noise", False),
        (5, "", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def _bucket(tok: str) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _wq(pos, neg, pos_tot, neg_tot):
    w = (
        math.log(pos + 1.0)
        - math.log(pos_tot + float(N_BUCKETS))
        - math.log(neg + 1.0)
        + math.log(neg_tot + float(N_BUCKETS))
    )
    return math.floor(w * SCALE + 0.5)


def test_nb_train_matches_hand_computation(spark):
    d = _mk(spark)
    got = {
        r["bucket"]: (r["pos_cnt"], r["neg_cnt"], r["w_q"])
        for r in nb_train(d, F.col("y")).collect()
    }
    # token counts: pos = {good:3, text:2}; neg = {bad:2, noise:2}
    counts = {"good": (3, 0), "text": (2, 0), "bad": (0, 2), "noise": (0, 2)}
    pos_tot, neg_tot = 5, 4
    for tok, (p, n) in counts.items():
        b = _bucket(tok)
        assert got[b][0] == p and got[b][1] == n, tok
        assert got[b][2] == _wq(p, n, pos_tot, neg_tot), tok
    assert len(got) == len({_bucket(t) for t in counts})


def test_nb_prior_and_score(spark):
    d = _mk(spark)
    w = nb_train(d, F.col("y"))
    wmap = nb_weight_map(w)
    prior = nb_prior_q(d, F.col("y"))
    # 2 positive docs, 3 negative -> ln(3) - ln(4), quantized
    assert prior == math.floor((math.log(3.0) - math.log(4.0)) * SCALE + 0.5)
    scored = {
        r["doc_id"]: r["s"]
        for r in d.select(
            "doc_id", nb_score(F.col("text"), wmap, prior).alias("s")
        ).collect()
    }
    wq = {
        tok: _wq(p, n, 5, 4)
        for tok, (p, n) in
        {"good": (3, 0), "text": (2, 0), "bad": (0, 2), "noise": (0, 2)}.items()
    }
    assert scored[1] == 2 * wq["good"] + wq["text"] + prior
    assert scored[3] == 2 * wq["bad"] + wq["noise"] + prior
    # empty text scores exactly the prior
    assert scored[5] == prior
    # positive docs separate from negative ones on this toy corpus
    assert min(scored[1], scored[2]) > max(scored[3], scored[4])


def test_nb_scoring_plan_is_exchange_free(spark):
    d = _mk(spark)
    wmap = nb_weight_map(nb_train(d, F.col("y")))
    plan = (
        d.select(nb_score(F.col("text"), wmap, 0).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_nb_prior_empty_input(spark):
    # empty corpus: sums coalesce to 0, Laplace gives ln(1)-ln(1) = 0
    d = spark.createDataFrame([], "doc_id long, text string, y boolean")
    assert nb_prior_q(d, F.col("y")) == 0


def test_nb_model_fused_matches_unfused(spark):
    """nb_model (the one-job fused build) must be bit-identical to
    nb_weight_map(nb_train(...)) + nb_prior_q(...)."""
    from ton_indexer_spark.functions.quality_nb import nb_model

    d = _mk(spark)
    label = F.col("y")
    old_w = spark.range(1).select(
        nb_weight_map(nb_train(d, label)).alias("w")).first()["w"]
    old_p = nb_prior_q(d, label)
    new_wcol, new_p = nb_model(d, label)
    new_w = spark.range(1).select(new_wcol.alias("w")).first()["w"]
    assert list(old_w) == list(new_w)
    assert old_p == new_p


def test_nb_model_empty_input(spark):
    from ton_indexer_spark.functions.quality_nb import nb_model

    d = spark.createDataFrame([], "doc_id long, text string, y boolean")
    wcol, prior = nb_model(d, F.col("y"))
    assert prior == 0
    w = spark.range(1).select(wcol.alias("w")).first()["w"]
    assert len(w) == N_BUCKETS and all(v == 0 for v in w)


def test_dense_model_literal_guard(spark):
    """The dense bucket-indexed model literal is inlined into aggregate
    expressions, so its size must stay bounded; past MAX_DENSE_BUCKETS
    the builders refuse (callers switch to a broadcast-join table)."""
    import pytest

    from ton_indexer_spark.functions.quality_nb import (
        MAX_DENSE_BUCKETS,
        nb_model,
    )

    d = _mk(spark)
    with pytest.raises(AssertionError, match="dense-literal budget"):
        nb_weight_map(nb_train(d, F.col("y")), n_buckets=MAX_DENSE_BUCKETS + 1)
    with pytest.raises(AssertionError, match="dense-literal budget"):
        nb_model(d, F.col("y"), n_buckets=MAX_DENSE_BUCKETS + 1)
    with pytest.raises(AssertionError, match="dense-literal budget"):
        from ton_indexer_spark.operators.selection import dsir_weights

        dsir_weights(d, d, id_col="doc_id",
                     n_buckets=MAX_DENSE_BUCKETS + 1)
