"""Behavioral tests for the word-bigram LM scorer (functions/wordlm.py)."""

from __future__ import annotations

import math

import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_model_and_score(spark):
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    docs = _docs(spark, ["a b a b", "a b"])
    model, v = train_word_bigram_lm(docs)
    # tokens: a,b,a,b / a,b -> vocab {a, b}
    assert v == 2
    rows = {(r["w1"], r["w2"]): r["q"] for r in model.collect()}
    # bigrams: (a,b)x3, (b,a)x1; c1(a)=3, c1(b)=1
    q_ab = int(math.floor(-math.log((3 + 1) / (3 + 2)) * 1e6 + 0.5))
    q_ba = int(math.floor(-math.log((1 + 1) / (1 + 2)) * 1e6 + 0.5))
    assert rows == {("a", "b"): q_ab, ("b", "a"): q_ba}

    out = {r["doc_id"]: r for r in word_lm_score(docs, model).collect()}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["nll_sum_scaled"] == 2 * q_ab + q_ba
    assert out[1]["n_bigrams"] == 1
    assert out[1]["nll_sum_scaled"] == q_ab


def test_tokenization_lowercases_and_strips_punct(spark):
    from ton_indexer_spark.functions.wordlm import doc_bigrams

    docs = _docs(spark, ["Hello, WORLD!  hello world."])
    bi = [(r["w1"], r["w2"]) for r in doc_bigrams(docs).collect()]
    assert bi == [("hello", "world"), ("world", "hello"), ("hello", "world")]


def test_short_docs_unscored(spark):
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    docs = _docs(spark, ["a b c", "single", ""])
    model, _ = train_word_bigram_lm(docs)
    out = word_lm_score(docs, model).collect()
    assert {r["doc_id"] for r in out} == {0}


def test_partition_invariance(spark):
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    texts = [
        " ".join(["w%d" % ((i * j) % 13) for j in range(30)])
        for i in range(40)
    ]
    docs = _docs(spark, texts)
    one_model, v1 = train_word_bigram_lm(docs.coalesce(1))
    many_model, v2 = train_word_bigram_lm(docs.repartition(8))
    assert v1 == v2
    one = {
        r["doc_id"]: (r["n_bigrams"], r["nll_sum_scaled"])
        for r in word_lm_score(docs.coalesce(1), one_model).collect()
    }
    many = {
        r["doc_id"]: (r["n_bigrams"], r["nll_sum_scaled"])
        for r in word_lm_score(docs.repartition(8), many_model).collect()
    }
    assert one == many


def test_lower_nll_for_predictable_text(spark):
    """A doc of one repeated bigram scores lower (more model-like) than a
    doc spraying rare transitions — the filtering property."""
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    common = "the cat " * 50
    rare = "the cat sat mat rat pat bat hat the dog"
    docs = _docs(spark, [common, rare])
    model, _ = train_word_bigram_lm(docs)
    out = {r["doc_id"]: r["nll_per_bigram"] for r in
           word_lm_score(docs, model).collect()}
    assert out[0] < out[1]
