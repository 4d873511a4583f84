"""Behavioral tests for the word-bigram LM scorer (functions/wordlm.py)."""

from __future__ import annotations

import math


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def _q(c12, c1, v):
    return int(math.floor(-math.log((c12 + 1) / (c1 + v)) * 1e6 + 0.5))


def test_hand_computed_model_and_score(spark):
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    docs = _docs(spark, ["a b a b", "a b"])
    lm, v = train_word_bigram_lm(docs)
    # tokens: a,b,a,b / a,b -> vocab {a, b}
    assert v == 2 and lm.vocab_size == 2
    rows = {(r["w1"], r["w2"]): r["q"] for r in lm.bigrams.collect()}
    # bigrams: (a,b)x3, (b,a)x1; c1(a)=3, c1(b)=1
    assert rows == {("a", "b"): _q(3, 3, 2), ("b", "a"): _q(1, 1, 2)}

    out = {r["doc_id"]: r for r in word_lm_score(docs, lm).collect()}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["nll_sum_scaled"] == 2 * _q(3, 3, 2) + _q(1, 1, 2)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["nll_sum_scaled"] == _q(3, 3, 2)


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
    lm, _ = train_word_bigram_lm(docs)
    out = word_lm_score(docs, lm).collect()
    assert {r["doc_id"] for r in out} == {0}


def test_oov_bigrams_take_smoothed_floor(spark):
    """Scoring a corpus the model never saw must NOT drop bigrams: an
    unseen pair with a seen left word floors at -ln(1/(c1+V)); a fully
    unseen word floors at -ln(1/V) — so junk scores worse, never
    better (the add-one-smoothing contract)."""
    from ton_indexer_spark.functions.wordlm import (
        train_word_bigram_lm,
        word_lm_score,
    )

    train = _docs(spark, ["a b a b a b"])          # vocab {a,b}, c1(a)=3
    lm, v = train_word_bigram_lm(train)
    assert v == 2
    score = _docs(spark, ["a zz", "zz qq"], start_id=10)
    out = {r["doc_id"]: r for r in word_lm_score(score, lm).collect()}
    # every bigram is scored — nothing dropped
    assert out[10]["n_bigrams"] == 1 and out[11]["n_bigrams"] == 1
    # (a, zz): w1 seen (c1=3), pair unseen -> -ln(1/(3+2))
    assert out[10]["nll_sum_scaled"] == int(
        math.floor(math.log(5) * 1e6 + 0.5)
    )
    # (zz, qq): w1 unseen -> -ln(1/V)
    assert out[11]["nll_sum_scaled"] == lm.oov_q == int(
        math.floor(math.log(2) * 1e6 + 0.5)
    )
    # and OOV text is penalized relative to in-model text
    fluent = word_lm_score(train, lm).collect()[0]["nll_per_bigram"]
    assert out[11]["nll_per_bigram"] > fluent


def test_vocab_size_param_skips_token_scan(spark):
    from ton_indexer_spark.functions.wordlm import (
        doc_bigrams,
        train_word_bigram_lm,
        word_lm_score,
    )

    docs = _docs(spark, ["x y x y z", "y z y"])
    bi = doc_bigrams(docs)
    auto, v = train_word_bigram_lm(docs, bigrams=bi)
    pinned, v2 = train_word_bigram_lm(docs, bigrams=bi, vocab_size=v)
    assert v == v2 == 3
    a = sorted(map(tuple, word_lm_score(docs, auto, bigrams=bi).collect()))
    b = sorted(map(tuple, word_lm_score(docs, pinned, bigrams=bi).collect()))
    assert a == b


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
    one_lm, v1 = train_word_bigram_lm(docs.coalesce(1))
    many_lm, v2 = train_word_bigram_lm(docs.repartition(8))
    assert v1 == v2
    one = {
        r["doc_id"]: (r["n_bigrams"], r["nll_sum_scaled"])
        for r in word_lm_score(docs.coalesce(1), one_lm).collect()
    }
    many = {
        r["doc_id"]: (r["n_bigrams"], r["nll_sum_scaled"])
        for r in word_lm_score(docs.repartition(8), many_lm).collect()
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
    lm, _ = train_word_bigram_lm(docs)
    out = {r["doc_id"]: r["nll_per_bigram"] for r in
           word_lm_score(docs, lm).collect()}
    assert out[0] < out[1]
