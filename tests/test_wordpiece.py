"""WordPiece greedy segmentation unit tests (gate parity in
test_oracle_parity::wordpiece_segment)."""

from __future__ import annotations

from ton_indexer_spark.functions.bpe import word_frequencies
from ton_indexer_spark.functions.wordpiece import (
    wordpiece_segment,
    wordpiece_vocab,
)


def _seg(spark, rows, min_freq=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = word_frequencies(docs)
    v = wordpiece_vocab(wf, min_freq=min_freq)
    out = wordpiece_segment(wf.select("word"), v)
    return {r["word"]: (r["segmented"], r["n_tokens"]) for r in out.collect()}


def test_greedy_longest_match(spark):
    got = _seg(spark, [
        (1, "banana band ban"),
        (2, "banana banana bandana"),
        (3, "nan ban"),
    ])
    # 'banana' occurs 3x -> whole word in vocab; greedy takes it in one
    assert got["banana"] == ("banana", 1)
    # 'ban' is a frequent prefix; 'd' and 'ana' complete the rare words
    assert got["band"] == ("ban d", 2)
    assert got["bandana"] == ("ban d ana", 3)
    assert got["ban"] == ("ban", 1)
    assert got["nan"] == ("nan", 1)


def test_single_char_coverage_terminates(spark):
    # every word unique: nothing reaches min_freq except single chars,
    # so each word segments into its characters
    got = _seg(spark, [(1, "xyz qrstuv")], min_freq=99)
    assert got["xyz"] == ("x y z", 3)
    assert got["qrstuv"] == ("q r s t u v", 6)


def test_segmentation_reconstructs_word(spark):
    got = _seg(spark, [
        (1, "alpha beta alphabet betamax alpha beta alpha beta"),
    ])
    for word, (segmented, n) in got.items():
        assert segmented.replace(" ", "") == word
        assert n == len(segmented.split(" "))


def test_every_word_is_segmented(spark):
    rows = [(1, "a bb ccc dddd eeeee ffffff ggggggg")]
    got = _seg(spark, rows, min_freq=2)
    assert set(got) == {"a", "bb", "ccc", "dddd", "eeeee", "ffffff",
                        "ggggggg"}
