"""Lossless-filter identity tests for the n-gram Jaccard pair join.

The size filter (always on) and prefix filter (opt-in) must never change
the output — only the candidate volume.  Gate-level DuckDB parity lives
in test_oracle_parity (dedup_ngram_jaccard / dedup_cluster_canonical).
"""

from __future__ import annotations

import pytest

from ton_indexer_spark.dedup.ngram import ngram_jaccard_pairs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),          # near-dup of 1
        (3, "a b c d e f g h"),          # exact dup of 1
        (4, "p q r s t u v w"),          # disjoint
        (5, "a b c"),                    # one shingle, subset of 1
        (6, "zz"),                       # < k tokens: no shingles
        (7, "p q r s t u v w y z a b c d"),  # size-skewed vs 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.1, 0.3, 0.5, 0.9])
def test_prefix_filter_identical_output(spark, threshold):
    d = _corpus(spark)
    plain = _rows(ngram_jaccard_pairs(d, threshold=threshold,
                                      prefix_filter=False))
    pref = _rows(ngram_jaccard_pairs(d, threshold=threshold,
                                     prefix_filter=True))
    assert plain == pref
    ids = {(r[0], r[1]) for r in plain}
    if threshold <= 0.3:
        assert (1, 3) in ids and (1, 2) in ids
    # (4,7): doc 4's 6 shingles are a subset of doc 7's 12 -> J = 0.5,
    # so the size-skewed pair survives mid thresholds and dies at 0.9
    assert ((4, 7) in ids) == (threshold <= 0.5)


def test_exact_dup_pair_has_jaccard_one(spark):
    d = _corpus(spark)
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(d, threshold=0.5).collect()}
    assert out[(1, 3)] == 1.0


def test_df_cap_still_applies_with_prefix_filter(spark):
    # every doc shares the same text: the cap (df<=2) drops all shingles
    rows = [(i, "a b c d e") for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for pf in (False, True):
        got = ngram_jaccard_pairs(d, threshold=0.1, max_shingle_df=2,
                                  prefix_filter=pf).collect()
        assert got == []


def test_size_filter_is_lossless_at_tight_threshold(spark):
    # doc 5 (1 shingle) vs doc 1 (6 shingles): sizes 1 and 6; at t=0.5
    # the size filter prunes the pair, and indeed true J = 1/6 < 0.5.
    # At t=0.1 the pair passes the size filter and the true J qualifies.
    d = _corpus(spark)
    tight = {(r["doc_a"], r["doc_b"])
             for r in ngram_jaccard_pairs(d, threshold=0.5).collect()}
    loose = {(r["doc_a"], r["doc_b"])
             for r in ngram_jaccard_pairs(d, threshold=0.1).collect()}
    assert (1, 5) not in tight
    assert (1, 5) in loose
