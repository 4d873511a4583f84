"""Distributed BPE merge-candidate counting — tokenizer-training step.

Training a BPE tokenizer over a 100 TB corpus starts with exactly one
distributed primitive: count the frequency of every adjacent symbol pair
across the corpus, weighted by word frequency (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units", alg. 1).
The driver-side merge loop is cheap (top pair → merge rule); the pair
COUNT is the data-scale step, and it is what this module distributes.

Plan shape (all JVM column algebra, two shuffles, both tiny):

1. tokenize → explode → ``groupBy(word).count()`` — the only corpus-sized
   shuffle, with map-side combine, and its output is the DISTINCT word
   set (Zipf: orders of magnitude smaller than the corpus);
2. per distinct word, adjacent character pairs via
   ``transform(sequence(...))`` + explode — proportional to vocabulary
   size, not corpus size;
3. ``groupBy(pair).agg(sum(freq))`` + top-K — vocabulary-sized shuffle.

A production loop would iterate: apply the winning merge to the word
set (a map over the VOCABULARY, not the corpus) and re-count.  Because
step 1's output is persisted once, later iterations never touch the
corpus again — the property that makes corpus-scale BPE tractable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over whitespace tokens — the corpus-sized pass."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def pair_counts(word_freqs: DataFrame, top_k: int | None = None) -> DataFrame:
    """Adjacent-character pair counts weighted by word frequency.

    Input is the ``word_frequencies`` output (or any ``(word, freq)``
    vocabulary).  Pairs are rendered ``"<left> <right>"`` (the classic
    space-joined symbol notation).  ``top_k`` returns the merge
    candidates ranked by count with a deterministic pair tiebreak — a
    TakeOrderedAndProject, no global sort materialization.
    """
    i_pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.col("word").substr(i, F.lit(1)),
            F.lit(" "),
            F.col("word").substr(i + F.lit(1), F.lit(1)),
        ),
    )
    out = (
        word_freqs.filter(F.length("word") >= 2)
        .select(F.explode(i_pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )
    if top_k is not None:
        out = out.orderBy(F.desc("pair_count"), F.asc("pair")).limit(top_k)
    return out


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """End-to-end: corpus → top-K BPE merge candidates."""
    return pair_counts(word_frequencies(docs, text_col), top_k=top_k)
