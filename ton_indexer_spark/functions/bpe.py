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


def _merge_word(symbols: list, a: str, b: str) -> list:
    """Classic greedy left-to-right non-overlapping merge of (a, b)."""
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _sym_pairs() -> "F.Column":
    """Adjacent-pair column over a ``symbols array<string>`` column."""
    return F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.concat(
            F.element_at("symbols", i.cast("int")),
            F.lit(" "),
            F.element_at("symbols", (i + F.lit(1)).cast("int")),
        ),
    )


def bpe_train(
    docs: "DataFrame",
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules over a corpus (Sennrich 2016).

    Scale split: the CORPUS is read exactly once (the word-frequency
    groupBy of ``word_frequencies``); every subsequent iteration runs
    over the distinct-word VOCABULARY only, which Zipf makes orders of
    magnitude smaller.  Per iteration: adjacent-pair counts are pure JVM
    column algebra (``transform`` + explode + groupBy), the argmax pair
    is a TakeOrdered of ONE row, and the merge application is an
    Arrow-batched ``mapInPandas`` over the vocabulary (sequential
    left-to-right scan per word — genuinely non-vectorizable, but the
    input is vocab-sized).  The vocab is localCheckpoint'ed per round so
    lineage stays flat across iterations.

    Ties break deterministically: count DESC, then pair lexicographic —
    reruns and engines agree on the full merge sequence.

    Returns the ordered merge list ``[(left, right), ...]``.
    """
    vocab = (
        word_frequencies(docs, text_col)
        .select(
            # split at every inter-char position; Spark's split keeps a
            # trailing empty element (limit=-1) — drop it
            F.filter(
                F.split("word", "(?!^)"), lambda s: s != F.lit("")
            ).alias("symbols"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            vocab.filter(F.size("symbols") >= 2)
            .select(F.explode(_sym_pairs()).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))

        def apply_merge(batches, a=a, b=b):
            for pdf in batches:
                pdf["symbols"] = pdf["symbols"].map(
                    lambda s: _merge_word(list(s), a, b)
                )
                yield pdf

        new_vocab = vocab.mapInPandas(
            apply_merge, schema="symbols array<string>, freq long"
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def bpe_encode(
    docs: "DataFrame",
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> "DataFrame":
    """Tokenize a corpus with a learned merge list (broadcast, map-only).

    The merge table rides to executors as a broadcast closure; each word
    replays merges in priority order (rank-greedy, the standard encode).
    Arrow-batched ``mapInPandas`` over the CORPUS — embarrassingly
    parallel, no shuffle; memoized per distinct word within a batch.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", `{out_col}` array<string>"

    def encode(batches):
        rk = b_ranks.value

        def encode_word(word: str, memo: dict) -> list:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) >= 2:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (syms[i], syms[i + 1]), r
                if best is None:
                    break
                syms = _merge_word(syms, *best)
            memo[word] = syms
            return syms

        for pdf in batches:
            memo: dict = {}
            pdf[out_col] = pdf[text_col].map(
                lambda t: [
                    s
                    for w in (t or "").split()
                    for s in encode_word(w, memo)
                ]
            )
            yield pdf

    return docs.mapInPandas(encode, schema=out_schema)
