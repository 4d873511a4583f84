"""WordPiece-style greedy longest-match segmentation.

Completes the tokenizer family next to BPE (``functions/bpe.py``):
WordPiece/SentencePiece INFERENCE is greedy longest-match-first over a
vocabulary (Devlin et al. 2019 §3; the continuation-marker variant is a
prefix-labeling detail, not a different algorithm), and that greedy walk
is deterministic — so both the vocabulary derivation and the
segmentation are exactly reproducible in SQL, unlike unigram-LM EM.

Scale shape (same as the BPE encoder's insight): segmentation runs over
the distinct-word VOCABULARY, not the corpus — Zipf makes |words| orders
of magnitude smaller than corpus tokens, and the result joins back to
documents on the word.  Plan:

1. ``wordpiece_vocab``: substring enumeration per distinct word (pure
   column algebra — ``sequence``/``transform``/``explode`` inside
   codegen), one groupBy(token) keyed by at most |words|·L² rows; keep
   substrings with document-wide frequency ≥ ``min_freq`` plus ALL
   single characters (guarantees the greedy walk always advances).
2. ``wordpiece_segment``: iterative longest-match — each round joins the
   live (word, pos) frontier against the broadcast vocabulary on
   ``token == substr(word, pos, len(token))`` and keeps the longest
   match per position (integer tiebreak-free: lengths are unique per
   (word,pos) winner by construction).  Rounds are bounded by the
   longest word's character count; each round is one broadcast join +
   one partial-agg groupBy over the shrinking frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_TOKEN_LEN = 6


def wordpiece_vocab(
    word_freqs: DataFrame,
    min_freq: int = 4,
    max_token_len: int = MAX_TOKEN_LEN,
) -> DataFrame:
    """(token) vocabulary: all substrings of length 2..max_token_len whose
    corpus frequency (weighted by word freq) >= min_freq, plus every
    single character seen — total-coverage guarantee."""
    w = F.col("word")
    n = F.length(w)
    # all (start, len) substrings up to max_token_len, inside codegen
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_token_len), n - s + 1),
                ),
                lambda ln: F.substring(w, s.cast("int"), ln.cast("int")),
            ),
        )
    )
    tok_freq = (
        word_freqs.select(F.explode(subs).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("tf"))
    )
    chars = tok_freq.filter(F.length("token") == 1).select("token")
    multi = tok_freq.filter(
        (F.length("token") >= 2) & (F.col("tf") >= F.lit(min_freq))
    ).select("token")
    return chars.unionByName(multi).distinct()


def wordpiece_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_token_len: int = MAX_TOKEN_LEN,
) -> DataFrame:
    """(word, n_tokens, segmented) — greedy longest-match-first walk.

    ``words`` must have a unique ``word`` column; ``vocab`` a ``token``
    column containing at least every character of every word.

    Single-pass formulation: every (position, length) slice of every
    word is enumerated map-side (≤ len·max_token_len rows per word —
    words are natural-language-bounded) and equi-joined ONCE against
    the broadcast vocabulary, so vocabulary membership of *all* cursor
    candidates is known up front; the greedy cursor walk then replays
    inside one ``aggregate`` expression over the collected per-word
    match list.  This replaces the former driver loop — one
    nested-loop broadcast join + frontier checkpoint + convergence
    count per round, ≈22 jobs at 8 rounds — with one hash join and one
    aggregation (the groupBy reuses the word partitioning most callers
    already have from the word-frequency aggregation).  Greedy
    semantics are unchanged: at each cursor the longest vocabulary
    match wins (equal-length matches at one cursor are the same
    string, so the tiebreak stays vacuous), and single-character
    coverage guarantees the cursor always advances.
    """
    w = F.col("word")
    n = F.length(w)
    # all (pos, len) slices with len ≤ max_token_len, inside codegen
    slices = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_token_len), n - s + 1)
                ),
                lambda ln: F.struct(
                    s.cast("int").alias("pos"),
                    ln.cast("int").alias("tl"),
                    F.substring(w, s.cast("int"), ln.cast("int")).alias(
                        "token"
                    ),
                ),
            ),
        )
    )
    cand = words.select("word", F.explode(slices).alias("c")).select(
        "word", F.col("c.pos").alias("pos"), F.col("c.tl").alias("tl"),
        F.col("c.token").alias("token"),
    )
    matched = cand.join(F.broadcast(vocab.select("token")), "token")
    per_word = matched.groupBy("word").agg(
        F.collect_list(F.struct("pos", "tl")).alias("_ms")
    )

    def _best_tl(pos):  # longest vocab match at this cursor
        return F.array_max(
            F.transform(
                F.filter(F.col("_ms"), lambda m: m["pos"] == pos),
                lambda m: m["tl"],
            )
        )

    walk = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.lit(1).cast("int").alias("pos"),
            F.array().cast("array<string>").alias("toks"),
        ),
        lambda acc, i: F.when(
            i == acc["pos"],
            F.struct(
                (acc["pos"] + _best_tl(acc["pos"])).cast("int").alias("pos"),
                F.array_append(
                    acc["toks"],
                    F.substring(w, acc["pos"], _best_tl(acc["pos"])),
                ).alias("toks"),
            ),
        ).otherwise(acc),
    )
    # bind the walk once: inlining it into both outputs would run the
    # whole aggregate expression twice per row
    return per_word.select("word", walk["toks"].alias("_toks")).select(
        "word",
        F.size("_toks").alias("n_tokens"),
        F.array_join("_toks", " ").alias("segmented"),
    )
