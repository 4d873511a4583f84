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
    column containing at least every character of every word.  The
    driver loop runs ≤ ceil(max_word_len) rounds; state is one row per
    UNFINISHED word (bounded by |words|), checkpointed per round so the
    lineage does not grow quadratically.
    """
    spark = words.sparkSession
    # materialize the vocab ONCE: it joins into every round, and a
    # broadcast hint alone would re-execute its (possibly long) upstream
    # lineage per round — measured as a hang when the vocabulary derives
    # from a full curation pipeline rather than a bare scan
    vocab = F.broadcast(
        vocab.select("token", F.length("token").alias("_tl"))
        .localCheckpoint(eager=True)
    )
    state = words.select(
        "word", F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("toks"),
    ).localCheckpoint(eager=True)
    done_parts = [state.filter(F.lit(False))]  # schema anchor (empty input)
    # bound from the checkpointed state, not the raw input lineage
    max_rounds = int(
        state.agg(F.max(F.length("word"))).first()[0] or 0
    )
    for _ in range(max_rounds):
        done_parts.append(state.filter(F.col("pos") > F.length("word")))
        live = state.filter(F.col("pos") <= F.length("word"))
        if live.limit(1).count() == 0:
            state = None
            break
        # expression join against the broadcast vocab: a match is any
        # vocab token equal to the same-length slice at the cursor
        matched = live.join(
            vocab, F.expr("token = substring(word, pos, _tl)"), "inner"
        )
        # longest match wins; the tiebreak is vacuous (equal-length
        # matches at one cursor are the same string)
        state = (
            matched.groupBy("word")
            .agg(
                F.max(F.struct(F.col("_tl"), F.col("token"))).alias("b"),
                F.first("pos").alias("pos"),
                F.first("toks").alias("toks"),
            )
            .select(
                "word",
                (F.col("pos") + F.col("b._tl")).alias("pos"),
                F.array_append("toks", F.col("b.token")).alias("toks"),
            )
            .localCheckpoint(eager=True)
        )
    if state is not None:
        done_parts.append(state.filter(F.col("pos") > F.length("word")))
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "word",
        F.size("toks").alias("n_tokens"),
        F.array_join("toks", " ").alias("segmented"),
    )
