"""Text-analysis column builders for the training-data pipeline.

language-ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish word-piece regex),
document fingerprinting (normalized-text digest).  All are pure Column
expressions: at 100 TB these run inside whole-stage codegen over the parquet
scan, no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "los", "las", "es", "un", "una", "y"),
}

STOPWORDS = LANG_MARKERS["en"]


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, WS))
    )


def wordpiece_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of word-character runs + digit runs +
    punctuation marks (each is at least one token in a BPE vocabulary)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.!?,;:]"))


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences (word-boundary anchored)."""
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features; ratios are exact-int divisions in
    DOUBLE so they hash-match any engine computing the same definition."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = punct_count(text)
    n_stop = marker_hits(text, STOPWORDS)
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_t = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": n_punct.cast("double") / denom_c,
        "stopword_ratio": n_stop.cast("double") / denom_t,
        "mean_token_len": n_chars.cast("double") / denom_t,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}


def lang_predict(text: Column) -> Column:
    """argmax over marker-hit scores; ties broken by language code order;
    all-zero → 'und' (undetermined)."""
    scores = lang_scores(text)
    pred = F.lit("und")
    best = F.lit(-1)
    for lang in sorted(scores):  # later wins only on strict improvement →
        s = scores[lang]         # alphabetical tiebreak via iteration order
        take = s > best
        pred = F.when(take, F.lit(lang)).otherwise(pred)
        best = F.when(take, s).otherwise(best)
    return F.when(F.greatest(*scores.values()) <= 0, F.lit("und")).otherwise(pred)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), WS, " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint over normalized text (md5 hex — stable across
    engines, unlike xxhash seeds)."""
    return F.md5(normalize_text(text))
