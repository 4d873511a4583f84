"""PII detection/redaction column functions — training-data pipeline ops.

Pretraining pipelines scrub personally-identifiable information before
training (emails, phone numbers, IP addresses are the classic regex-able
classes — e.g. the BigCode/StarCoder pipeline redacts exactly these).
Everything here is a pure ``Column`` expression (``regexp_count`` /
``regexp_replace``) that runs JVM-side inside whole-stage codegen — no
Python in the hot path — and composes with scan pruning.

Pattern portability: the patterns use only character classes, bounded
quantifiers and ``\\b`` anchors, which behave identically under Java
regex (Spark) and RE2 (DuckDB) — no backreferences or lookaround, so the
oracle hash-matches.  Redaction replaces in a fixed class order (emails →
IPv4 → phones) so counts are computed on the original text but each
class's replacement can't partially consume another's match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: replacement applies in this sequence — URLs first so an
# address embedded in a URL is consumed by the URL token, not split by
# the email/IP replacement
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ \t\r\n]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,18}[0-9]", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the raw text."""
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class token, in fixed class order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
