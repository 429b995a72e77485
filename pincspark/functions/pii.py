"""PII detection and redaction for the training-data pipeline: email,
North-American phone, and IPv4 patterns as pure JVM-side regex column
expressions (no Python in the hot path — ``regexp_extract_all`` /
``regexp_replace`` run inside whole-stage codegen, so the scrub is a narrow
map stage that holds at 100 TB).

The patterns deliberately use only syntax with identical semantics in Java
regex (Spark) and RE2 (the DuckDB oracle): character classes, bounded
repetition, ``\\d`` and ASCII ``\\b``. No lookarounds (RE2 has none), no
backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

# Redaction order matters and is part of the contract: emails first (their
# domains would otherwise be chewed up token-by-token), then IPs, then
# phones. The SQL oracle applies the same chain.
REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_count(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``text``."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder, in REDACTIONS order."""
    out = text
    for _, pattern, repl in REDACTIONS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring ``pii_count`` for each pattern."""
    return {
        name: f"len(regexp_extract_all({text_expr}, '{pattern}'))"
        for name, pattern, _ in REDACTIONS
    }


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB expression mirroring ``redact_pii`` (same chain order)."""
    out = text_expr
    for _, pattern, repl in REDACTIONS:
        out = f"regexp_replace({out}, '{pattern}', '{repl}', 'g')"
    return out
