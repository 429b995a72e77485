"""Text-analysis column functions for the training-data pipeline extensions:
tokenization/counting, quality scoring, language-ID heuristic, and document
fingerprinting. All pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path, so they hold up on
100 TB of documents with zero serialization overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic; real deployments would swap
# in a fastText-style model via mapInPandas (see pincspark.decode.kernel for
# the pandas-UDF pattern).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "es"),
    "de": ("der", "die", "das", "und", "ist"),
}

WORD_RE = "[A-Za-z]+|[0-9]+"
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _isin(vals: tuple[str, ...]):
    """Closure factory for higher-order-function lambdas: a default-arg
    lambda would be seen as a 2-arg (element, index) function by Spark."""
    return lambda t: t.isin(*vals)


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (split on runs of spaces)."""
    return F.filter(F.split(text, " +"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count alpha runs + digit runs."""
    return F.size(F.regexp_extract_all(text, F.lit(WORD_RE), F.lit(0)))


def avg_word_len(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks).cast("double")


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, _isin(stopwords)))
    return hits.cast("double") / F.size(toks).cast("double")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(text).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic doc quality in [0,1]: rewards mid-length docs with normal
    word lengths and some stopword mass; penalizes punctuation soup.
    Deterministic arithmetic only."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    wl = avg_word_len(text)
    wl_score = F.when((wl >= 2.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(text) * F.lit(2.0), F.lit(1.0))
    return F.round(
        (len_score + wl_score + sw_score) / F.lit(3.0) * (F.lit(1.0) - punct_pen), 6
    )


def lang_id(text: Column) -> Column:
    """Argmax over marker-word hit counts; ties and zero-hit docs -> 'und'.
    Deterministic: languages compared in fixed order, strictly-greater wins."""
    toks = ws_tokens(F.lower(text))
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in ("en", "fr", "es", "de"):
        hits = F.size(F.filter(toks, _isin(LANG_MARKERS[lang])))
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the normalized text (exact-dup key)."""
    return F.md5(normalize_text(text))
